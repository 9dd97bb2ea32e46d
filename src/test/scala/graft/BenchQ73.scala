package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.{Curation, TextOps}
import graft.transform.Cache

/** Stage-timing probe for the q73 RefinedWeb chain — the round's
  * slowest query (6.4 s at sf0.1): which of the six stages carries the
  * cost, cumulative form (each probe runs the chain UP TO its stage, so
  * the deltas between lines are per-stage costs under the real
  * composition, caches included). Run:
  * `Test/runMain graft.BenchQ73 /root/testdata/sf0.1 32` */
object BenchQ73 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def raw = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def bench = raw.filter(col("doc_id") % 41 === 0)

    def time(label: String)(f: => Unit): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      f
      println(f"[q73-probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    noop(Curation.curateRefined(raw, bench)) // warm-up

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      time("scrubLines")(noop(Cache()(Curation.scrubLines(raw))))
      time("+gate")(noop(Curation.gate(Cache()(Curation.scrubLines(raw)))))
      time("+repetitionGate")(noop(Cache()(Curation.repetitionGate(
        Curation.gate(Cache()(Curation.scrubLines(raw)))))))
      time("+dedupe")(noop(Cache()(Curation.dedupe(Cache()(Curation.repetitionGate(
        Curation.gate(Cache()(Curation.scrubLines(raw)))))))))
      time("+decontaminate")(noop(Cache()(Curation.decontaminate(
        Cache()(Curation.dedupe(Cache()(Curation.repetitionGate(
          Curation.gate(Cache()(Curation.scrubLines(raw))))))),
        Curation.scrub(bench)))))
      time("full (spans+pack)")(noop(Curation.curateRefined(raw, bench)))
      // dedupe-internals A/B: the minhashFeatures projection feeds three
      // consumers (sig + both shingle-verify join sides) — recompute
      // (current) vs persist-once.
      def exactKept() = {
        val gated = Cache()(Curation.repetitionGate(
          Curation.gate(Cache()(Curation.scrubLines(raw)))))
        Curation.exactDeduped(gated)
      }
      time("near (recompute feat)")(noop(Curation.nearDeduped(exactKept())))
      time("near (persist feat)") {
        val ek = exactKept()
        val feat = Cache()(ek
          .select(col("doc_id"), graft.dedup.Dedup.minhashFeatures(col("ts")).as("__mf"))
          .filter(col("__mf").isNotNull))
        val shSets = feat.select(col("doc_id"), col("__mf")("shingles").as("sh"))
        val sig = feat.select(col("doc_id"), col("__mf")("sig").as("sig"))
        val cand = graft.dedup.Dedup.lshCandidates(sig, "doc_id", "sig",
          bands = 4, rowsPerBand = 2)
        val dropIds = cand
          .join(shSets.select(col("doc_id").as("id1"), col("sh").as("sh1")), Seq("id1"))
          .join(shSets.select(col("doc_id").as("id2"), col("sh").as("sh2")), Seq("id2"))
          .filter(graft.dedup.Dedup.jaccard(col("sh1"), col("sh2")) >= 0.5)
          .select(col("id2").as("doc_id")).distinct()
        noop(ek.join(dropIds, Seq("doc_id"), "left_anti"))
      }
    }
    spark.stop()
  }
}
