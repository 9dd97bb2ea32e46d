package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.{Curation, TextOps}
import graft.transform.Cache

/** Stage-timing probe for the q67 published-order chain, measuring the
  * CACHED stage frames curatePublished actually builds. Run:
  * `Test/runMain graft.BenchQ67 /root/testdata/sf0.1 32` */
object BenchQ67 {
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

    def raw = Tables.load(spark, sfDir, "documents").select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 13 === 0,
          expr("repeat(' buy now', CAST(length(text) div 20 + 10 AS INT))"))
          .otherwise(lit("")),
        lit(" user"), col("doc_id").cast("string"), lit("@mail.example.com "),
        (col("doc_id") * 1000003L + 777777L).cast("string"),
        lit("\nall rights reserved"),
        when(col("doc_id") % 2 === 0, lit("\nsubscribe today"))
          .otherwise(lit("\nfollow us"))).as("text"))

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[q67-probe] $label%-32s $s%6.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up
    noop(Curation.curatePublished(raw, raw.filter(col("doc_id") % 41 === 0)))
    spark.catalog.clearCache()

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep (cumulative staged) ---")
      val scrubbed = time("scrubLines (probe+cache)") {
        val s = Cache()(Curation.scrubLines(raw)); s.count(); s
      }
      val gated = time("gate+repetitionGate (cache)") {
        val g = Cache()(Curation.repetitionGate(Curation.gate(scrubbed))); g.count(); g
      }
      val survivors = time("dedupe (cache)") {
        val s = Cache()(Curation.dedupe(gated)); s.count(); s
      }
      time("decontaminate+pack (noop)") {
        val clean = Curation.decontaminate(survivors,
          Curation.scrub(raw.filter(col("doc_id") % 41 === 0)))
        noop(TextOps.packSequences(
          clean.select(col("doc_id"), size(col("ts")).cast("bigint").as("n_tokens")),
          "doc_id", "n_tokens", 512))
      }
      spark.catalog.clearCache()
      time("full curatePublished") {
        noop(Curation.curatePublished(raw, raw.filter(col("doc_id") % 41 === 0)))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
