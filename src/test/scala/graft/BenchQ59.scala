package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.{Curation, TextOps}

/** Stage-timing probe for the q59 full-curation chain (the round-6
  * composition): where do the seconds go, and which Reuse policy wins
  * when the gate includes the scrub regexes. Run:
  * `Test/runMain graft.BenchQ59 /root/testdata/sf0.1 32` */
object BenchQ59 {
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
      concat(col("text"), lit(" user"), col("doc_id").cast("string"),
        lit("@mail.example.com "),
        (col("doc_id") * 1000003L + 777777L).cast("string")).as("text"))

    def time(label: String)(f: => Unit): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[q59-probe] $label%-28s $s%6.2f s")
      s
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up
    noop(Curation.curateFull(raw, raw.filter(col("doc_id") % 41 === 0)))

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      time("scrub only")(noop(Curation.scrub(raw)))
      time("scrub+gate")(noop(Curation.gate(Curation.scrub(raw))))
      time("survivors (Persist)") {
        val s = graft.transform.Cache()(Curation.curatedDocs(Curation.scrub(raw), Curation.Persist))
        noop(s)
      }
      time("survivors (Recompute)") {
        val s = graft.transform.Cache()(Curation.curatedDocs(Curation.scrub(raw), Curation.Recompute))
        noop(s)
      }
      time("scrub(cached)+gate") {
        val sc = graft.transform.Cache()(Curation.scrub(raw))
        noop(Curation.gate(sc))
      }
      time("gate-HOF (scrub cached)") {
        // the pre-round-6 interpreted formulation, for the throughput delta
        val sc = graft.transform.Cache()(Curation.scrub(raw))
        val profiles = Map(
          "en" -> Seq("the", "a", "of", "and", "to"),
          "es" -> Seq("el", "la", "de", "y", "que"),
          "fr" -> Seq("le", "la", "de", "et", "un"),
          "de" -> Seq("der", "die", "das", "und", "ist"),
          "zh" -> Seq("de", "le", "shi", "bu", "wo"))
        val scores = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
          (lang, size(filter(col("ts"), t => words.map(w => t === lit(w)).reduce(_ || _))))
        }
        val packed = array(scores.map { case (lang, s) =>
          struct((-s).as("neg"), lit(lang).as("lang"), s.cast("bigint").as("score"))
        }: _*)
        val best = array_sort(packed).getItem(0)
        noop(sc
          .select(col("doc_id"), col("text"), col("ts"),
            best.getField("lang").as("lang_pred"),
            size(col("ts")).cast("bigint").as("n_tokens"))
          .filter(col("lang_pred") === "en" && col("n_tokens") >= 30)
          .select("doc_id", "text", "ts"))
      }
      time("survivors (scrub cached)") {
        val sc = graft.transform.Cache()(Curation.scrub(raw))
        noop(graft.transform.Cache()(Curation.curatedDocs(sc, Curation.Recompute)))
      }
      time("full q59 (Persist)")(
        noop(Curation.curateFull(raw, raw.filter(col("doc_id") % 41 === 0),
          reuse = Curation.Persist)))
      time("full q59 (Recompute)")(
        noop(Curation.curateFull(raw, raw.filter(col("doc_id") % 41 === 0),
          reuse = Curation.Recompute)))
    }
    spark.stop()
  }
}
