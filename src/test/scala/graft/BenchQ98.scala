package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Stage-timing probe for q98 fingerprint pairs: where do the seconds
  * go. Run: `Test/runMain graft.BenchQ98 /root/testdata/sf0.1 32` */
object BenchQ98 {
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

    def docs = Tables_docs(spark, sfDir)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[q98] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }

    // warm-up
    docs.count()
    time("tokens only") {
      docs.agg(sum(size(col("ts")))).head(); 1L
    }
    time("fingerprint (q25 shape)") {
      TextOps.fingerprint(docs, "ts", 3, 4)
        .select(col("doc_id"), size(col("fps"))).agg(sum("size(fps)")).head(); 1L
    }
    time("explode fps") {
      TextOps.fingerprint(docs, "ts", 3, 4)
        .select(col("doc_id"), explode(col("fps")).as("fp")).count()
    }
    time("groupBy(fp) buckets") {
      TextOps.fingerprint(docs, "ts", 3, 4)
        .select(col("doc_id"), explode(col("fps")).as("fp"))
        .groupBy("fp").agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .count()
    }
    time("full fingerprintPairs") {
      TextOps.fingerprintPairs(docs, "doc_id", "ts", 3, 4, minShared = 5).count()
    }
    time("explode AFTER persist") {
      val f = TextOps.fingerprint(docs, "ts", 3, 4).persist()
      try {
        f.count()
        f.select(col("doc_id"), explode(col("fps")).as("fp")).count()
      } finally { f.unpersist(); }
    }
    time("explode posexplode variant") {
      TextOps.fingerprint(docs, "ts", 3, 4)
        .select(col("doc_id"), posexplode(col("fps")).as(Seq("i", "fp"))).count()
    }
    time("explode_outer + notNull") {
      TextOps.fingerprint(docs, "ts", 3, 4)
        .select(col("doc_id"), explode_outer(col("fps")).as("fp"))
        .filter(col("fp").isNotNull).count()
    }
    val plan = TextOps.fingerprint(docs, "ts", 3, 4)
      .select(col("doc_id"), explode(col("fps")).as("fp"))
      .queryExecution.executedPlan.toString
    println(plan.take(4000))
    spark.stop()
  }

  private def Tables_docs(spark: SparkSession, dir: String) =
    graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), TextOps.tokens(col("text")).as("ts"))
}
