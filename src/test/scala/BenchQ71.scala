import org.apache.spark.sql.functions._

/** Stage-timing probe for q71 (dedupSpans) — the BenchQ59/BenchQ60 pattern. */
object BenchQ71 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), graft.text.TextOps.tokens(col("text")).as("ts"))
    time("docs count")(println(docs.count()))
    val k = 20
    val occ = docs.filter(size(col("ts")) > 0)
      .withColumn("__grams", graft.text.TextOps.ngramHashes(col("ts"), k))
      .select(col("doc_id"), posexplode(col("__grams")).as(Seq("__p", "__h")))
      .withColumn("__ok", col("doc_id").cast("long") * (1 << 21) + col("__p"))
    time("occ stream count")(println(occ.count()))
    val dict = occ.groupBy("__h")
      .agg(count(lit(1)).as("__c"), min(col("__ok")).as("__own"))
      .filter(col("__c") > 1).select("__h", "__own")
    time("dict count")(println(dict.count()))
    val cuts = occ.join(dict, Seq("__h"))
      .filter(col("__ok") =!= col("__own")).select(col("doc_id"), col("__p"))
    time("cuts count")(println(cuts.count()))
    time("full dedupSpans x1") {
      println(graft.text.TextOps.dedupSpans(docs, "doc_id", "ts", k)
        .agg(sum("n_removed"), sum("n_spans")).collect().toSeq)
    }
    time("full dedupSpans x2") {
      println(graft.text.TextOps.dedupSpans(docs, "doc_id", "ts", k)
        .agg(sum("n_removed"), sum("n_spans")).collect().toSeq)
    }
    spark.stop()
  }
}
