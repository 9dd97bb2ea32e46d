package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sources.Tables
import graft.text.{Curation, TextOps}
import graft.transform.Cache

/** Stage-timing probe for q60 incremental admission: where do the seconds
  * go. Run: `Test/runMain graft.BenchQ60 /root/testdata/sf0.1 32` */
object BenchQ60 {
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

    def docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    def wTs(df: DataFrame): DataFrame =
      df.withColumn("ts", TextOps.tokens(col("text")))
    def even = docs.filter(col("doc_id") % 2 === 0)
    def odd = docs.filter(col("doc_id") % 2 === 1)
    def freshRaw = odd
      .unionByName(even.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .unionByName(even.filter(col("doc_id") >= 20 && col("doc_id") < 40)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(lit("zzz "), col("text")).as("text")))
      .unionByName(odd.filter(col("doc_id") < 10)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
      .unionByName(odd.filter(col("doc_id") >= 10 && col("doc_id") < 30)
        .select((col("doc_id") + 4000000L).as("doc_id"),
          concat(lit("qq "), col("text")).as("text")))

    def time(label: String)(f: => Unit): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[q60-probe] $label%-36s $s%6.2f s")
      s
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def full(): Unit = {
      val store = Cache()(Dedup.signatureStore(wTs(even), "doc_id", "text", "ts"))
      noop(Curation.admit(wTs(freshRaw), store).select("doc_id"))
    }
    full() // warm-up

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      time("store sigs only")(noop(Dedup.signatureStore(wTs(even), "doc_id", "text", "ts")))
      time("fresh sigs only")(noop(Dedup.signatureStore(wTs(freshRaw), "doc_id", "text", "ts")))
      time("exact stages (w2)") {
        val store = Cache()(Dedup.signatureStore(wTs(even), "doc_id", "text", "ts"))
        val fstore = Cache()(Dedup.signatureStore(wTs(freshRaw), "doc_id", "text", "ts"))
        val w1 = fstore.join(
          Dedup.exact(fstore, col("doc_id"), col("xkey"))
            .select(col("keep_id").as("doc_id")), Seq("doc_id"))
        noop(w1.join(store.select("xkey"), Seq("xkey"), "left_anti"))
      }
      time("full admit")(full())
    }
    spark.stop()
  }
}
