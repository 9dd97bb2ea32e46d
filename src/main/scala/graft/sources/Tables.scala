package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog of the named test tables (TPC-H-ish star schema + events/documents/
  * embeddings). Mirrors fuel's named-dataset registry (reference:
  * fuel/datasets/mnist.py:7-33 and friends) — a name-to-source binding with no
  * iteration state, so one table can back many concurrent queries
  * (reference: fuel/datasets/base.py:52-58, stateless Dataset protocol).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which the vectorized reader
      // rejects; read the raw int64 nanos and truncate to microseconds —
      // exactly what DuckDB's reader does (epoch_us truncates, not rounds).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` works on the dir. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
