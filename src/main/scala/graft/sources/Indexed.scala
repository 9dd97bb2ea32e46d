package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Stable, contiguous 0-based row addressing — the engine's analog of fuel's
  * IndexableDataset (reference: fuel/datasets/base.py:316-388). Every scheme
  * and every positional operator (Merge zip-join, Batch, cross-validation)
  * builds on `__idx`.
  *
  * Scale design: a `row_number()` over an empty window forces all rows into
  * ONE partition — a non-starter at 100 TB. Instead: distributed range-
  * partitioned sort, then `RDD.zipWithIndex`, which computes per-partition
  * offsets with one lightweight count job and assigns indices fully in
  * parallel. Values are identical to `row_number() OVER (ORDER BY ...) - 1`
  * (which is what the DuckDB oracle computes), but the plan scales.
  */
object Indexed {
  val Idx = "__idx"

  /** Append a contiguous 0-based `__idx` in the total order of `order`.
    * The order must be total (tie-free) for the index to be deterministic —
    * pass a unique key (or include one as the last sort column). */
  def withIdx(df: DataFrame, order: Seq[Column], idxName: String = Idx): DataFrame = {
    val sorted = df.sort(order: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(idxName, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }

  /** Index in the source's existing partition/row order (no sort) — the
    * analog of iterating an IterableDataset in storage order
    * (reference: fuel/datasets/base.py:244-313). Deterministic for a
    * deterministic source such as a fixed set of parquet files. */
  def withStorageIdx(df: DataFrame, idxName: String = Idx): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(idxName, LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
