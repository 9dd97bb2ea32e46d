package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Stable, contiguous 0-based row addressing — the engine's analog of fuel's
  * IndexableDataset (reference: fuel/datasets/base.py:316-388). Every scheme
  * and every positional operator (Merge zip-join, Batch, cross-validation)
  * builds on `__idx`.
  *
  * Scale design: a `row_number()` over an empty window forces all rows into
  * ONE partition — a non-starter at 100 TB. Instead: distributed range-
  * partitioned sort, then `RDD.zipWithIndex`, which computes per-partition
  * offsets with one lightweight count job (the sort's shuffle files are
  * reused, not recomputed) and assigns indices fully in parallel. Values
  * are identical to `row_number() OVER (ORDER BY ...) - 1` (which is what
  * the DuckDB oracle computes), but the plan scales.
  *
  * The zip runs at the InternalRow layer ([[Bridge.internalRdd]]): the
  * public `df.rdd` route deserializes every row to an external `Row`
  * (per-field boxing) and re-encodes it through a reflective RowEncoder —
  * 2-3x the cost of the whole sort on wide tables. Here the index column
  * is appended with a reused JoinedRow, no copies; downstream operators
  * follow SparkPlan's copy-if-buffering contract.
  */
object Indexed {
  val Idx = "__idx"

  private def zipIdx(df: DataFrame, idxName: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(idxName, LongType, nullable = false))
    val rdd = Bridge.internalRdd(df).zipWithIndex().mapPartitions { it =>
      val joined = new JoinedRow
      val idxRow = new GenericInternalRow(1)
      it.map { case (r, i) =>
        idxRow.setLong(0, i)
        joined(r, idxRow): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    Bridge.internalCreateDataFrame(df.sparkSession, rdd, schema)
  }

  /** Append a contiguous 0-based `__idx` in the total order of `order`.
    * The order must be total (tie-free) for the index to be deterministic —
    * pass a unique key (or include one as the last sort column). Given a
    * total order, the index is a pure function of the DATA: invariant to
    * the input's partitioning or row order (PropertiesSpec law — the same
    * frame shuffled 2-way and 32-way indexes identically). */
  def withIdx(df: DataFrame, order: Seq[Column], idxName: String = Idx): DataFrame =
    zipIdx(df.sort(order: _*), idxName)

  /** Index in the source's existing partition/row order (no sort) — the
    * analog of iterating an IterableDataset in storage order
    * (reference: fuel/datasets/base.py:244-313). Deterministic for a
    * deterministic source such as a fixed set of parquet files — but,
    * unlike [[withIdx]], NOT invariant to layout: it numbers the layout,
    * not the data, so any upstream shuffle (repartition, a different file
    * split) renumbers the same rows (asserted in PropertiesSpec). Use it
    * only directly over a source whose layout is the order you mean. */
  def withStorageIdx(df: DataFrame, idxName: String = Idx): DataFrame =
    zipIdx(df, idxName)

  /** fuel's Subset slice over an indexed stream (reference:
    * fuel/utils/__init__.py:30-397, IndexableDataset start/stop,
    * base.py:316-388): rows with `start <= idxName < stop`. A pure filter —
    * prunes at the scan when the index is a stored column.
    *
    * Ordering with schemes: [[graft.schemes.Schemes.compile]] (and
    * ConcatenatedScheme's closed-form offsets) assume a CONTIGUOUS 0-based
    * index, which a slice's surviving rows no longer have. Compile schemes
    * BEFORE slicing, or re-index ([[withIdx]]) after the slice. For
    * arbitrary index-list splits use [[Subset]], whose algebra composes
    * before any cluster-side selection happens. */
  def slice(df: DataFrame, start: Long, stop: Long, idxName: String = Idx): DataFrame = {
    require(start >= 0 && stop >= start, s"invalid subset [$start, $stop)")
    df.filter(col(idxName) >= start && col(idxName) < stop)
  }
}
