package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed exclusive prefix sum — running totals in a total order
  * WITHOUT `sum() OVER (ORDER BY ...)`'s single-partition window (the same
  * scale argument as [[Indexed]]; an unpartitioned running-sum window moves
  * every row to one task).
  *
  * Classic two-phase scan: range-partitioned sort, one lightweight job
  * summing `valueCol` per partition (the sort's shuffle files are reused),
  * then a fully parallel second pass that adds each partition's starting
  * offset to its local running total. Values are identical to
  * `sum(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING) - v` (exclusive),
  * which is what the DuckDB oracle computes.
  *
  * The primitive behind token-packing ([[graft.text.TextOps.packSequences]])
  * and any "global offset" computation over an ordered corpus.
  */
object PrefixSum {

  /** Append `outName` = sum of `valueCol` over all EARLIER rows in the
    * total order `order` (exclusive prefix sum; first row gets 0).
    * `valueCol` must be a non-null LONG column name; the order must be
    * total (tie-free) for determinism. */
  def withPrefixSum(df: DataFrame, order: Seq[Column], valueCol: String,
      outName: String = "__offset"): DataFrame = {
    val sorted = df.sort(order: _*)
    val ordinal = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(ordinal).dataType == LongType,
      s"prefix sum requires a bigint value column, got ${sorted.schema(ordinal).dataType}")
    val rdd = Bridge.internalRdd(sorted)
    // Phase 1: per-partition totals (tiny driver-side array; one job whose
    // upstream sort shuffle is reused by phase 2, not recomputed). NULLs
    // fail loudly here: InternalRow.getLong would silently read a NULL as
    // 0, diverging from any NULL-propagating oracle (DuckDB sum).
    val partSums = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach { r =>
        if (r.isNullAt(ordinal)) throw new IllegalArgumentException(
          s"prefix sum: NULL in value column '$valueCol' (partition $pid)")
        s += r.getLong(ordinal)
      }
      Iterator((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // offsets(pid) = sum of earlier partitions
    // Phase 2: parallel local scan + partition offset.
    val schema = StructType(sorted.schema.fields :+ StructField(outName, LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val joined = new JoinedRow
      val offRow = new GenericInternalRow(1)
      var running = offsets(pid)
      it.map { r =>
        offRow.setLong(0, running)
        running += r.getLong(ordinal)
        joined(r, offRow): InternalRow
      }
    }
    Bridge.internalCreateDataFrame(df.sparkSession, out, schema)
  }
}
