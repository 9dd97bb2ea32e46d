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
      outName: String = "__offset"): DataFrame =
    withPrefixSumTotal(df, order, valueCol, outName)._1

  /** [[withPrefixSum]] plus the EAGER grand total Σ`valueCol` — phase 1
    * already reduces it driver-side, so handing it back is free. Use it
    * whenever the caller needs the total alongside the running sums:
    * deriving the total from a second aggregation would RE-SCAN the
    * source, because the prefix frame is RDD-rooted and Spark's
    * exchange reuse cannot deduplicate subtrees across that bridge
    * (measured on the q204 plan: totals-as-literals removes a full
    * corpus scan + a broadcast join from the robust-mean / KS /
    * survival operators). */
  def withPrefixSumTotal(df: DataFrame, order: Seq[Column], valueCol: String,
      outName: String = "__offset"): (DataFrame, Long) = {
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
    (Bridge.internalCreateDataFrame(df.sparkSession, out, schema),
      partSums.sum)
  }

  /** GROUP-RESTARTING exclusive prefix sum: `outName` = sum of
    * `valueCol` over earlier rows of the SAME group in the total order
    * (each group's first row gets 0) — the primitive behind per-epoch /
    * per-split token packing, where every group is its own training
    * stream with its own offsets.
    *
    * Form: one global [[withPrefixSum]] ordered (groups, order) — groups
    * are contiguous in the range sort — minus each group's starting
    * offset. The starts frame is one map-side-combined min-agg collapsed
    * to |groups| rows and BROADCAST by default: both sides are
    * RDD-rooted (no stats), so without the hint Spark plans the
    * subtraction join sort-merge ON THE GROUP KEY — which shuffles the
    * whole corpus into |groups| partitions, a parallelism collapse at
    * the designed few-groups use (epochs, splits). A many-small-groups
    * caller (per-source packing over millions of sources) passes
    * `broadcastStarts = false` to take the group-keyed shuffle join
    * instead — there the group cardinality IS the parallelism. Same
    * contracts as [[withPrefixSum]]: non-null LONG value, tie-free
    * total order within each group. */
  def withGroupedPrefixSum(df: DataFrame, groupCols: Seq[String],
      order: Seq[Column], valueCol: String,
      outName: String = "__offset",
      broadcastStarts: Boolean = true): DataFrame = {
    require(groupCols.nonEmpty,
      "withGroupedPrefixSum: no group columns — use withPrefixSum")
    val g = withPrefixSum(df, groupCols.map(org.apache.spark.sql.functions.col) ++ order,
      valueCol, "__goff")
    val starts = g.groupBy(groupCols.map(org.apache.spark.sql.functions.col): _*)
      .agg(org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.col("__goff")).as("__gstart"))
    g.join(if (broadcastStarts) org.apache.spark.sql.functions.broadcast(starts)
           else starts, groupCols)
      .withColumn(outName,
        org.apache.spark.sql.functions.col("__goff") -
          org.apache.spark.sql.functions.col("__gstart"))
      .drop("__goff", "__gstart")
  }

  /** Append `outName` = max of `valueCol` over all EARLIER rows in the
    * total order (exclusive prefix max; first row gets Long.MinValue —
    * the max identity, so `v > prefix` is vacuously true there). Same
    * two-phase range-partitioned scan as [[withPrefixSum]] — max is
    * associative with identity, which is all the scan needs — and the
    * same contracts: non-null LONG value column, tie-free order. The
    * primitive behind [[graft.operators.Skyline]] (dominance = "beaten
    * by anything earlier in the order?"). */
  def withPrefixMax(df: DataFrame, order: Seq[Column], valueCol: String,
      outName: String = "__pmax"): DataFrame = {
    val sorted = df.sort(order: _*)
    val ordinal = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(ordinal).dataType == LongType,
      s"prefix max requires a bigint value column, got ${sorted.schema(ordinal).dataType}")
    val rdd = Bridge.internalRdd(sorted)
    val partMaxes = rdd.mapPartitionsWithIndex { (pid, it) =>
      var m = Long.MinValue
      it.foreach { r =>
        if (r.isNullAt(ordinal)) throw new IllegalArgumentException(
          s"prefix max: NULL in value column '$valueCol' (partition $pid)")
        m = math.max(m, r.getLong(ordinal))
      }
      Iterator((pid, m))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partMaxes.scanLeft(Long.MinValue)(math.max)
    val schema = StructType(sorted.schema.fields :+ StructField(outName, LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val joined = new JoinedRow
      val maxRow = new GenericInternalRow(1)
      var running = offsets(pid)
      it.map { r =>
        maxRow.setLong(0, running)
        running = math.max(running, r.getLong(ordinal))
        joined(r, maxRow): InternalRow
      }
    }
    Bridge.internalCreateDataFrame(df.sparkSession, out, schema)
  }
}
