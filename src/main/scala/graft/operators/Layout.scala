package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout keys — the write-side half of scan pruning at 100 TB: a
  * table Z-ORDERED on (k1, k2) gives every file tight min/max zone maps
  * on BOTH dimensions at once, so a reader filtering on either key
  * prunes most files (the Delta/Iceberg OPTIMIZE ZORDER move; a
  * single-column sort gives tight maps on one dimension and useless
  * ones on the other). The engine computes the key; `df.repartitionByRange
  * (col) .sortWithinPartitions(col) .write` is the layout step.
  */
object Layout {

  private val SpreadMasks = Seq(
    16 -> 281470681808895L,    // 0x0000FFFF0000FFFF
    8  -> 71777214294589695L,  // 0x00FF00FF00FF00FF
    4  -> 1085102592571150095L, // 0x0F0F0F0F0F0F0F0F
    2  -> 3689348814741910323L, // 0x3333333333333333
    1  -> 6148914691236517205L) // 0x5555555555555555

  /** Bits of `c` spread to even positions (the magic-number Morton
    * spread: 5 shift-or-mask rounds, pure codegen'd integer ops). */
  private def spread(c: Column): Column =
    SpreadMasks.foldLeft(c) { case (acc, (sh, m)) =>
      acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(m)) }

  /** 64-bit Morton (Z-order) key of two 31-bit non-negative ints: x on
    * even bit positions, y on odd. Inputs OUTSIDE [0, 2³¹) raise at
    * runtime (a silently wrapped shift would interleave garbage and
    * DuckDB — which range-checks shifts — could not even replay it;
    * the occupancy-guard discipline applied to bit arithmetic). All
    * ops are codegen'd long shifts/masks — identical two's-complement
    * semantics in every engine, and every intermediate stays under
    * 2⁶³ BY CONSTRUCTION of the 31-bit domain (the pre-mask order is
    * what keeps DuckDB's checked `<<` in range). */
  def mortonKey(x: Column, y: Column): Column = {
    def chk(c: Column, name: String): Column =
      when(c < 0 || c >= lit(2147483648L),
        raise_error(concat(lit(s"mortonKey: $name outside [0, 2^31): "),
          c.cast("string"))))
        .otherwise(c.cast("bigint"))
    spread(chk(x, "x")).bitwiseOR(shiftleft(spread(chk(y, "y")), 1))
  }

  /** Zone-map tightness report for a Z-ordered layout: rows bucketed
    * by `zkey >> bucketShift` (a bucket ≈ one file of a Z-ordered
    * write), with per-bucket row count and min/max of BOTH dimensions
    * — exactly the statistics a reader's file-pruning consults; tight
    * ranges on both columns are the measurable claim behind "Z-order
    * prunes on either key". Output: (bucket, n, x_min, x_max, y_min,
    * y_max).
    *
    * Scale shape: the key is a pure projection; the report is ONE
    * bucket-keyed map-side-combined agg. */
  def zoneMapReport(df: DataFrame, xCol: String, yCol: String,
      bucketShift: Int = 20): DataFrame = {
    require(bucketShift >= 1 && bucketShift <= 62,
      s"zoneMapReport: bucketShift in [1, 62], got $bucketShift")
    val x = col(xCol).cast("bigint")
    val y = col(yCol).cast("bigint")
    df.select(shiftright(mortonKey(x, y), bucketShift).as("bucket"),
        x.as("__x"), y.as("__y"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col("__x")).as("x_min"),
        max(col("__x")).as("x_max"), min(col("__y")).as("y_min"),
        max(col("__y")).as("y_max"))
  }
}
