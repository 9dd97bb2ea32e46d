package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, the greatest right timestamp
  * at or before the left row's timestamp within the same key. The classic
  * event-enrichment operator (each purchase matched to the user's latest
  * prior click); Spark has no built-in, DuckDB's native `ASOF LEFT JOIN`
  * is the oracle.
  *
  * Scale shape: the naive formulation is a range join (`l.key = r.key AND
  * r.ts <= l.ts` + max) — a per-key cross product. This implementation is
  * ONE shuffle on the key: union both sides tagged, one per-key window
  * ordered by (ts, side) carrying the last non-null right timestamp
  * forward. Right rows order before left rows at equal ts, so an exact-ts
  * match is picked up (`<=` semantics). Keys are numerous → the window
  * partitions well; no unpartitioned window, no cartesian.
  *
  * Ties: multiple right rows at the matched timestamp carry the same
  * timestamp value, so the output is deterministic even though their
  * relative order is not.
  */
object AsOf {

  /** @param left   rows to enrich (any columns; must contain key + ts)
    * @param right  (key, ts) rows to match against — extra columns ignored
    * @param outCol appended to `left`'s columns: the matched right
    *               timestamp, null when no right row is at or before.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, outCol: String = "asof_ts"): DataFrame = {
    val tsType = left.schema(tsCol).dataType
    require(right.schema(tsCol).dataType == tsType,
      s"as-of timestamp types differ: $tsType vs ${right.schema(tsCol).dataType}")
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__rts", lit(null).cast(tsType))
    val r = right.select(col(keyCol), col(tsCol))
      .withColumn("__side", lit(0))
      .withColumn("__rts", col(tsCol))
    val tagged = r.unionByName(l, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn(outCol, last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__rts")
  }
}
