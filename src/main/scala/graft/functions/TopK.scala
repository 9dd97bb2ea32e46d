package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-k as a typed [[Aggregator]] (the engine's UDAF
  * surface — SURVEY.md §2.6 "UDF/UDAF/UDTF").
  *
  * Scale rationale: a `rank() OVER (PARTITION BY g ORDER BY v)` with few
  * distinct groups sorts each group's entire data in a single task — unbounded
  * skew at 100 TB. This aggregator instead keeps a bounded (≤ k) sorted buffer
  * and participates in partial aggregation: every map task reduces its input
  * to ≤ k rows per group before the (tiny) shuffle. Ordering: value DESC,
  * tieBreak ASC — deterministic, row_number-like (ties broken, not kept).
  */
object TopK {
  type Entry = (Double, Long) // (value, tieBreakKey)

  private def insert(buf: List[Entry], e: Entry, k: Int): List[Entry] = {
    // descending by value, ascending by key on ties
    val lt = (a: Entry, b: Entry) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    val (before, after) = buf.span(lt(_, e))
    val merged = before ::: (e :: after)
    if (merged.length > k) merged.take(k) else merged
  }

  def aggregator(k: Int): Aggregator[Entry, List[Entry], Seq[Entry]] =
    new Aggregator[Entry, List[Entry], Seq[Entry]] {
      def zero: List[Entry] = Nil
      def reduce(b: List[Entry], a: Entry): List[Entry] = insert(b, a, k)
      def merge(b1: List[Entry], b2: List[Entry]): List[Entry] =
        b2.foldLeft(b1)((acc, e) => insert(acc, e, k))
      def finish(r: List[Entry]): Seq[Entry] = r
      def bufferEncoder: Encoder[List[Entry]] = ExpressionEncoder[List[Entry]]()
      def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
    }

  /** Untyped column form: `topK(3)(col("v"), col("key"))` → array<struct<_1,_2>>
    * sorted by value DESC, key ASC. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(aggregator(k), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    (v: Column, key: Column) => fn(v, key)
  }
}
