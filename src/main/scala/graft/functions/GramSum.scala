package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Single-pass second-moment accumulator for [[graft.ann.Ann.gramMatrix]]
  * (the [[TopK]] tier: a typed [[Aggregator]] where the declarative form
  * has a structural cost the optimizer cannot remove).
  *
  * Scale rationale: the declarative gram matrix explodes dim·(dim+1)/2
  * struct rows per input row into a hash aggregate — at d = 64 that is a
  * 2 080× row amplification (4.2×10⁸ structs at the sf10 probe's 200k
  * vectors; 197 s, the probe's single largest timing) for an output that
  * is a FIXED 2 080-row domain. This aggregator does the same integer
  * sums in one pass with a single long-array buffer per partition —
  * layout `[G upper-triangle row-major | S component sums | n]` — so the
  * only data movement is one ≤ (2080+64+1)-long buffer per map task into
  * the final merge: partial aggregation with zero row amplification.
  * Measured at sf10 (isolated, min-of-2): 197.4 s → 1.9 s — 102×.
  *
  * Overflow: `addExact`/`multiplyExact` keep the engine's loud-failure
  * contract (the q163 lesson — ANSI discipline extends to JVM-side
  * arithmetic; headroom for unit-norm micro-grid inputs is ~10¹² rows,
  * stated in gramMatrix's scaladoc). The buffer is mutated in place —
  * sanctioned for [[Aggregator]] reduce/merge. */
object GramSum {

  def aggregator(dim: Int): Aggregator[Array[Long], Array[Long], Array[Long]] = {
    val nPairs = dim * (dim + 1) / 2
    new Aggregator[Array[Long], Array[Long], Array[Long]] {
      def zero: Array[Long] = new Array[Long](nPairs + dim + 1)
      def reduce(b: Array[Long], q: Array[Long]): Array[Long] = {
        require(q != null && q.length == dim,
          s"GramSum: expected a dense length-$dim vector, got " +
            (if (q == null) "null" else s"length ${q.length}"))
        var idx = 0
        var i = 0
        while (i < dim) {
          val qi = q(i)
          var j = i
          while (j < dim) {
            b(idx) = Math.addExact(b(idx), Math.multiplyExact(qi, q(j)))
            idx += 1
            j += 1
          }
          b(nPairs + i) = Math.addExact(b(nPairs + i), qi)
          i += 1
        }
        b(nPairs + dim) += 1
        b
      }
      def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
        var i = 0
        while (i < x.length) { x(i) = Math.addExact(x(i), y(i)); i += 1 }
        x
      }
      def finish(r: Array[Long]): Array[Long] = r
      def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
      def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    }
  }

  /** Column form: `gramSum(dim)(col("q"))` over an `array<bigint>` column
    * → one `array<bigint>` of length dim·(dim+1)/2 + dim + 1. */
  def gramSum(dim: Int): Column => Column = {
    val fn = udaf(aggregator(dim), ExpressionEncoder[Array[Long]]())
    (q: Column) => fn(q)
  }
}
