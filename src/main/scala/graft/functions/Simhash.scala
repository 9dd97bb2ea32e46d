package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A document's SimHash signature as one codegen pass — the native form
  * of [[graft.dedup.Dedup.simhashColumn]]'s math: bit j of the result is
  * set iff the sum over tokens of ±1 (sign = bit j of the token's 60-bit
  * md5 hash) is positive.
  *
  * The DataFrame form ([[graft.dedup.Dedup.simhash]] — explode + `bits`
  * conditional sums) is a corpus-token-stream shuffle into a doc-keyed
  * agg with a 60-column buffer; the HOF column form is interpreted per
  * (bit × token). Like [[MinhashFeaturesExpr]], the computation is
  * per-document, so it runs in-row: one md5 per token, bit votes
  * accumulated in a registers-only loop. Null for an empty token array
  * (the canonical explode drops those docs; [[graft.dedup.Dedup.simhashStore]]
  * keeps them as null — same value either way). Null tokens hash as the
  * empty string (TextOps.tokens never emits null). Bit-equality with
  * the canonical chain is pinned in TextDedupSpec/AdmitSpec. */
case class SimhashExpr(child: Expression, bits: Int, part: Int = 0)
    extends UnaryExpression {
  require(bits > 0 && bits <= 60, s"simhash supports 1..60 bits, got $bits")
  // part selects WHICH 60-bit md5 half feeds the bit votes: 0 = hex chars
  // 1-15 (the classic signature, bit-pinned against the q29 chain), 1 =
  // chars 17-31 ([[Hash64Expr.hashHi]]) — an independent second signature
  // from the SAME digest, so a 120-bit wide simhash costs no extra md5.
  require(part == 0 || part == 1, s"simhash part must be 0 or 1, got $part")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires array<string> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimhashExpr.compute(input.asInstanceOf[ArrayData], bits, part)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |Long ${ev.value}$$boxed = graft.functions.SimhashExpr.compute($c, $bits, $part);
         |if (${ev.value}$$boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = ${ev.value}$$boxed; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}

object SimhashExpr {
  private val Empty = UTF8String.fromString("")

  /** One row's simhash; null (boxed) for an empty array. Called from
    * generated code. */
  def compute(toks: ArrayData, bits: Int, part: Int): java.lang.Long = {
    val n = toks.numElements()
    if (n == 0) return null
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val t = if (toks.isNullAt(i)) Empty else toks.getUTF8String(i)
      val h = if (part == 0) Hash64Expr.hash(t) else Hash64Expr.hashHi(t)
      var j = 0
      while (j < bits) {
        counts(j) += (((h >>> j) & 1L).toInt << 1) - 1
        j += 1
      }
      i += 1
    }
    var v = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) v |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(v)
  }

  /** Column form. */
  def simhash(toks: Column, bits: Int, part: Int = 0): Column =
    Bridge.column(SimhashExpr(Bridge.expression(toks), bits, part))
}
