package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for [[Stable.hash64]]: the 60-bit md5-derived
  * hash computed directly from digest bytes inside whole-stage codegen —
  * no hex string materialization, no base-16 string parse, no UDF
  * serialization. Bit-identical to `conv(substring(md5(x),1,15),16,10)`
  * (asserted in StableSpec), so every oracle contract is unchanged; this is
  * purely the hot-path form for hash-heavy operators (minhash bases,
  * fingerprints, shuffles) — SURVEY.md §4's "custom codegen Expression"
  * tier.
  */
case class Hash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash64"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_hash64 requires a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    Hash64Expr.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash64Expr.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash64Expr =
    copy(child = newChild)
}

object Hash64Expr {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 15 hex digits of md5 as a long: bytes 0..6 big-endian (56 bits)
    * then the high nibble of byte 7 — exactly the value of
    * `conv(substring(hex(md5), 1, 15), 16, 10)`. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** Column form. */
  def hash64(c: Column): Column =
    Bridge.column(Hash64Expr(Bridge.expression(c)))
}
