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

  /** BOTH 60-bit halves of one md5: element 0 = [[hash]] (hex chars 1-15),
    * element 1 = hex chars 17-31 (bytes 8..14 then the high nibble of
    * byte 15) — the value of `conv(substring(hex(md5), 17, 15), 16, 10)`.
    * One digest, two draws — the [[Stable.seededHashPair]] kernel. */
  def hashPair(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var lo = 0L; var hi = 0L
    var i = 0
    while (i < 7) {
      lo = (lo << 8) | (d(i) & 0xffL)
      hi = (hi << 8) | (d(i + 8) & 0xffL)
      i += 1
    }
    lo = (lo << 4) | ((d(7) & 0xffL) >>> 4)
    hi = (hi << 4) | ((d(15) & 0xffL) >>> 4)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(lo, hi))
  }

  /** The SECOND 60-bit half alone — [[hashPair]]'s element 1 (hex chars
    * 17-31, `conv(substring(hex(md5), 17, 15), 16, 10)`) without the
    * array allocation: the wide-simhash kernel draws one half per part
    * in a tight loop. */
  def hashHi(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var hi = 0L
    var i = 8
    while (i < 15) { hi = (hi << 8) | (d(i) & 0xffL); i += 1 }
    (hi << 4) | ((d(15) & 0xffL) >>> 4)
  }

  /** Column form. */
  def hash64(c: Column): Column =
    Bridge.column(Hash64Expr(Bridge.expression(c)))
}

/** [[Hash64Expr]]'s paired sibling: both disjoint 60-bit halves of one md5
  * digest as `array<bigint>` — for consumers that need many independent
  * draws per row (the Poisson bootstrap), where one digest funding two
  * draws halves the md5 count. Bit-identical to the portable composition
  * `[conv(substring(md5(x),1,15),16,10), conv(substring(md5(x),17,15),16,10)]`
  * (asserted in StableSpec), so oracle contracts stay hex-replayable. */
case class Hash64PairExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hash64_pair"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_hash64_pair requires a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    Hash64Expr.hashPair(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash64Expr.hashPair($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash64PairExpr =
    copy(child = newChild)
}

object Hash64PairExpr {
  /** Column form. */
  def hashPair64(c: Column): Column =
    Bridge.column(Hash64PairExpr(Bridge.expression(c)))
}
