package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashing-trick linear score of a token array: Σ over tokens of
  * `weights[hash64(token) mod weights.length]` — the feature-hashing
  * text classifier (Weinberger et al. 2009) every published quality
  * gate runs (the GPT-3 / CCNet classifier shape), evaluated as ONE
  * shuffle-free codegen pass per document.
  *
  * Weights are INTEGER (fixed-point: train a linear model, scale and
  * round its weights — exactness at the edges rule): the sum is then
  * order-independent and bit-exact cross-engine, unlike a float dot
  * product. The array rides as a single codegen reference object
  * ([[SignBucketsExpr]]'s playbook — plan size O(1) in the feature
  * dimension). Empty arrays score 0; null tokens hash as the empty
  * string (TextOps.tokens never emits null). */
case class HashScoreExpr(child: Expression, weights: Array[Long])
    extends UnaryExpression {
  require(weights.nonEmpty, "hash score needs a non-empty weight vector")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hash_score requires array<string> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HashScoreExpr.compute(input.asInstanceOf[ArrayData], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashScoreWeights", weights, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashScoreExpr.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashScoreExpr =
    copy(child = newChild)
}

object HashScoreExpr {
  private val Empty = UTF8String.fromString("")

  /** One row's score sum. Called from generated code. */
  def compute(toks: ArrayData, weights: Array[Long]): Long = {
    val n = toks.numElements()
    val dim = weights.length
    var acc = 0L
    var i = 0
    while (i < n) {
      val t = if (toks.isNullAt(i)) Empty else toks.getUTF8String(i)
      acc += weights((Hash64Expr.hash(t) % dim).toInt)
      i += 1
    }
    acc
  }

  /** Column form. Pass the SAME array instance at every call site so
    * whole-stage codegen's subexpression elimination can share one
    * evaluation (case-class equality is reference equality on the
    * array). */
  def hashScore(toks: Column, weights: Array[Long]): Column =
    Bridge.column(HashScoreExpr(Bridge.expression(toks), weights))
}
