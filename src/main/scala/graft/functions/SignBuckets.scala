package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All sign-LSH bucket keys for one vector, in one codegen node.
  *
  * The original formulation inlined every hyperplane as a Catalyst literal
  * array — `tables * planes * dim` `lit()` nodes (4 608 for q50's 6×12×64
  * configuration) walked on every analysis, optimization, and codegen pass;
  * plan *construction* dominated the LSH queries' wall clock at benchmark
  * scale. Here the plane matrix rides along as ONE reference object
  * (`ctx.addReferenceObj`) and the whole bucket computation is a tight
  * primitive loop, so the expression tree is a single node regardless of
  * table/plane/dim counts — and the generated source is identical across
  * invocations, keeping the janino codegen cache warm.
  *
  * Semantics are EXACTLY [[graft.ann.Ann.bucketKey]]'s per-table column
  * (asserted bit-for-bit in VecSpec): bit `p` of table `t`'s key is set iff
  * the sequential-double dot of the vector with plane `(t, p)` is `>= 0`;
  * a NULL element makes every dot NULL, which the original's
  * `when(d >= 0, bit).otherwise(0)` collapses to bucket 0 — mirrored here;
  * a length mismatch with the plane dimension throws (the original's
  * `raise_error` guard against silent all-pairs degeneration).
  *
  * Output: `array<bigint>` of length `tables` — feed straight to
  * `posexplode` for the (table, bucket) stream.
  */
case class SignBucketsExpr(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression {
  private val tables = planes.length
  private val dim = planes.head.head.length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_sign_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sign_buckets requires array<float|double> input, got ${other.simpleString}")
  }

  private def childIsFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Planes flattened to (tables*planes) rows of dim doubles — the shape
    * both eval paths iterate and the single codegen reference object. */
  private lazy val flat: Array[Array[Double]] = planes.flatten
  private lazy val planesPerTable = planes.head.length

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != dim) throw new IllegalArgumentException(
      s"LSH dim mismatch: expected $dim, got $n")
    val out = new Array[Long](tables)
    var anyNull = false
    var d = 0
    while (d < n && !anyNull) { anyNull = x.isNullAt(d); d += 1 }
    if (!anyNull) {
      var r = 0
      while (r < flat.length) {
        val plane = flat(r)
        var acc = 0.0
        var i = 0
        while (i < dim) {
          val v = if (childIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
          acc += v * plane(i)
          i += 1
        }
        if (acc >= 0) out(r / planesPerTable) |= (1L << (r % planesPerTable))
        r += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("lshPlanes", flat, "double[][]")
      val out = ctx.freshName("buckets")
      val anyNull = ctx.freshName("anyNull")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val get = if (childIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "LSH dim mismatch: expected $dim, got " + $a.numElements());
         |}
         |long[] $out = new long[$tables];
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $dim; $i++) {
         |  if ($a.isNullAt($i)) { $anyNull = true; break; }
         |}
         |if (!$anyNull) {
         |  for (int $r = 0; $r < ${flat.length}; $r++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $acc += ($get) * $ref[$r][$i];
         |    }
         |    if ($acc >= 0) $out[$r / $planesPerTable] |= (1L << ($r % $planesPerTable));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignBucketsExpr =
    copy(child = newChild)
}

object SignBuckets {
  /** All per-table sign-LSH bucket keys of `vec` as one `array<bigint>`. */
  def apply(vec: Column, planes: Array[Array[Array[Double]]]): Column =
    Bridge.column(SignBucketsExpr(Bridge.expression(vec), planes))
}
