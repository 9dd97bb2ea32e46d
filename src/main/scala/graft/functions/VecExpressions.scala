package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType, ShortType}

/** Native codegen dot product over float/double array columns — the hot
  * kernel of every similarity-search operator ([[graft.ann.Ann]]).
  *
  * Spark's array higher-order functions (`aggregate`, `zip_with`,
  * `transform`) are CodegenFallback: each element evaluation walks an
  * interpreted expression tree, which makes a 64-dim dot product ~64
  * interpreted lambda calls per row pair. This expression compiles to a
  * tight primitive loop inside whole-stage codegen.
  *
  * Semantics are EXACTLY those of the HOF formulation it replaces
  * (`aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, (acc, v) => acc + v)`), asserted element-wise in VecSpec:
  *   - sequential left-to-right double accumulation (fixed associativity,
  *     so results are bit-stable on any engine / any partitioning);
  *   - arrays of different lengths → NULL (zip_with pads with null, the
  *     null product poisons the fold);
  *   - any NULL element → NULL, regardless of position.
  */
case class DotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private def leftIsFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def rightIsFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getL = if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getR = if (rightIsFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ($getL) * ($getR);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotExpr =
    copy(left = l, right = r)
}

/** Dots of one vector column against a CONSTANT row matrix, in one codegen
  * node — the IVF centroid-assignment kernel. Same motivation as
  * [[graft.functions.SignBucketsExpr]]: the matrix rides as one reference
  * object instead of `rows * dim` literal nodes, keeping the plan O(1) in
  * the centroid count. Each output element is bit-identical to
  * `DotExpr(vec, lit(row))` (sequential double accumulation); a length
  * mismatch or NULL element nulls the whole output (every per-row dot
  * would be NULL — not reachable from [[graft.ann.Ann.ivfTopK]], which
  * guards dims upstream). */
case class MatDotsExpr(child: Expression, rows: Array[Array[Double]])
    extends UnaryExpression {
  private val nRows = rows.length
  private val dim = rows.head.length

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mat_dots"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_mat_dots requires array<float|double> input, got ${other.simpleString}")
  }

  private def childIsFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    var d = 0
    while (d < dim) { if (x.isNullAt(d)) return null; d += 1 }
    val out = new Array[Double](nRows)
    var r = 0
    while (r < nRows) {
      val row = rows(r)
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val v = if (childIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
        acc += v * row(i)
        i += 1
      }
      out(r) = acc
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("matRows", rows, "double[][]")
      val out = ctx.freshName("dots")
      val bad = ctx.freshName("bad")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val get = if (childIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |boolean $bad = ($a.numElements() != $dim);
         |if (!$bad) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($a.isNullAt($i)) { $bad = true; break; }
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $out = new double[$nRows];
         |  for (int $r = 0; $r < $nRows; $r++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $acc += ($get) * $ref[$r][$i];
         |    }
         |    $out[$r] = $acc;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MatDotsExpr =
    copy(child = newChild)
}

/** Σ values[indices[i]] — the table-lookup-and-accumulate kernel of
  * asymmetric-distance (ADC) scoring over product-quantized codes
  * ([[graft.ann.Ann.pqTopK]]): `values` is a query's flattened
  * per-subspace lookup table, `indices` a corpus row's flattened PQ
  * codes, and the score is one gather-sum — the FAISS IndexPQ search
  * loop as a whole-stage-codegen expression.
  *
  * Like [[DotExpr]] it replaces an interpreted HOF formulation
  * (`aggregate(transform(idx, i => element_at(vals, i + 1)), 0d, _+_)`)
  * on a per-(query, corpus-row) HOT path; semantics are pinned
  * element-wise to that form in VecSpec:
  *   - sequential left-to-right double accumulation over `indices`'
  *     order (fixed associativity — bit-stable across engines);
  *   - any NULL element or out-of-range index → NULL (element_at of a
  *     bad ordinal is null, and the null poisons the fold), so a
  *     malformed code row drops out of ranking instead of mis-scoring.
  * Indices are 0-based byte/short/int — PQ codes are stored narrow. */
case class GatherSumExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gather_sum"

  private def idxOk(t: DataType): Boolean = t match {
    case ArrayType(ByteType, _) | ArrayType(ShortType, _) | ArrayType(IntegerType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), r) if idxOk(r) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_gather_sum requires (array<double>, array<byte|short|int>), got " +
        s"${l.simpleString} and ${r.simpleString}")
  }

  private def idxType = right.dataType.asInstanceOf[ArrayType].elementType

  // Element-type dispatch resolved ONCE per expression instance, not per
  // array element: idxType walks right.dataType, and the interpreted
  // path's hot loop must not pay that walk per gather (the codegen path
  // resolves it at compile time; this is its interpreted mirror).
  @transient private lazy val getIdxAt: (ArrayData, Int) => Int = idxType match {
    case ByteType => (idx, i) => idx.getByte(i).toInt
    case ShortType => (idx, i) => idx.getShort(i).toInt
    case _ => (idx, i) => idx.getInt(i)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val vals = a.asInstanceOf[ArrayData]
    val idx = b.asInstanceOf[ArrayData]
    val n = idx.numElements()
    val nv = vals.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (idx.isNullAt(i)) return null
      val j = getIdxAt(idx, i)
      if (j < 0 || j >= nv || vals.isNullAt(j)) return null
      acc += vals.getDouble(j)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val nv = ctx.freshName("nv")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val getIdx = idxType match {
        case ByteType => s"(int) $b.getByte($i)"
        case ShortType => s"(int) $b.getShort($i)"
        case _ => s"$b.getInt($i)"
      }
      s"""
         |final int $n = $b.numElements();
         |final int $nv = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final int $j = $getIdx;
         |  if ($j < 0 || $j >= $nv || $a.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  $acc += $a.getDouble($j);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): GatherSumExpr =
    copy(left = l, right = r)
}

object VecExpressions {
  /** Codegen dot product of two array<float|double> columns. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Dots of a vector column against every row of a constant matrix. */
  def matDots(vec: Column, rows: Array[Array[Double]]): Column =
    Bridge.column(MatDotsExpr(Bridge.expression(vec), rows))

  /** Σ values[indices[i]] — ADC gather-sum over a flattened lookup table. */
  def gatherSum(values: Column, indices: Column): Column =
    Bridge.column(GatherSumExpr(Bridge.expression(values), Bridge.expression(indices)))
}
