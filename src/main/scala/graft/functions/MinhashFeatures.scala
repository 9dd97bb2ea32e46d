package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A document's whole MinHash feature set — signature AND distinct
  * shingle hashes — as ONE pure projection.
  *
  * The canonical chain ([[graft.dedup.Dedup.shingleHashes]] →
  * `minhashFromBases` / `collect_set`) explodes the token array and
  * combines neighbor hashes with a per-doc WINDOW, so every consumer
  * shuffles the corpus-token-sized stream keyed by doc — and the
  * near-dup stage has three such consumers (the signature mins and both
  * sides of the Jaccard verify join), three token-stream shuffles per
  * run. But the computation is per-document: nothing about it needs
  * rows. This expression runs the identical math inside the row —
  * token md5s once, the k-wide neighbor combination as an array scan,
  * family mins accumulated in registers — so signatures become a
  * shuffle-free projection and the only exchanges left in near-dup
  * removal are the genuinely relational ones (band bucket join,
  * verify join-back).
  *
  * Output `struct(sig: array<bigint>, shingles: array<bigint>)`; null
  * for an empty token array (the canonical chain's explode drops those
  * docs). `shingles` is the DISTINCT shingle-hash set, SORTED — the
  * deterministic form of the chain's `collect_set` (consumers are
  * set-algebraic: [[graft.dedup.Dedup.jaccard]], decontamination
  * joins). Bit-equality with the canonical chain is pinned in
  * TextDedupSpec on the real corpus; the oracle contracts
  * (`duckShingleHashes` / `duckFamilyHash`) are unchanged. Null tokens
  * hash as the empty string (TextOps.tokens never emits null; the
  * chain's null-lead semantics are not replicated).
  *
  * k ≤ 3 because the neighbor combination sums k terms each < 2^61 —
  * the same signed-64 overflow bound the canonical column math and the
  * DuckDB oracle share. */
case class MinhashFeaturesExpr(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  require(k >= 1 && k <= 3,
    s"shingle width must be 1..3 (k terms < 2^61 must sum inside signed 64), got $k")
  require(numHashes >= 1 && numHashes <= 64, s"numHashes must be 1..64, got $numHashes")

  override def dataType: DataType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("shingles", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_features"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_features requires array<string> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinhashFeaturesExpr.compute(input.asInstanceOf[ArrayData], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val out = nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.MinhashFeaturesExpr.compute($c, $k, $numHashes);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
    out
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashFeaturesExpr =
    copy(child = newChild)
}

object MinhashFeaturesExpr {
  private val M61 = 2305843009213693951L // 2^61 - 1
  private val Lo30 = 1073741823L         // 2^30 - 1 (mask == mod for nonneg)
  private val Empty = UTF8String.fromString("")

  /** One row's (sig, shingles); null for an empty array. Called from
    * generated code. */
  def compute(toks: ArrayData, k: Int, numHashes: Int): InternalRow = {
    val n = toks.numElements()
    if (n == 0) return null
    // fold each token's 60-bit md5 hash to 30 bits, exactly
    // shingleHashes' pmod(h, 2^30) xor (h >> 30)
    val f = new Array[Long](n)
    var p = 0
    while (p < n) {
      val t = if (toks.isNullAt(p)) Empty else toks.getUTF8String(p)
      val h = Hash64Expr.hash(t)
      f(p) = (h & Lo30) ^ (h >>> 30)
      p += 1
    }
    val sa = new Array[Long](k)
    var i = 0
    while (i < k) { sa(i) = Stable.familyConstants(100 + i)._1; i += 1 }
    val fa = new Array[Long](numHashes)
    val fb = new Array[Long](numHashes)
    val fc = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      val (a, b, c) = Stable.familyConstants(j)
      fa(j) = a; fb(j) = b; fc(j) = c
      j += 1
    }
    // kept shingle positions: 0 always; p > 0 only with a full k-window
    val nSh = math.max(n - k + 1, 1)
    val sh = new Array[Long](nSh)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    p = 0
    while (p < nSh) {
      var acc = 0L
      var i2 = 0
      while (i2 < k) {
        if (p + i2 < n) acc += sa(i2) * f(p + i2)
        i2 += 1
      }
      val s = acc % M61
      sh(p) = s
      val lo = s & Lo30
      val hi = s >>> 30
      var j2 = 0
      while (j2 < numHashes) {
        val v = (fa(j2) * lo + fb(j2) * hi + fc(j2)) % M61
        if (v < mins(j2)) mins(j2) = v
        j2 += 1
      }
      p += 1
    }
    java.util.Arrays.sort(sh)
    var distinct = if (nSh == 0) 0 else 1
    var q = 1
    while (q < nSh) {
      if (sh(q) != sh(q - 1)) { sh(distinct) = sh(q); distinct += 1 }
      q += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(mins),
      new GenericArrayData(java.util.Arrays.copyOf(sh, distinct))))
  }

  /** Column form. */
  def minhashFeatures(toks: Column, k: Int, numHashes: Int): Column =
    Bridge.column(MinhashFeaturesExpr(Bridge.expression(toks), k, numHashes))
}
