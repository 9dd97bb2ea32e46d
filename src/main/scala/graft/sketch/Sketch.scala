package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Stable

/** Bounded-memory corpus statistics — the sketch tier that completes the
  * engine's sketch family (MinHash signatures, SimHash, Bloom
  * decontamination): count-min for heavy-hitter frequencies and a
  * deterministic HyperLogLog for cardinality. Both are DETERMINISTIC
  * given the md5-derived hash family ([[Stable.hash64]] /
  * [[Stable.familyHash]]), so estimates are reproducible under
  * retries/speculation and bit-reproducible by the DuckDB oracle — the
  * usual "approximate = unstable" objection does not apply.
  *
  * Why sketches at all: the exact paths ([[graft.text.TextOps
  * .vocabCoverage]]'s count agg, `count_distinct`) shuffle a
  * vocabulary-sized frame — fine when the vocabulary is bounded, corpus
  * -sized for n-grams/URLs/shingles at 100 TB. The sketch state is FIXED
  * (depth×width counters, m registers) regardless of input size, every
  * update is map-side combinable, and the merge is the same agg — the
  * canonical distributed-statistics trade. */
object Sketch {

  /** Family indices reserved for the count-min rows — disjoint from the
    * MinHash members (0..7), shingle constants (100..102), and Bloom
    * hashes (200..203). */
  val CmsFamilyBase = 300

  /** Count-min sketch counter table over a value column: one
    * (row_j, cell, cnt) row per occupied cell, at most `depth`·`width`
    * rows TOTAL regardless of input size. Each input value increments
    * one cell per row (depth independent family hashes of one md5
    * base); a point estimate is the MIN over rows of its cells
    * ([[cmsEstimate]]) — an upper bound on the true count (collisions
    * only ever ADD), within εN with ε = e/width at the standard
    * sizing. The whole build is one posexplode (depth rows per value)
    * into one map-side-combined keyed agg over a bounded key space. */
  def countMin(values: DataFrame, valCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16, s"countMin: depth $depth outside [1,16]")
    require(width >= 2, s"countMin: width $width < 2")
    values
      .select(Stable.hash64(col(valCol)).as("__b"))
      .select(posexplode(array((0 until depth).map(j =>
          pmod(Stable.familyHash(col("__b"), CmsFamilyBase + j),
            lit(width.toLong))): _*)).as(Seq("row_j", "cell")))
      .select(col("row_j").cast("bigint").as("row_j"), col("cell"))
      .groupBy("row_j", "cell").agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate probe values against a [[countMin]] counter table:
    * (valCol, cnt_cms) with cnt_cms = min over rows of the value's
    * cells (0 when a cell was never touched — the value cannot have
    * occurred). The counter table is bounded by construction
    * (depth·width rows), so it broadcasts unconditionally; the probe
    * side explodes `depth` rows per probe and collapses back with one
    * keyed min agg. `depth`/`width` must match the build. */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, valCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame =
    probes
      .select(col(valCol), Stable.hash64(col(valCol)).as("__b"))
      .select(col(valCol), posexplode(array((0 until depth).map(j =>
          pmod(Stable.familyHash(col("__b"), CmsFamilyBase + j),
            lit(width.toLong))): _*)).as(Seq("row_j", "cell")))
      .select(col(valCol), col("row_j").cast("bigint").as("row_j"), col("cell"))
      .join(broadcast(counters), Seq("row_j", "cell"), "left")
      .groupBy(valCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cnt_cms"))

  /** The deterministic-HLL register width: values are 60-bit
    * ([[Stable.hash64]]), the low `b` bits pick the bucket, the
    * remaining `60 - b` form the rank field. */
  private def fieldWidth(b: Int): Int = 60 - b

  /** Deterministic HyperLogLog cardinality estimate — ONE row:
    * (m, v_empty, s_int, estimate). Flajolet et al. 2007 with two
    * determinism-preserving choices:
    *
    *   - the register update is max(rho) per bucket over md5-derived
    *     hashes — a map-side-combinable integer agg over at most
    *     m = 2^b keys, insensitive to duplication and order (the
    *     estimator's own property makes retries/speculation free);
    *   - the harmonic sum Σ 2^-M is computed as the INTEGER
    *     `s_int = Σ 2^(W+1-M)` (every term a power of two, max
    *     m·2^(W+1) < 2^63) and divided ONCE at the output edge —
    *     a float Σ 2^-M would round order-DEPENDENTLY, breaking both
    *     retry determinism and the oracle.
    *
    * estimate = α_m · m² · 2^(W+1) / s_int — the RAW estimator; the
    * standard small-range (linear-counting) correction needs `ln`,
    * which is libm-dependent and would break cross-engine exactness,
    * so it is left to the consumer (v_empty is emitted precisely so a
    * consumer CAN apply it). Relative error ≈ 1.04/√m in the raw
    * regime (n ≳ 2.5m). */
  def hyperLogLog(values: DataFrame, valCol: String, b: Int = 8): DataFrame = {
    require(b >= 4 && b <= 16, s"hyperLogLog: b=$b outside [4,16]")
    val m = 1 << b
    val w = fieldWidth(b)
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val h = Stable.hash64(col(valCol))
    val rem = shiftright(h, b)
    val rho = (lit(w + 1) -
      when(rem > 0, length(bin(rem))).otherwise(lit(0))).cast("int")
    val regs = values
      .select(pmod(h, lit(m.toLong)).as("__bucket"), rho.as("__rho"))
      .groupBy("__bucket").agg(max(col("__rho")).as("__M"))
    regs
      .agg(count(lit(1)).as("__occ"),
        coalesce(sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${w + 1} - __M)")),
          lit(0L)).as("__s_occ"))
      .select(
        lit(m.toLong).as("m"),
        (lit(m.toLong) - col("__occ")).as("v_empty"),
        (col("__s_occ") +
          (lit(m.toLong) - col("__occ")) * lit(1L << (w + 1))).as("s_int"))
      .withColumn("estimate",
        lit(alpha) * lit(m.toDouble * m.toDouble) *
          (lit(Math.pow(2.0, (w + 1).toDouble)) / col("s_int").cast("double")))
  }

  /** The α_m literal [[hyperLogLog]] bakes into its estimate, exposed
    * so the oracle embeds the IDENTICAL double (Scala's Double.toString
    * round-trips; DuckDB parses the decimal literal to the same IEEE
    * value). */
  def hllAlpha(b: Int): Double = { val m = 1 << b; 0.7213 / (1.0 + 1.079 / m) }

  /** [[hyperLogLog]] keyed by a group column — one sketch row PER GROUP
    * (per-domain distinct URLs, per-source distinct shingles, per-
    * language vocabulary size): registers keyed by (group, bucket), so
    * the whole report is two map-side-combinable aggs over at most
    * groups·2^b keys — the exact `count_distinct(... ) GROUP BY g`
    * alternative shuffles every distinct (group, value) pair, corpus-
    * sized for shingles at 100 TB. Same integer-harmonic-sum
    * determinism as the global sketch; groups absent from the input
    * simply have no row. */
  def hyperLogLogByGroup(values: DataFrame, groupCol: String, valCol: String,
      b: Int = 8): DataFrame = {
    require(b >= 4 && b <= 16, s"hyperLogLogByGroup: b=$b outside [4,16]")
    val m = 1 << b
    val w = fieldWidth(b)
    val alpha = hllAlpha(b)
    val h = Stable.hash64(col(valCol))
    val rem = shiftright(h, b)
    val rho = (lit(w + 1) -
      when(rem > 0, length(bin(rem))).otherwise(lit(0))).cast("int")
    val regs = values
      .select(col(groupCol), pmod(h, lit(m.toLong)).as("__bucket"), rho.as("__rho"))
      .groupBy(col(groupCol), col("__bucket")).agg(max(col("__rho")).as("__M"))
    regs
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__occ"),
        coalesce(sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${w + 1} - __M)")),
          lit(0L)).as("__s_occ"))
      .select(col(groupCol),
        lit(m.toLong).as("m"),
        (lit(m.toLong) - col("__occ")).as("v_empty"),
        (col("__s_occ") +
          (lit(m.toLong) - col("__occ")) * lit(1L << (w + 1))).as("s_int"))
      .withColumn("estimate",
        lit(alpha) * lit(m.toDouble * m.toDouble) *
          (lit(Math.pow(2.0, (w + 1).toDouble)) / col("s_int").cast("double")))
  }

  /** The sketch's REGISTER TABLE exposed as data — the MERGEABLE form
    * (one (group, bucket, M) row per occupied register) that makes HLL
    * a distributable artifact: shards/partitions/dates sketch
    * independently, the tables land anywhere, and any union of groups
    * collapses to one estimate later via [[hllMergeRegisters]] without
    * revisiting the data. At most groups·2^b rows; same
    * map-side-combined max agg as [[hyperLogLogByGroup]]. */
  def hllRegistersByGroup(values: DataFrame, groupCol: String, valCol: String,
      b: Int = 8): DataFrame = {
    require(b >= 4 && b <= 16, s"hllRegistersByGroup: b=$b outside [4,16]")
    val m = 1 << b
    val w = fieldWidth(b)
    val h = Stable.hash64(col(valCol))
    val rem = shiftright(h, b)
    val rho = (lit(w + 1) -
      when(rem > 0, length(bin(rem))).otherwise(lit(0))).cast("int")
    values
      .select(col(groupCol), pmod(h, lit(m.toLong)).as("bucket"), rho.as("rho"))
      .groupBy(col(groupCol), col("bucket")).agg(max(col("rho")).as("M"))
  }

  /** Union-of-sketches: register-wise max over any set of
    * [[hllRegistersByGroup]] rows, then the standard estimate — and
    * because max is associative, commutative, and idempotent, the
    * merged estimate is BIT-IDENTICAL to sketching the union of the
    * raw data directly (SketchSpec pins it; the q151 oracle exploits
    * it — DuckDB re-sketches the union and must agree exactly). This
    * is the property that lets 1000 executors sketch 100 TB
    * independently and a one-row job combine the results. Bounded
    * everywhere: ≤ groups·2^b input rows, 2^b merged registers, one
    * output row (m, v_empty, s_int, estimate). */
  def hllMergeRegisters(regs: DataFrame, b: Int = 8): DataFrame = {
    require(b >= 4 && b <= 16, s"hllMergeRegisters: b=$b outside [4,16]")
    val m = 1 << b
    val w = fieldWidth(b)
    val alpha = hllAlpha(b)
    regs.groupBy("bucket").agg(max(col("M")).as("__M"))
      .agg(count(lit(1)).as("__occ"),
        coalesce(sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${w + 1} - __M)")),
          lit(0L)).as("__s_occ"))
      .select(lit(m.toLong).as("m"),
        (lit(m.toLong) - col("__occ")).as("v_empty"),
        (col("__s_occ") +
          (lit(m.toLong) - col("__occ")) * lit(1L << (w + 1))).as("s_int"))
      .withColumn("estimate",
        lit(alpha) * lit(m.toDouble * m.toDouble) *
          (lit(Math.pow(2.0, (w + 1).toDouble)) / col("s_int").cast("double")))
  }
}
