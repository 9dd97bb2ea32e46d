package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data layout — the write-side half of scan pruning at 100 TB: a
  * table Z-ORDERED on (k1, k2) gives every file tight min/max zone maps
  * on BOTH dimensions at once, so a reader filtering on either key
  * prunes most files (the Delta/Iceberg OPTIMIZE ZORDER move; a
  * single-column sort gives tight maps on one dimension and useless
  * ones on the other).
  *
  * Two key tiers: [[mortonKey]] is the fixed-width 2×31-bit serving
  * primitive (5-round magic-number spread, constant cost, q182's
  * zone-map report); [[zValue]] is the n-dim COMPACT interleave whose
  * per-dim bit widths adapt to the data — the form [[skippingCard]]
  * (the measured linear-vs-z comparison, q236) and [[zorderWrite]]
  * (the physical `repartitionByRange(z).sortWithinPartitions(z)`
  * layout step) build on. */
object Layout {

  private val SpreadMasks = Seq(
    16 -> 281470681808895L,    // 0x0000FFFF0000FFFF
    8  -> 71777214294589695L,  // 0x00FF00FF00FF00FF
    4  -> 1085102592571150095L, // 0x0F0F0F0F0F0F0F0F
    2  -> 3689348814741910323L, // 0x3333333333333333
    1  -> 6148914691236517205L) // 0x5555555555555555

  /** Bits of `c` spread to even positions (the magic-number Morton
    * spread: 5 shift-or-mask rounds, pure codegen'd integer ops). */
  private def spread(c: Column): Column =
    SpreadMasks.foldLeft(c) { case (acc, (sh, m)) =>
      acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(m)) }

  /** 64-bit Morton (Z-order) key of two 31-bit non-negative ints: x on
    * even bit positions, y on odd. Inputs OUTSIDE [0, 2³¹) raise at
    * runtime (a silently wrapped shift would interleave garbage and
    * DuckDB — which range-checks shifts — could not even replay it;
    * the occupancy-guard discipline applied to bit arithmetic). All
    * ops are codegen'd long shifts/masks — identical two's-complement
    * semantics in every engine, and every intermediate stays under
    * 2⁶³ BY CONSTRUCTION of the 31-bit domain (the pre-mask order is
    * what keeps DuckDB's checked `<<` in range). */
  def mortonKey(x: Column, y: Column): Column = {
    def chk(c: Column, name: String): Column =
      when(c < 0 || c >= lit(2147483648L),
        raise_error(concat(lit(s"mortonKey: $name outside [0, 2^31): "),
          c.cast("string"))))
        .otherwise(c.cast("bigint"))
    spread(chk(x, "x")).bitwiseOR(shiftleft(spread(chk(y, "y")), 1))
  }

  /** Zone-map tightness report for a Z-ordered layout: rows bucketed
    * by `zkey >> bucketShift` (a bucket ≈ one file of a Z-ordered
    * write), with per-bucket row count and min/max of BOTH dimensions
    * — exactly the statistics a reader's file-pruning consults; tight
    * ranges on both columns are the measurable claim behind "Z-order
    * prunes on either key". Output: (bucket, n, x_min, x_max, y_min,
    * y_max).
    *
    * Scale shape: the key is a pure projection; the report is ONE
    * bucket-keyed map-side-combined agg. */
  def zoneMapReport(df: DataFrame, xCol: String, yCol: String,
      bucketShift: Int = 20): DataFrame = {
    require(bucketShift >= 1 && bucketShift <= 62,
      s"zoneMapReport: bucketShift in [1, 62], got $bucketShift")
    val x = col(xCol).cast("bigint")
    val y = col(yCol).cast("bigint")
    df.select(shiftright(mortonKey(x, y), bucketShift).as("bucket"),
        x.as("__x"), y.as("__y"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col("__x")).as("x_min"),
        max(col("__x")).as("x_max"), min(col("__y")).as("y_min"),
        max(col("__y")).as("y_max"))
  }


  /** Morton z-value with COMPACT per-dimension bit widths: dimension i
    * contributes bits 0..bitLens(i)-1, and bit b of dimension i lands at
    * position
    *
    *   Σ_{i'} min(b, bitLens(i')) + #{i' < i : bitLens(i') > b}
    *
    * — all dimensions' level-b bits sit together, levels stack upward,
    * and a dimension that runs out of bits simply stops claiming
    * positions. The compaction is what makes the curve work on keys of
    * UNEQUAL cardinality: naive fixed-width interleaving of an 11-bit
    * and a 7-bit key wastes the top positions on always-zero bits, so
    * the high z-bits (the ones bucket boundaries cut on) degenerate to
    * the wide key alone — measured on q236's first draft, the "z-order"
    * card collapsed to 8 buckets and LOST to the linear layout. With
    * compact widths the top positions mix every key's top bits and the
    * buckets are true near-cubes. All terms are codegen'd integer
    * builtins (shift/and/add over disjoint bits, so `+` is bitwise OR).
    *
    * Caller contract: inputs non-negative, value_i < 2^bitLens(i)
    * (otherwise high bits alias into wrong cubes — [[skippingCard]]
    * derives bitLens from the data maxima so this holds by
    * construction), Σ bitLens ≤ 63. */
  def zValue(dims: Seq[Column], bitLens: Seq[Int]): Column = {
    require(dims.nonEmpty && dims.length == bitLens.length,
      s"zValue: ${dims.length} dims vs ${bitLens.length} bit widths")
    require(bitLens.forall(_ >= 0) && bitLens.sum <= 63 && bitLens.sum >= 1,
      s"zValue: need 1 <= sum(bitLens) <= 63, got ${bitLens.mkString(",")}")
    val terms = for { (c, i) <- dims.zipWithIndex; b <- 0 until bitLens(i) } yield {
      val pos = bitLens.map(bl => math.min(b, bl)).sum +
        bitLens.take(i).count(_ > b)
      shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), pos)
    }
    terms.reduceLeft(_ + _)
  }

  /** Number of bits needed for values in [0, mx]: bitLen(0) = 0. The
    * oracle derives the same number as `min b with (mx >> b) = 0`. */
  private def bitLen(mx: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(mx)

  /** Smallest shift s with (maxKey >> s) < 2^log2Buckets — the
    * power-of-two bucket width for [[skippingCard]]'s equal-width
    * buckets (z-aligned buckets are exactly the Z-curve's cubes). The
    * oracle re-derives the same s in SQL, so it is part of the
    * cross-engine contract, not an implementation detail. */
  private def bucketShift(maxKey: Long, log2Buckets: Int): Int = {
    var s = 0
    while ((maxKey >> s) >= (1L << log2Buckets)) s += 1
    s
  }

  /** The measured skipping card: ONE pass over `df` tags every row with
    * its bucket id under (a) a LINEAR layout ordered by `dims.head` and
    * (b) the Z-ORDER layout over all `dims` — 2^log2Buckets equal-width,
    * power-of-two-aligned buckets each (a bucket stands for a file; its
    * min/max envelope is what a parquet footer would carry). A second,
    * bucket-sized agg folds the envelopes into one row per layout:
    *
    *   (layout, buckets_total, buckets_read, rows_total, rows_read,
    *    rows_match, read_frac)
    *
    * where a bucket is READ iff its per-dim [min, max] envelope
    * intersects the box [lo_i, hi_i] on EVERY dim (min/max pruning),
    * rows_read sums the read buckets' rows (the real I/O), and
    * rows_match counts rows actually inside the box (identical across
    * layouts — the invariant that makes the comparison honest).
    * Per-dim z bit widths derive from the data maxima ([[zValue]]'s
    * compact interleave), so the card needs no tuning parameter and the
    * oracle re-derives the same widths in SQL.
    *
    * Scale shape: the corpus is scanned once for statistics (a one-row
    * agg collected on the driver — bounded by construction, like the
    * centroid frames) and once for the card (the two layout rows per
    * input row explode from the same scan); the only shuffle is the
    * bucket-id agg (≤ 2^(log2Buckets+1) groups survive the map-side
    * combine). Every output is an exact integer except read_frac — one
    * IEEE division of two exact longs. */
  def skippingCard(df: DataFrame, dims: Seq[String], lo: Seq[Long],
      hi: Seq[Long], log2Buckets: Int = 6): DataFrame = {
    require(dims.nonEmpty && lo.length == dims.length && hi.length == dims.length,
      s"skippingCard: dims/lo/hi lengths differ (${dims.length}/${lo.length}/${hi.length})")
    require(log2Buckets >= 1 && log2Buckets <= 20,
      s"skippingCard: log2Buckets=$log2Buckets outside [1, 20]")
    val dcols = dims.map(d => col(d).cast("long"))

    // One-row stats frame: per-dim min/max — the non-negativity guard,
    // the compact bit widths, and the linear bucket width.
    val statAggs = dims.flatMap(d => Seq(min(col(d).cast("long")).as(s"mn_$d"),
      max(col(d).cast("long")).as(s"mx_$d")))
    val st = df.agg(statAggs.head, statAggs.tail: _*).collect()(0)
    val maxes = dims.indices.map(i => st.getLong(2 * i + 1))
    dims.zipWithIndex.foreach { case (d, i) =>
      val mn = st.getLong(2 * i)
      require(mn >= 0 && maxes(i) < (1L << 31),
        s"skippingCard: $d spans [$mn, ${maxes(i)}] outside [0, 2^31) — " +
          "z-order needs bounded non-negative integer keys")
    }
    val bitLens = maxes.map(bitLen)
    val zc = zValue(dcols, bitLens)

    // Second one-row pass: the z maximum (needs the widths from pass 1).
    val maxZ = df.agg(max(zc).as("mz")).collect()(0).getLong(0)
    val shLin = bucketShift(maxes.head, log2Buckets)
    val shZ = bucketShift(maxZ, log2Buckets)

    val matched = dims.zip(lo.zip(hi)).map { case (d, (l, h)) =>
      col(d).cast("long").between(l, h)
    }.reduceLeft(_ && _)
    val tagged = df
      .select(dcols.zip(dims).map { case (c, d) => c.as(d) } :+
        shiftright(dcols.head, shLin).as("__bl") :+
        shiftright(zc, shZ).as("__bz") :+
        when(matched, 1L).otherwise(0L).as("__m"): _*)
      .select(explode(array(
        struct(lit("linear").as("layout"), col("__bl").as("bucket")),
        struct(lit("zorder").as("layout"), col("__bz").as("bucket")))).as("lb") +:
        col("__m") +: dims.map(col): _*)
      .select(col("lb.layout").as("layout") +: col("lb.bucket").as("bucket") +:
        col("__m") +: dims.map(col): _*)

    val envAggs = dims.flatMap(d =>
      Seq(min(col(d)).as(s"mn_$d"), max(col(d)).as(s"mx_$d"))) ++
      Seq(count(lit(1)).as("n"), sum(col("__m")).as("nm"))
    val perBucket = tagged.groupBy("layout", "bucket")
      .agg(envAggs.head, envAggs.tail: _*)
    val read = dims.zip(lo.zip(hi)).map { case (d, (l, h)) =>
      col(s"mn_$d") <= h && col(s"mx_$d") >= l
    }.reduceLeft(_ && _)
    perBucket.groupBy("layout").agg(
      count(lit(1)).as("buckets_total"),
      sum(when(read, 1L).otherwise(0L)).as("buckets_read"),
      sum(col("n")).as("rows_total"),
      sum(when(read, col("n")).otherwise(0L)).as("rows_read"),
      sum(col("nm")).as("rows_match"))
      .withColumn("read_frac",
        col("rows_read").cast("double") / col("rows_total").cast("double"))
  }

  /** Physically apply the Z-order layout: range-partition on the
    * z-value into `nFiles` output files and sort within each (the
    * `OPTIMIZE ZORDER BY` write shape — range boundaries come from
    * Spark's reservoir sample, which is why the MEASUREMENT lives in
    * [[skippingCard]]'s deterministic buckets, not here). Bit widths
    * derive from the data maxima (one bounded one-row agg). Each
    * written file's parquet footer then carries the near-cube min/max
    * envelopes the card predicts. */
  def zorderWrite(df: DataFrame, dims: Seq[String], path: String,
      nFiles: Int): Unit = {
    require(nFiles >= 1, s"zorderWrite: nFiles must be >= 1, got $nFiles")
    val dcols = dims.map(d => col(d).cast("long"))
    val mAggs = dims.map(d => max(col(d).cast("long")).as(s"mx_$d"))
    val st = df.agg(mAggs.head, mAggs.tail: _*).collect()(0)
    val bitLens = dims.indices.map(i => bitLen(st.getLong(i)))
    df.withColumn("__z", zValue(dcols, bitLens))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
