package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Numeric distribution drift between two snapshots — the
  * population-stability monitoring a refreshed corpus/event stream runs
  * per column (PSI: Σ (p_a − p_b)·log(p_a / p_b) over a shared
  * histogram). Companion to [[graft.text.TextOps.vocabDrift]] (the text
  * half) and [[Snapshot.diff]] (the row-identity half): this is the
  * DISTRIBUTIONAL half for numeric columns.
  *
  * Cross-engine-exact by the engine's quantization discipline:
  *  - bucket = clamp(floor((x − lo) / width)) — one IEEE-double op chain
  *    per value, no accumulation, so both engines bucket identically;
  *    the grid (lo, width, nBuckets) is a DECLARED monitoring contract,
  *    not data-derived (a data-derived grid would shift with the very
  *    drift being measured);
  *  - shares live on an integer grid: share = count·scale div total;
  *  - the log lives in integer BITS (ilog2 — the [[graft.text
  *    .Perplexity]] discipline), with +1 as the empty-bucket epsilon:
  *    psi_term = (share_a − share_b)·(ilog2(share_a + 1) −
  *    ilog2(share_b + 1)) — never negative (both factors share a sign,
  *    and equal-bit buckets contribute 0), LONG-summable in any order.
  *
  * Scale shape: one map-side-combined bucket agg per side (output
  * bounded by nBuckets, whatever the corpus), a bucket-keyed outer join
  * of two bounded frames against the driver-literal bucket spine (every
  * bucket reports, observed or not), pure projections after. NULL
  * values are excluded from both histograms (pair with
  * [[Checks.NotNull]] when NULL itself is the drift). Output: one row
  * per bucket — (bucket, n_a, n_b, share_a, share_b, psi_term), all
  * integers; total PSI-bits = the sum of psi_term, mergeable across
  * column shards only via the counts (sum counts, then re-derive). */
object Drift {

  private val ilog2 = (c: Column) => (length(bin(c)) - 1).cast("bigint")

  def histogramDrift(a: DataFrame, b: DataFrame, valueCol: String,
      lo: Double, width: Double, nBuckets: Int,
      scale: Long = 1000000L): DataFrame = {
    require(nBuckets >= 2, s"histogramDrift: nBuckets must be >= 2, got $nBuckets")
    require(width > 0, s"histogramDrift: width must be positive, got $width")
    require(scale >= 1000, s"histogramDrift: scale too coarse, got $scale")
    val spark = a.sparkSession
    import spark.implicits._
    def bucketed(df: DataFrame, out: String): DataFrame = {
      val raw = floor((col(valueCol) - lit(lo)) / lit(width)).cast("long")
      df.filter(col(valueCol).isNotNull)
        .select(least(greatest(raw, lit(0L)), lit(nBuckets.toLong - 1)).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(out))
    }
    val spine = (0L until nBuckets.toLong).toDF("bucket")
    val hist = spine
      .join(bucketed(a, "n_a"), Seq("bucket"), "left")
      .join(bucketed(b, "n_b"), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val totals = hist.agg(sum(col("n_a")).as("__ta"), sum(col("n_b")).as("__tb"))
    hist.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_a"), col("n_b"),
        when(col("__ta") > 0, expr(s"n_a * ${scale}L div __ta")).otherwise(lit(0L)).as("share_a"),
        when(col("__tb") > 0, expr(s"n_b * ${scale}L div __tb")).otherwise(lit(0L)).as("share_b"))
      .withColumn("psi_term",
        (col("share_a") - col("share_b")) *
          (ilog2(col("share_a") + 1) - ilog2(col("share_b") + 1)))
  }

  /** PSI per event-time window from a MATERIALIZED windowed histogram
    * against a reference histogram — the assembly half of the streaming
    * drift monitor ([[graft.streaming.Streaming.windowedHistogram]]
    * emits `hist` under continuous arrival; this runs over the sink, or
    * over a batch twin of the same shape). Contracts: `hist` has
    * (win_start, bucket, n), `reference` has (bucket, n_ref), both on
    * the SAME declared grid. Same integer discipline as
    * [[histogramDrift]]: integer shares, bit-quantized logs, terms
    * nonnegative and LONG-summable; the per-window spine is COMPLETE
    * (absent buckets report n = 0 — where the reference has mass, that
    * absence IS the drift). Everything here is bounded: |windows| ×
    * nBuckets cells, reference and window totals broadcast. Output: one
    * row per (win_start, bucket) — (n, n_ref, share_a, share_b,
    * psi_term); Σ psi_term per window is the monitoring series. */
  def driftFromHistograms(hist: DataFrame, reference: DataFrame,
      nBuckets: Int, scale: Long = 1000000L): DataFrame = {
    require(nBuckets >= 2, s"driftFromHistograms: nBuckets must be >= 2, got $nBuckets")
    require(scale >= 1000, s"driftFromHistograms: scale too coarse, got $scale")
    // ONE pass over the histogram: each window's buckets collapse into a
    // map (duplicate (win, bucket) keys fail loudly — the input contract
    // is an aggregated histogram) and the complete spine explodes from a
    // literal array with map lookups — no wins×spine self-join against
    // the same lineage (which also trips Spark's conflicting-reference
    // resolution when `hist` arrives from a memory-sink table).
    val perWin = hist.groupBy("win_start").agg(
      map_from_entries(collect_list(struct(col("bucket"), col("n")))).as("__m"),
      sum(col("n")).as("__ta"))
    val refTot = reference.agg(coalesce(sum(col("n_ref")), lit(0L)).as("__tb"))
    perWin
      .select(col("win_start"), col("__m"), col("__ta"),
        explode(array((0L until nBuckets.toLong).map(lit): _*)).as("bucket"))
      .withColumn("n", coalesce(element_at(col("__m"), col("bucket")), lit(0L)))
      .join(broadcast(reference), Seq("bucket"), "left")
      .withColumn("n_ref", coalesce(col("n_ref"), lit(0L)))
      .crossJoin(broadcast(refTot))
      .select(col("win_start"), col("bucket"), col("n"), col("n_ref"),
        when(col("__ta") > 0, expr(s"n * ${scale}L div __ta"))
          .otherwise(lit(0L)).as("share_a"),
        when(col("__tb") > 0, expr(s"n_ref * ${scale}L div __tb"))
          .otherwise(lit(0L)).as("share_b"))
      .withColumn("psi_term",
        (col("share_a") - col("share_b")) *
          (ilog2(col("share_a") + 1) - ilog2(col("share_b") + 1)))
  }
}
