package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical hypothesis testing over grouped counts — the A/B-analysis
  * primitive ("does the outcome mix differ by arm?") the event operators
  * stop short of: [[Events]] measures rates and lags; this says whether
  * an observed difference is bigger than chance.
  *
  * Cross-engine determinism (the q30-cosine discipline, applied to
  * statistics): every INPUT to the statistic is an exactly-aggregated
  * LONG count; the per-cell arithmetic is then ONE fixed IEEE-double op
  * chain — expected = (R·C)/N, term = (O−E)²/E — with no float
  * accumulation across rows (the only sum over floats is the caller's
  * sum of the per-cell MICRO-INTEGER terms). IEEE multiply/divide round
  * deterministically at any magnitude, so both engines produce the same
  * double even when R·C exceeds 2^53, and the floor to micro units
  * makes the output integer-hashable.
  *
  * Scale shape: ONE map-side-combined (group, outcome) count over the
  * corpus; everything after runs on the bounded contingency table
  * (groups × outcomes cells) — marginals are tiny aggs of the cell
  * frame, joined broadcast. Output: one row per cell — (groupCol,
  * outcomeCol, observed, expected_micro, term_micro). χ² in micro units
  * = Σ term_micro; degrees of freedom = (groups−1)·(outcomes−1), both
  * derivable from the frame. */
object Stats {

  def chi2Contingency(df: DataFrame, groupCol: String,
      outcomeCol: String): DataFrame = {
    // NULL arms/outcomes are excluded (they are missing labels, not a
    // category; recode them upstream to test them as one).
    val cells = df
      .filter(col(groupCol).isNotNull && col(outcomeCol).isNotNull)
      .groupBy(col(groupCol), col(outcomeCol))
      .agg(count(lit(1)).as("observed"))
    val rowT = cells.groupBy(groupCol).agg(sum(col("observed")).as("__r"))
    val colT = cells.groupBy(outcomeCol).agg(sum(col("observed")).as("__c"))
    val grand = cells.agg(sum(col("observed")).as("__n"))
    // COMPLETE cell spine: a structural zero — an (arm, outcome)
    // combination that never occurs while both marginals are nonzero —
    // is exactly where the association lives; omitting it (O=0,
    // term=E) would underestimate the statistic on the most
    // significant tables. The outcome set is a bounded closed set by
    // the test's own contract (a χ² over unbounded categories is
    // meaningless), so it becomes a driver literal (guarded) and the
    // spine is a pure explode — no nested-loop join anywhere.
    val outcomes = colT.select(col(outcomeCol)).limit(1001).collect()
      .map(_.get(0))
    require(outcomes.length <= 1000,
      "chi2Contingency: more than 1000 outcome categories — a " +
        "contingency test needs a bounded closed outcome set; bucket the " +
        "outcome column first")
    rowT
      .select(col(groupCol), col("__r"),
        explode(array(outcomes.map(v => lit(v)): _*)).as(outcomeCol))
      .join(cells, Seq(groupCol, outcomeCol), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
      .join(broadcast(colT), Seq(outcomeCol))
      .crossJoin(broadcast(grand))
      // the EXACT op chain the oracle replays: E = (R·C)/N, d = O−E,
      // term = d·d/E, micro = floor(term·1e6)
      .withColumn("__e",
        (col("__r").cast("double") * col("__c").cast("double")) /
          col("__n").cast("double"))
      .withColumn("__d", col("observed").cast("double") - col("__e"))
      .select(col(groupCol), col(outcomeCol), col("observed"),
        floor(col("__e") * lit(1000000.0)).cast("bigint").as("expected_micro"),
        floor(col("__d") * col("__d") / col("__e") * lit(1000000.0))
          .cast("bigint").as("term_micro"))
  }

  /** Per-distinct-value labeled counts — the shared reduction behind the
    * two-sample rank statistics ([[mannWhitney]], [[ksTwoSample]]): one
    * map-side-combined agg collapsing BOTH samples to (value, count_in_a,
    * pooled_count). Whatever the corpus size, everything downstream runs
    * on the distinct-value frame. NULLs are excluded from both samples. */
  private def labeledValueCounts(a: DataFrame, b: DataFrame,
      valueCol: String): DataFrame = {
    val tag = (df: DataFrame, ia: Long) => df
      .filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("__v"), lit(ia).as("__ia"))
    tag(a, 1L).unionByName(tag(b, 0L))
      .groupBy("__v")
      .agg(sum(col("__ia")).as("ca"), count(lit(1)).as("ct"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) for two samples of `valueCol` —
    * the nonparametric "is one distribution stochastically larger?" test
    * (median-shift robust where [[welchT]] assumes means matter). Ranks
    * with tie-averaging are computed WITHOUT a global window: per-value
    * counts + the range-partitioned [[graft.sources.PrefixSum]] give
    * less(v) = pooled count below v, and the doubled rank-sum
    * 2·R_a = Σ_v ca(v)·(2·less(v) + ct(v) + 1) stays on the integer grid
    * (tie-averaged ranks are half-integers, so ×2 is exact).
    *
    * Output (one row): n_a, n_b, u2_a/u2_b (doubled U statistics;
    * U_a + U_b = n_a·n_b so u2_a + u2_b = 2·n_a·n_b), tie_cube =
    * Σ(t³ − t) over tie groups, and the tie-corrected normal
    * approximation z in floored micro units (NULL when the variance is 0
    * — i.e. every value tied). All inputs to the double chain are exact
    * longs; the chain itself is IEEE mul/div/sqrt only (correctly
    * rounded, so cross-engine deterministic — the [[chi2Contingency]]
    * discipline). Exactness headroom: 2·R_a ≤ 2N² and tie_cube ≤ N³
    * must fit a long — exact to N ≈ 2×10⁶ pooled rows in the worst
    * all-tied case, N ≈ 2×10⁹ for continuous-ish values; a rank test
    * over more rows should test a sample, not the corpus. */
  def mannWhitney(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val byV = labeledValueCounts(a, b, valueCol)
    val withLess = graft.sources.PrefixSum.withPrefixSum(
      byV, Seq(col("__v")), "ct", "__lt")
    val g = withLess.agg(
      sum(col("ca")).as("n_a"),
      sum(col("ct") - col("ca")).as("n_b"),
      sum(col("ca") * (lit(2L) * col("__lt") + col("ct") + lit(1L))).as("r2_a"),
      sum(col("ct") * col("ct") * col("ct") - col("ct")).as("tie_cube"))
      .withColumn("u2_a", col("r2_a") - col("n_a") * (col("n_a") + lit(1L)))
    val nd = (c: Column) => c.cast("double")
    val nn = nd(col("n_a") + col("n_b"))
    val varr = nd(col("n_a")) * nd(col("n_b")) / lit(12.0) *
      ((nn + lit(1.0)) - nd(col("tie_cube")) / (nn * (nn - lit(1.0))))
    val z = (nd(col("u2_a")) / lit(2.0) -
      nd(col("n_a")) * nd(col("n_b")) / lit(2.0)) / sqrt(varr)
    g.select(col("n_a"), col("n_b"), col("u2_a"),
      (lit(2L) * col("n_a") * col("n_b") - col("u2_a")).as("u2_b"),
      col("tie_cube"),
      when(varr <= lit(0.0), lit(null))
        .otherwise(floor(z * lit(1000000.0)).cast("bigint")).as("z_micro"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic — the distribution-drift
    * test with NO binning contract (companion to [[Drift.histogramDrift]]
    * whose grid is declared): D = sup_x |F_a(x) − F_b(x)|, computed on
    * the EXACT integer grid |cum_a·n_b − cum_b·n_a| (the common
    * denominator n_a·n_b cleared), so the supremum is an integer max —
    * no float compare picks the winner. Cumulative counts come from two
    * range-partitioned [[graft.sources.PrefixSum]] passes over the
    * distinct-value frame; the arg-sup row is taken with a top-1
    * (TakeOrderedAndProject — a tree-reduced top-k, not a global sort),
    * tie-broken to the smallest attaining value.
    *
    * Output (one row): n_a, n_b, d_num (integer numerator), d_micro =
    * floor(d_num / (n_a·n_b) · 1e6), ks_at (smallest value attaining the
    * supremum). Headroom: cum·n ≤ N² must fit a long — exact to
    * N ≈ 3×10⁹ pooled rows. */
  def ksTwoSample(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val byV = labeledValueCounts(a, b, valueCol)
    // both sample sizes fall out of the two prefix scans' phase-1
    // reductions — no totals frame, no second corpus derivation
    val (s1, nPooled) = graft.sources.PrefixSum
      .withPrefixSumTotal(byV, Seq(col("__v")), "ct", "__lt")
    val (s, nA) = graft.sources.PrefixSum
      .withPrefixSumTotal(s1, Seq(col("__v")), "ca", "__la")
    val nB = nPooled - nA
    val cumA = col("__la") + col("ca")
    val cumB = col("__lt") + col("ct") - cumA
    s.select(col("__v"), abs(cumA * lit(nB) - cumB * lit(nA)).as("d"))
      .orderBy(col("d").desc, col("__v").asc).limit(1)
      .select(lit(nA).as("n_a"), lit(nB).as("n_b"), col("d").as("d_num"),
        floor(col("d").cast("double") /
          (lit(nA).cast("double") * lit(nB).cast("double")) *
          lit(1000000.0)).cast("bigint").as("d_micro"),
        col("__v").as("ks_at"))
  }

  /** Exact trimmed AND winsorized mean on the declared micro grid — the
    * robust location estimate a monitoring pipeline wants when a corpus
    * column has heavy tails the plain mean chases. No sampling, no
    * sketch: per-value counts + ONE range-partitioned
    * [[graft.sources.PrefixSum]] give every value its exact rank
    * interval [less, less+ct); the k lowest / k highest rows
    * (k = floor(n·alpha)) are then dropped (trimmed) or clamped to the
    * boundary order statistics (winsorized) by pure integer arithmetic
    * — kept weight = clamp(min(less+ct, n−k) − max(less, k), 0, ct) —
    * and a SINGLE aggregation produces sums, kept counts, and both
    * boundary values (no second pass over the prefix frame). Output
    * (one row): n, k, lo_micro / hi_micro (the clamp bounds = the
    * alpha / 1−alpha order statistics), trimmed_mean_micro,
    * winsor_mean_micro. Headroom: Σ|m|·ct and k·|m| must fit a long —
    * the [[welchT]] Σm contract. */
  def robustMean(df: DataFrame, valueCol: String, alpha: Double,
      scale: Long = 1000000L): DataFrame = {
    require(alpha >= 0.0 && alpha < 0.5,
      s"robustMean: alpha must be in [0, 0.5), got $alpha")
    require(scale >= 1000, s"robustMean: scale too coarse, got $scale")
    val byV = df.filter(col(valueCol).isNotNull)
      .select(floor(col(valueCol) * lit(scale.toDouble)).cast("bigint").as("__m"))
      .groupBy("__m").agg(count(lit(1)).as("ct"))
    // n and k come EAGERLY from the prefix scan's phase-1 reduction —
    // as literals, not a totals frame: a totals aggregation would
    // re-scan the corpus (no exchange reuse across the RDD bridge).
    // floor(n·alpha) is the same IEEE chain the oracle runs in SQL.
    val (pre, n) = graft.sources.PrefixSum
      .withPrefixSumTotal(byV, Seq(col("__m")), "ct", "__less")
    val k = math.floor(n.toDouble * alpha).toLong
    val kept = pre.withColumn("__w", greatest(
      least(col("__less") + col("ct"), lit(n - k)) -
        greatest(col("__less"), lit(k)), lit(0L)))
    val g = kept.agg(
      sum(col("__m") * col("__w")).as("__tsum"),
      sum(col("__w")).as("__tcnt"),
      max(when(col("__less") <= lit(k) &&
        lit(k) < col("__less") + col("ct"), col("__m"))).as("lo_micro"),
      max(when(col("__less") <= lit(n - k - 1) &&
        lit(n - k - 1) < col("__less") + col("ct"),
        col("__m"))).as("hi_micro"))
    g.select(lit(n).as("n"), lit(k).as("k"), col("lo_micro"), col("hi_micro"),
      floor(col("__tsum").cast("double") / col("__tcnt").cast("double"))
        .cast("bigint").as("trimmed_mean_micro"),
      floor((col("__tsum") + lit(k) * col("lo_micro") +
        lit(k) * col("hi_micro")).cast("double") / lit(n).cast("double"))
        .cast("bigint").as("winsor_mean_micro"))
  }

  /** floor(log10(1 + 1/d)·1e6) for d = 1..9 — the Benford expected
    * first-digit shares on the micro grid. Computed ONCE here and
    * interpolated as literals into both engines' plans (java.lang.Math
    * log10 is deterministic per process but not correctly-rounded, so
    * it must never run inside either engine). */
  val benfordExpectedMicro: Seq[Long] =
    (1 to 9).map(d => math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong)

  /** Benford first-digit screen — the forensic data-quality card for a
    * positive amount column (fabricated or capped values flunk it; real
    * multiplicative data follows log10(1+1/d)). The first digit is
    * extracted WITHOUT engine logs: amount → integer cents
    * (floor(v·100), so v ≥ 0.01 is the domain; smaller/nonpositive rows
    * are excluded), then the first character of the exact integer
    * decimal rendering — both engines print integers identically.
    * Output: one row per digit 1..9 (complete spine) — (digit,
    * observed, share_micro = observed·1e6 div n, expected_micro literal,
    * dev_micro = |share − expected|); Σ dev_micro is the screen
    * statistic (2× total-variation distance in micro units). */
  def benfordCard(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val h = df.filter(col(valueCol) >= 0.01)
      .select(substring(floor(col(valueCol) * lit(100.0)).cast("bigint")
        .cast("string"), 1, 1).cast("bigint").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("observed"))
    val tot = h.agg(sum(col("observed")).as("__n"))
    val spine = benfordExpectedMicro.zipWithIndex
      .map { case (e, i) => (i + 1L, e) }.toDF("digit", "expected_micro")
    spine.join(h, Seq("digit"), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("share_micro", expr("observed * 1000000L div __n"))
      .select(col("digit"), col("observed"), col("share_micro"),
        col("expected_micro"),
        abs(col("share_micro") - col("expected_micro")).as("dev_micro"))
  }

  /** CUPED variance reduction (Controlled-experiment Using Pre-Existing
    * Data) — the A/B-analysis workhorse that shrinks metric variance by
    * regressing out a pre-period covariate: Y′ = Y − θ(X − X̄) with
    * θ = cov(X,Y)/var(X) fitted on the POOLED population (arm-blind, so
    * the adjustment is unbiased under randomization). Input is the
    * per-subject frame — one row per randomization unit with LONG
    * micro-grid metric `yCol` and covariate `xCol` (build them with
    * exact integer per-subject sums; this operator never sees raw
    * floats). All moments are exact (counts/sums as long, cross
    * products in DECIMAL(38,0) — long Σxy would wrap at corpus scale);
    * θ, adjusted means, and the variance-reduction ratio
    * ρ² = cov²/(var·var) are each one IEEE chain over those sums.
    * Output: one row per arm — (arm, n, mean_y_micro, mean_adj_micro,
    * theta_micro, var_reduction_ppm); the last three are NULL when
    * var(X) (resp. var(Y)) is zero. Scale shape: one map-side-combined
    * pooled agg + one per-arm agg, pooled broadcast onto the arm
    * frame. */
  def cuped(perSubject: DataFrame, armCol: String, xCol: String,
      yCol: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    Seq(xCol, yCol).foreach { c =>
      require(perSubject.schema(c).dataType == LongType,
        s"cuped: $c must be a bigint micro-grid column, got " +
          perSubject.schema(c).dataType)
    }
    val dec = (c: Column) => c.cast(DecimalType(19, 0))
    val x = col(xCol); val y = col(yCol)
    val pool = perSubject.agg(
      count(lit(1)).as("__n"), sum(x).as("__sx"), sum(y).as("__sy"),
      sum((dec(x) * y).cast(DecimalType(38, 0))).as("__sxy"),
      sum((dec(x) * x).cast(DecimalType(38, 0))).as("__sxx"),
      sum((dec(y) * y).cast(DecimalType(38, 0))).as("__syy"))
    val byArm = perSubject.groupBy(col(armCol))
      .agg(count(lit(1)).as("n"), sum(x).as("__sxg"), sum(y).as("__syg"))
    val nd = (c: Column) => c.cast("double")
    val covn = nd(col("__n")) * nd(col("__sxy")) - nd(col("__sx")) * nd(col("__sy"))
    val varxn = nd(col("__n")) * nd(col("__sxx")) - nd(col("__sx")) * nd(col("__sx"))
    val varyn = nd(col("__n")) * nd(col("__syy")) - nd(col("__sy")) * nd(col("__sy"))
    val meanAdj = nd(col("__syg")) / nd(col("n")) -
      covn / varxn * (nd(col("__sxg")) / nd(col("n")) - nd(col("__sx")) / nd(col("__n")))
    byArm.crossJoin(broadcast(pool))
      .select(col(armCol), col("n"),
        floor(nd(col("__syg")) / nd(col("n"))).cast("bigint").as("mean_y_micro"),
        when(varxn <= lit(0.0), lit(null))
          .otherwise(floor(meanAdj).cast("bigint")).as("mean_adj_micro"),
        when(varxn <= lit(0.0), lit(null))
          .otherwise(floor(covn / varxn * lit(1000000.0)).cast("bigint"))
          .as("theta_micro"),
        when(varxn <= lit(0.0) || varyn <= lit(0.0), lit(null))
          .otherwise(floor(covn * covn / (varxn * varyn) * lit(1000000.0))
            .cast("bigint")).as("var_reduction_ppm"))
  }

  /** Cumulative Poisson(1) thresholds on the 60-bit hash grid
    * [0, 2⁶⁰): replicate weight w = k iff hash ∈ [t_{k−1}, t_k), capped
    * at 6 (P(X>6) ≈ 8×10⁻⁵ — the standard truncation). Driver-side
    * doubles become SHARED integer literals in both engines, so exp()
    * never runs in-engine. */
  private[graft] val poissonThresholds: Seq[Long] = {
    val e = math.exp(-1.0)
    var fact = 1.0; var cum = 0.0
    (0 to 5).map { k =>
      if (k > 0) fact *= k
      cum += e / fact
      math.floor(cum * 1152921504606846976.0).toLong // × 2^60
    }
  }

  /** Poisson bootstrap — the DISTRIBUTED bootstrap: instead of the
    * unshardable n-out-of-n multinomial resample, every row enters
    * replicate b with an independent Poisson(1) weight, which partial
    * aggregation reduces map-side (the shuffle carries `replicates` rows
    * per task, whatever the corpus). Randomness is the engine's stable
    * kind — [[graft.functions.Stable.seededHash]] of (key, replicate),
    * uniform on [0, 2⁶⁰) — so weights are deterministic under retries,
    * speculation and repartitioning, and bit-equal in the oracle. (The
    * cheap [[graft.functions.Stable.familyHash]] is deliberately NOT
    * used: its 31-bit constants are fine for MinHash minima but not
    * uniform enough on the full range for inverse-CDF sampling.) Weight
    * selection is pure integer compares against [[poissonThresholds]].
    *
    * Output: one row per replicate — (b, n_b, mean_micro) on the
    * declared micro grid — the bootstrap distribution of the mean;
    * percentiles of it are the CI (client-side: `replicates` rows).
    * Headroom: Σw·|m| ≤ 6·N·|m| — the [[welchT]] Σm contract. CPU is
    * ⌈replicates/2⌉ md5s per row: one digest is 128 bits and a draw
    * needs 60, so replicates 2q and 2q+1 take DISJOINT 60-bit halves of
    * digest(seed, key, q) ([[graft.functions.Stable.seededDigest]] —
    * same random-oracle assumption, half the md5 cost; measured 1.9×
    * on the q207 card at sf0.1). At corpus scale bound the remaining
    * cost with a pre-sampled frame or fewer replicates.
    *
    * CONTRACT: `keyCol` must be row-unique among non-null-value rows —
    * the draw for row r in replicate b is hash(seed, key(r), b), so two
    * rows sharing a key get IDENTICAL weights in every replicate,
    * silently correlating their draws and biasing every replicate
    * statistic while staying deterministic and oracle-consistent (the
    * one failure class the oracle can't catch). Enforced IN-PLAN (the
    * occupancy-guard discipline — until r14 this was an eager `.head()`
    * probe, the engine's only DataFrame-builder that ran a job at
    * construction time): a one-row guard agg distinguishing NULL keys
    * (rejected by name — countDistinct alone would blame "duplicates")
    * from genuine duplicates broadcast-joins into the replicate output,
    * and every output row re-checks it through `raise_error` — one
    * extra scan at EXECUTION time, negligible next to `replicates` md5s
    * per row, and the builder stays lazy like everything else. */
  def poissonBootstrap(df: DataFrame, keyCol: Column, valueCol: String,
      replicates: Int = 100, seed: Long = 1L,
      scale: Long = 1000000L): DataFrame = {
    require(replicates >= 2 && replicates <= 10000,
      s"poissonBootstrap: replicates must be in [2, 10000], got $replicates")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = (replicates + 1) / 2
    val spine = (0L until pairs.toLong).toDF("q")
    val t = poissonThresholds
    val rows = df.filter(col(valueCol).isNotNull)
      .select(keyCol.as("__k"),
        floor(col(valueCol) * lit(scale.toDouble)).cast("bigint").as("__m"))
    // countDistinct excludes NULLs, so count the NULL keys separately:
    // a NULL key must be rejected by name, not blamed on "duplicates".
    val guard = rows.agg(count(lit(1)).as("__gn"),
      countDistinct(col("__k")).as("__gnd"),
      count(when(col("__k").isNull, 1)).as("__gnn"))
    import graft.functions.Stable
    def wOf(h: Column): Column = when(h < t(0), lit(0L)).when(h < t(1), lit(1L))
      .when(h < t(2), lit(2L)).when(h < t(3), lit(3L))
      .when(h < t(4), lit(4L)).when(h < t(5), lit(5L)).otherwise(lit(6L))
    // One NATIVE pair expression per (row, q) — digest bytes straight to
    // two longs (Hash64PairExpr). __hp aliased in its own projection:
    // CollapseProject never inlines a non-cheap alias referenced twice.
    // Both replicates of a pair aggregate IN THE SAME GROUP (by q, with
    // separate lo/hi sums), so the big frame is never doubled by an
    // explode — the pair splits into rows 2q/2q+1 only on the
    // `pairs`-row aggregate output.
    rows.crossJoin(broadcast(spine))
      .select(col("__m"), col("q"),
        Stable.seededHashPair(seed, col("__k"), col("q")).as("__hp"))
      .select(col("__m"), col("q"),
        wOf(col("__hp").getItem(0)).as("__wl"),
        wOf(col("__hp").getItem(1)).as("__wh"))
      .groupBy(col("q"))
      .agg(sum(col("__wl")).as("__nl"), sum(col("__wl") * col("__m")).as("__sl"),
        sum(col("__wh")).as("__nh"), sum(col("__wh") * col("__m")).as("__sh"))
      .select(explode(array(
        struct((col("q") * 2).as("b"), col("__nl").as("n_b"), col("__sl").as("__s")),
        struct((col("q") * 2 + 1).as("b"), col("__nh").as("n_b"), col("__sh").as("__s"))))
        .as("s"))
      .filter(col("s.b") < replicates) // odd replicate counts drop the last hi draw
      .crossJoin(broadcast(guard))
      .select(
        when(col("__gnn") > 0, raise_error(concat(
          lit("poissonBootstrap: keyCol has "), col("__gnn").cast("string"),
          lit(" NULL key(s) — the per-row draw is hash(seed, key, b), so " +
            "NULL keys cannot get independent weights; supply a non-null " +
            "row-unique key"))))
          .when(col("__gn") =!= col("__gnd"), raise_error(concat(
            lit("poissonBootstrap: keyCol must be row-unique — got "),
            col("__gn").cast("string"), lit(" rows but only "),
            col("__gnd").cast("string"),
            lit(" distinct keys; duplicate keys give identical " +
              "per-replicate weights to all rows sharing the key, " +
              "correlating draws and biasing the bootstrap distribution"))))
          .otherwise(col("s.b")).as("b"),
        col("s.n_b").as("n_b"),
        when(col("s.n_b") <= 0L, lit(null)).otherwise(
          floor(col("s.__s").cast("double") / col("s.n_b").cast("double"))
            .cast("bigint")).as("mean_micro"))
  }

  /** Group-sequential interim monitoring — the "can we stop the
    * experiment yet?" trajectory that completes the A/B kit (fixed-
    * horizon tests, CIs and CUPED say what happened at the END; interim
    * peeking without a corrected boundary is how false positives ship).
    * For every day on which the experiment's state changed, the card
    * reports cumulative per-arm enrollment and conversion, the pooled
    * two-proportion z, the information fraction, and an O'Brien–
    * Fleming-SHAPED boundary z·(1/√frac) (z is the [[z975]]-style
    * literal — conservative early, nominal at full information; exact
    * alpha-spending needs iterated normal integrals, which belong in
    * the analysis notebook, not the engine; the SHAPE is what makes
    * early peeks safe-by-default).
    *
    * Scale shape: per-subject first-enroll/first-convert days arrive
    * pre-reduced (one map-side agg in the caller); deltas collapse to
    * the bounded (arm × day) frame; cumulatives are a window
    * PARTITIONED by arm over that bounded frame; the grand enrollment
    * rides in broadcast. Exactly two arm values, enforced. Output per
    * day: (day, n_a, x_a, n_b, x_b, frac_ppm, z_micro, bound_micro,
    * crossed) — arm "a" is the smaller arm value; z NULL (crossed 0)
    * while either arm is empty or the pooled rate is degenerate. */
  def sequentialMonitor(perSubject: DataFrame, armCol: String,
      enrollDayCol: String, convertDayCol: String,
      z: Double = z975): DataFrame = {
    val spark = perSubject.sparkSession
    import spark.implicits._
    // Integral contract enforced up front: a string/double arm column
    // would otherwise surface as an opaque ClassCastException from the
    // driver-side getLong below (ADVICE r9); the bigint cast also keeps
    // the spine join key type-aligned for byte/short/int arm columns.
    val armType = perSubject.schema(armCol).dataType
    require(Seq("tinyint", "smallint", "int", "bigint").contains(armType.simpleString),
      s"sequentialMonitor: arm column '$armCol' must be an integral type, " +
        s"got ${armType.simpleString}")
    val arms = perSubject.select(col(armCol).cast("bigint")).distinct().limit(3)
      .collect().map(_.getLong(0)).sorted
    require(arms.length == 2,
      s"sequentialMonitor: need exactly 2 arms, got ${arms.mkString(",")}")
    val dn = perSubject.groupBy(col(armCol).as("__arm"),
      col(enrollDayCol).as("day")).agg(count(lit(1)).as("__dn"))
    val dx = perSubject.filter(col(convertDayCol).isNotNull)
      .groupBy(col(armCol).as("__arm"), col(convertDayCol).as("day"))
      .agg(count(lit(1)).as("__dx"))
    val days = dn.select(col("day")).unionByName(dx.select(col("day"))).distinct()
    val spine = days.crossJoin(
      broadcast(arms.toSeq.toDF("__arm")))
    val de = spine
      .join(dn, Seq("__arm", "day"), "left")
      .join(dx, Seq("__arm", "day"), "left")
      .select(col("__arm"), col("day"),
        coalesce(col("__dn"), lit(0L)).as("__dn"),
        coalesce(col("__dx"), lit(0L)).as("__dx"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__arm").orderBy("day")
    val cum = de.select(col("__arm"), col("day"),
      sum(col("__dn")).over(w).as("__cn"), sum(col("__dx")).over(w).as("__cx"))
    val tot = de.agg(sum(col("__dn")).as("__nt"))
    val byDay = cum.groupBy("day").agg(
      max(when(col("__arm") === arms(0), col("__cn"))).as("n_a"),
      max(when(col("__arm") === arms(0), col("__cx"))).as("x_a"),
      max(when(col("__arm") === arms(1), col("__cn"))).as("n_b"),
      max(when(col("__arm") === arms(1), col("__cx"))).as("x_b"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .crossJoin(broadcast(tot))
    val nd = (c: Column) => c.cast("double")
    val pp = nd(col("x_a") + col("x_b")) / nd(col("n_a") + col("n_b"))
    val frac = nd(col("n_a") + col("n_b")) / nd(col("__nt"))
    val zc = (nd(col("x_a")) / nd(col("n_a")) - nd(col("x_b")) / nd(col("n_b"))) /
      sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / nd(col("n_a")) + lit(1.0) / nd(col("n_b"))))
    val bound = lit(z) / sqrt(frac)
    val degenerate = pp <= lit(0.0) || pp >= lit(1.0)
    byDay.select(col("day"), col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      floor(frac * lit(1000000.0)).cast("bigint").as("frac_ppm"),
      when(degenerate, lit(null))
        .otherwise(floor(zc * lit(1000000.0)).cast("bigint")).as("z_micro"),
      floor(bound * lit(1000000.0)).cast("bigint").as("bound_micro"),
      when(degenerate, lit(0L))
        .otherwise((abs(zc) >= bound).cast("bigint")).as("crossed"))
  }

  /** Pairwise Pearson correlation matrix over numeric columns — the
    * dataset-profiling card (pandas `df.corr()`) done the engine's way:
    * values land once on the declared micro grid, then ONE map-side-
    * combined aggregation produces every moment — n, k column sums
    * (LONG), and k(k+1)/2 cross-products in DECIMAL(38,0) (a long Σxy
    * wraps at corpus scale) — and each pair's r is one IEEE
    * mul/div/sqrt chain over those exact sums, floored to micro units.
    * Rows with a NULL in ANY profiled column are dropped (listwise
    * completion: every pair sees the same n, so the matrix is positive
    * semidefinite-consistent; run twice on column subsets if pairwise
    * deletion is wanted). The pair fan-out is a literal-struct explode
    * of the single aggregate row — no join, no second pass. Output: one
    * row per unordered pair — (col_a, col_b, n, r_micro); r_micro NULL
    * when either variance is 0. Guarded to ≤ 16 columns (the agg width
    * is quadratic — a profiling card, not a feature pipeline). */
  def correlationMatrix(df: DataFrame, cols: Seq[String],
      scale: Long = 1000000L): DataFrame = {
    require(cols.size >= 2 && cols.size <= 16,
      s"correlationMatrix: need 2..16 columns, got ${cols.size}")
    require(scale >= 1000, s"correlationMatrix: scale too coarse, got $scale")
    val k = cols.size
    val complete = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .select(cols.zipWithIndex.map { case (c, i) =>
        floor(col(c) * lit(scale.toDouble)).cast("bigint").as(s"__m$i")
      }: _*)
    val aggs =
      Seq(count(lit(1)).as("__n")) ++
        (0 until k).map(i => sum(col(s"__m$i")).as(s"__s$i")) ++
        (for (i <- 0 until k; j <- i until k) yield
          sum((col(s"__m$i").cast(DecimalType(19, 0)) * col(s"__m$j"))
            .cast(DecimalType(38, 0))).as(s"__p${i}_$j"))
    val g = complete.agg(aggs.head, aggs.tail: _*)
    val nd = (c: Column) => c.cast("double")
    val pairs = for (i <- 0 until k; j <- (i + 1) until k) yield {
      val covn = nd(col("__n")) * nd(col(s"__p${i}_$j")) -
        nd(col(s"__s$i")) * nd(col(s"__s$j"))
      val vin = nd(col("__n")) * nd(col(s"__p${i}_$i")) -
        nd(col(s"__s$i")) * nd(col(s"__s$i"))
      val vjn = nd(col("__n")) * nd(col(s"__p${j}_$j")) -
        nd(col(s"__s$j")) * nd(col(s"__s$j"))
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        col("__n").as("n"),
        when(vin <= lit(0.0) || vjn <= lit(0.0), lit(null))
          .otherwise(floor(covn / sqrt(vin * vjn) * lit(1000000.0))
            .cast("bigint")).as("r_micro"))
    }
    g.select(explode(array(pairs: _*)).as("__pair"))
      .select(col("__pair.col_a").as("col_a"), col("__pair.col_b").as("col_b"),
        col("__pair.n").as("n"), col("__pair.r_micro").as("r_micro"))
  }

  /** z for the two-sided 95% interval — a DRIVER-SIDE literal (the
    * inverse normal CDF never runs in-engine); Double.toString
    * round-trips, so the interpolated oracle literal is the same
    * double. */
  val z975: Double = 1.959963984540054

  /** Wilson score interval per group — the conversion-rate card with
    * honest uncertainty (the Wald interval collapses at p near 0/1 and
    * small n; Wilson stays inside [0,1] and is the standard A/B
    * reporting choice). Inputs are exact LONG counts from one map-side
    * agg of a boolean success column; center and half-width are each
    * one IEEE mul/div/sqrt chain (correctly-rounded ops only — z is the
    * [[z975]] literal, or caller-supplied). Output: one row per group —
    * (group, n, successes, rate_ppm, lo_ppm, hi_ppm), ppm-floored;
    * NULL bounds when n = 0 is impossible by construction (a group
    * exists only with rows). */
  def proportionCI(df: DataFrame, groupCol: String, successCol: Column,
      z: Double = z975): DataFrame = {
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(successCol, lit(1L)).otherwise(lit(0L))).as("successes"))
    val nd = (c: Column) => c.cast("double")
    val zc = lit(z); val z2 = zc * zc
    val ph = nd(col("successes")) / nd(col("n"))
    val denom = lit(1.0) + z2 / nd(col("n"))
    val center = (ph + z2 / (lit(2.0) * nd(col("n")))) / denom
    val half = zc * sqrt(ph * (lit(1.0) - ph) / nd(col("n")) +
      z2 / (lit(4.0) * nd(col("n")) * nd(col("n")))) / denom
    g.select(col(groupCol), col("n"), col("successes"),
      floor(ph * lit(1000000.0)).cast("bigint").as("rate_ppm"),
      floor((center - half) * lit(1000000.0)).cast("bigint").as("lo_ppm"),
      floor((center + half) * lit(1000000.0)).cast("bigint").as("hi_ppm"))
  }

  /** Welch's unequal-variance t-test on the declared micro grid — "do
    * the means differ?" for two samples of `valueCol`. The engine's
    * quantization discipline makes it cross-engine exact: each value is
    * floored ONCE onto the integer grid m = floor(v·scale), then the
    * only sums are exact integer/decimal moments (Σm as long, Σm² as
    * DECIMAL(38,0) — a long Σm² would wrap silently at corpus scale);
    * mean, variance, t and the Welch–Satterthwaite df are each ONE IEEE
    * mul/div/sqrt chain over those exact sums, no float accumulation
    * anywhere. Output (one row): n_a, n_b, mean_a_micro, mean_b_micro,
    * t_micro, df_micro (t/df floored ×1e6; NULL when either side has
    * n < 2 or both variances are 0). Headroom: |v·scale| ≲ 3×10⁹ keeps
    * Σm exact to ~10⁹ rows; Σm² in DECIMAL(38,0) is effectively
    * unbounded. */
  def welchT(a: DataFrame, b: DataFrame, valueCol: String,
      scale: Long = 1000000L): DataFrame = {
    require(scale >= 1000, s"welchT: scale too coarse, got $scale")
    def moments(df: DataFrame, sfx: String): DataFrame = {
      val m = floor(col(valueCol) * lit(scale.toDouble)).cast("bigint")
      df.filter(col(valueCol).isNotNull)
        .select(m.as("__m"))
        .agg(count(lit(1)).as(s"n_$sfx"), sum(col("__m")).as(s"s1_$sfx"),
          sum((col("__m").cast(DecimalType(19, 0)) * col("__m"))
            .cast(DecimalType(38, 0))).as(s"s2_$sfx"))
    }
    val nd = (c: Column) => c.cast("double")
    def se(sfx: String): Column =
      (nd(col(s"s2_$sfx")) - nd(col(s"s1_$sfx")) * nd(col(s"s1_$sfx")) /
        nd(col(s"n_$sfx"))) / (nd(col(s"n_$sfx")) - lit(1.0)) / nd(col(s"n_$sfx"))
    val (sea, seb) = (se("a"), se("b"))
    val meanDiff = nd(col("s1_a")) / nd(col("n_a")) -
      nd(col("s1_b")) / nd(col("n_b"))
    val dfW = (sea + seb) * (sea + seb) /
      (sea * sea / (nd(col("n_a")) - lit(1.0)) +
        seb * seb / (nd(col("n_b")) - lit(1.0)))
    val bad = col("n_a") < 2 || col("n_b") < 2 || (sea + seb) <= lit(0.0)
    moments(a, "a").crossJoin(broadcast(moments(b, "b")))
      .select(col("n_a"), col("n_b"),
        floor(nd(col("s1_a")) / nd(col("n_a"))).cast("bigint").as("mean_a_micro"),
        floor(nd(col("s1_b")) / nd(col("n_b"))).cast("bigint").as("mean_b_micro"),
        when(bad, lit(null)).otherwise(
          floor(meanDiff / sqrt(sea + seb) * lit(1000000.0)).cast("bigint"))
          .as("t_micro"),
        when(bad, lit(null)).otherwise(
          floor(dfW * lit(1000000.0)).cast("bigint")).as("df_micro"))
  }
}
