package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.TopK

/** Relational operator surface (SURVEY.md §2.6): scans, projection, filter,
  * joins (broadcast/shuffle/semi/anti), aggregation, window functions,
  * sort/limit/top-k, set ops, rollup, scalar functions.
  *
  * fuel has no joins/aggregations (reference: SURVEY §2.6); these expose the
  * Catalyst built-ins as the engine's query surface. Every query is written
  * scale-first: dimension joins carry `broadcast` hints, aggregates are
  * partial-aggregable, and all money arithmetic runs in DECIMAL so results
  * are exact and order-independent (a distributed sum of doubles is not
  * bit-stable; a decimal sum is), then casts to double only at the output
  * edge — deterministic IEEE nearest in every engine.
  */
object Relational {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val Dec = "decimal(18,2)"
  /** Exact revenue: decimal(37,4), no double rounding anywhere. */
  private def revenueDec: Column =
    col("l_extendedprice").cast(Dec) * (lit(1).cast(Dec) - col("l_discount").cast(Dec))
  private val DuckRevenue =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Declarative data-quality verification ([[graft.operators.Checks]]):
    // the Deequ-class constraint suite an ingest gate runs — all
    // row-level checks in ONE scan+agg pass, uniqueness in agg form,
    // referential integrity as a keys-only anti-join. Checks chosen so
    // both outcomes are load-bearing: three violated (range cuts inside
    // the data, R return flag, non-unique order key) and five clean.
    "q197_quality_checks" -> ((s, dir) => {
      import graft.operators.Checks._
      graft.operators.Checks.run(t(s, dir, "lineitem"), Seq(
        NotNull("l_orderkey"),
        InRange("l_quantity", 1, 30),
        InRange("l_discount", 0.0, 0.05),
        AcceptedValues("l_returnflag", Seq("A", "N")),
        MatchesRegex("l_linestatus", "[OF]"),
        Unique(Seq("l_orderkey", "l_linenumber")),
        Unique(Seq("l_orderkey")),
        RefIntegrity("l_orderkey", t(s, dir, "orders"), "o_orderkey"),
        MinRows(1000)))
    }),

    // Chi-square contingency test ([[graft.operators.Stats
    // .chi2Contingency]]): does the event-type mix differ across three
    // synthetic user arms? Exact long counts in, one fixed IEEE op
    // chain per cell, micro-integer terms out.
    "q199_chi2_mix" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(
        concat(lit("arm"), (col("user_id") % 3).cast("string")).as("arm"),
        col("event_type"))
      graft.operators.Stats.chi2Contingency(ev, "arm", "event_type")
    }),

    // Mann–Whitney rank-sum ([[graft.operators.Stats.mannWhitney]]): are
    // purchase values stochastically larger than view values? Ranks via
    // per-value counts + range-partitioned prefix sum; doubled-U integer
    // grid; tie-corrected z in one IEEE chain.
    "q200_rank_shift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.Stats.mannWhitney(
        ev.filter(col("event_type") === "purchase").select("value"),
        ev.filter(col("event_type") === "view").select("value"), "value")
    }),

    // Two-sample KS ([[graft.operators.Stats.ksTwoSample]]): largest CDF
    // gap between purchase and view values on the exact integer
    // numerator grid, arg-sup tie-broken to the smallest value.
    "q201_ks_drift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.Stats.ksTwoSample(
        ev.filter(col("event_type") === "purchase").select("value"),
        ev.filter(col("event_type") === "view").select("value"), "value")
    }),

    // Welch unequal-variance t ([[graft.operators.Stats.welchT]]): do
    // purchase and view value MEANS differ? Exact integer/decimal
    // moments on the declared micro grid, one IEEE chain for t and the
    // Welch–Satterthwaite df.
    "q202_welch_means" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.Stats.welchT(
        ev.filter(col("event_type") === "purchase").select("value"),
        ev.filter(col("event_type") === "view").select("value"), "value")
    }),

    // Nelson–Aalen time-to-first-purchase ([[graft.operators.Survival
    // .hazardCurve]]): hour-grid durations, right-censored at the
    // declared study end; integer-micro hazards so the cumulative is
    // exact; risk set and cumulative via prefix sums, no global window.
    "q203_retention_hazard" -> ((s, dir) =>
      graft.operators.Survival.hazardCurve(
        t(s, dir, "events"), "user_id", "ts",
        col("event_type") === "purchase", "2024-01-03 00:00:00")),

    // Exact 5%-trimmed and winsorized mean ([[graft.operators.Stats
    // .robustMean]]): order statistics from per-value counts + prefix
    // sum, integer clamp weights, one aggregation — no global window,
    // no sketch.
    "q204_robust_mean" -> ((s, dir) =>
      graft.operators.Stats.robustMean(
        t(s, dir, "events").select("value"), "value", alpha = 0.05)),

    // Benford first-digit screen ([[graft.operators.Stats.benfordCard]])
    // on order totals: integer-cents first digit, literal expected
    // shares (log10 never runs in-engine), complete 1..9 spine.
    "q205_benford_price" -> ((s, dir) =>
      graft.operators.Stats.benfordCard(
        t(s, dir, "orders").select("o_totalprice"), "o_totalprice")),

    // CUPED adjusted means ([[graft.operators.Stats.cuped]]): per-user
    // post-period purchase value adjusted by pre-period activity, θ fit
    // arm-blind on the pooled population; exact integer/decimal moments
    // in, one IEEE chain per output.
    "q206_cuped_adjust" -> ((s, dir) => {
      val cut = lit("2024-01-15 00:00:00").cast("timestamp")
      val m = floor(col("value") * lit(1000000.0)).cast("bigint")
      val perUser = t(s, dir, "events")
        .filter(col("value").isNotNull)
        .groupBy((col("user_id") % 2).as("arm"), col("user_id"))
        .agg(coalesce(sum(when(col("ts") < cut, m)), lit(0L)).as("x"),
          coalesce(sum(when(col("ts") >= cut &&
            col("event_type") === "purchase", m)), lit(0L)).as("y"))
      graft.operators.Stats.cuped(perUser, "arm", "x", "y")
    }),

    // Poisson bootstrap ([[graft.operators.Stats.poissonBootstrap]]):
    // the distribution of the mean purchase/view value under 100
    // hash-deterministic Poisson(1) resamples — the distributed
    // bootstrap (no n-out-of-n multinomial), map-side-combined to 100
    // output rows.
    "q207_bootstrap_ci" -> ((s, dir) =>
      graft.operators.Stats.poissonBootstrap(
        t(s, dir, "events").select("event_id", "value"),
        col("event_id"), "value", replicates = 100, seed = 1L)),

    // Group-sequential monitoring ([[graft.operators.Stats
    // .sequentialMonitor]]): daily cumulative two-proportion z against
    // the OBF-shaped boundary — the interim-peeking card over the same
    // arms/conversion definition as q208.
    "q214_sequential_monitor" -> ((s, dir) => {
      val day = expr("unix_micros(ts) div 86400000000")
      val perUser = t(s, dir, "events")
        .groupBy((col("user_id") % 2).as("arm"), col("user_id"))
        .agg(min(day).as("fs"),
          min(when(col("event_type") === "purchase", day)).as("fp"))
      graft.operators.Stats.sequentialMonitor(perUser, "arm", "fs", "fp")
    }),

    // The experimentation kit composed END-TO-END as one readout — the
    // q59→q73 composition pattern applied to the stats tier: hashed
    // assignment ([[graft.sources.SplitSource.assignSplit]], the
    // production randomizer, not a modulo) → CUPED adjusted means
    // ([[graft.operators.Stats.cuped]]) → Wilson conversion CI
    // ([[graft.operators.Stats.proportionCI]]) → the group-sequential
    // monitor's FINAL-day state ([[graft.operators.Stats
    // .sequentialMonitor]]). One per-user collapse (a single map-side
    // agg over the corpus) carries every per-subject fact — pre-period
    // activity x, post-period purchase value y, first enrollment day,
    // first QUALIFYING conversion day (purchase ≥ 200, so the rate is
    // non-degenerate) — then is persisted once for its three analysis
    // consumers, each of which reduces to an arm-bounded frame before
    // the final broadcast joins. Output: one row per arm with the full
    // card (CUPED means/θ/ρ², Wilson bounds, monitor end state).
    "q216_experiment_readout" -> ((s, dir) => {
      val cut = lit("2024-01-15 00:00:00").cast("timestamp")
      val m = floor(col("value") * lit(1000000.0)).cast("bigint")
      val day = expr("unix_micros(ts) div 86400000000")
      val perUser = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          coalesce(sum(when(col("ts") < cut, m)), lit(0L)).as("x"),
          coalesce(sum(when(col("ts") >= cut &&
            col("event_type") === "purchase", m)), lit(0L)).as("y"),
          min(day).as("fs"),
          min(when(col("event_type") === "purchase" && col("value") >= 200, day))
            .as("fp"))
      val assigned = graft.sources.SplitSource.assignSplit(
          perUser, col("user_id"), seed = 216,
          weights = Seq("control" -> 0.5, "treatment" -> 0.5))
        .withColumn("arm", when(col("split") === "treatment", 1L).otherwise(0L))
        .persist()
      val cupedCard = graft.operators.Stats.cuped(assigned, "arm", "x", "y")
      val wilson = graft.operators.Stats
        .proportionCI(assigned, "arm", col("fp").isNotNull).drop("n")
      val monitorFinal = graft.operators.Stats
        .sequentialMonitor(assigned, "arm", "fs", "fp")
        .orderBy(col("day").desc).limit(1)
        .select(col("day").as("final_day"), col("z_micro"),
          col("bound_micro"), col("crossed"))
      cupedCard.join(wilson, Seq("arm"))
        .crossJoin(broadcast(monitorFinal))
    }),

    // Column correlation matrix ([[graft.operators.Stats
    // .correlationMatrix]]): the pandas df.corr() profiling card over
    // lineitem's numerics — one aggregation pass for all pairs, exact
    // micro-grid moments, one IEEE chain per r.
    "q213_corr_matrix" -> ((s, dir) =>
      graft.operators.Stats.correlationMatrix(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),

    // Privacy release audit ([[graft.operators.Privacy
    // .anonymityAudit]]): k-anonymity + l-diversity over the
    // (nation, segment) quasi-identifiers with the balance bucket as
    // the sensitive attribute — one pass, all integers.
    "q212_anonymity_audit" -> ((s, dir) =>
      graft.operators.Privacy.anonymityAudit(
        t(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"),
        floor(col("c_acctbal") / lit(2000.0)).cast("bigint"),
        k = 3, l = 2)),

    // Windowed drift monitor ([[graft.streaming.Streaming
    // .windowedHistogram]] + [[graft.operators.Drift
    // .driftFromHistograms]]): per-day PSI of the value distribution
    // against the corpus-wide reference — the STREAMING monitor's exact
    // code path run on its batch twin (the same two functions a
    // readStream would compose), which is how the stream output is
    // oracled.
    "q209_window_drift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val hist = graft.streaming.Streaming.windowedHistogram(
        ev, "ts", "value", "1 day", "1 hour", lo = 0.0, width = 40.0,
        nBuckets = 8)
      val ref = ev.filter(col("value").isNotNull)
        .select(least(greatest(floor((col("value") - lit(0.0)) / lit(40.0))
          .cast("long"), lit(0L)), lit(7L)).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_ref"))
      graft.operators.Drift.driftFromHistograms(hist, ref, nBuckets = 8)
    }),

    // Wilson score intervals ([[graft.operators.Stats.proportionCI]]):
    // per-arm user conversion rate with honest 95% bounds; counts from
    // one per-user collapse + one per-arm agg, z a shared literal.
    "q208_conversion_ci" -> ((s, dir) => {
      val perUser = t(s, dir, "events")
        .groupBy((col("user_id") % 3).as("arm"), col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("conv"))
      graft.operators.Stats.proportionCI(perUser, "arm", col("conv") === 1L)
    }),

    // Numeric distribution drift ([[graft.operators.Drift
    // .histogramDrift]]): PSI-bits between the view and purchase value
    // distributions on a declared 8-bucket grid — the monitoring card a
    // refreshed corpus runs per numeric column. Integer shares, bit
    // logs, bucket spine complete.
    "q198_value_drift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.Drift.histogramDrift(
        ev.filter(col("event_type") === "view").select("value"),
        ev.filter(col("event_type") === "purchase").select("value"),
        "value", lo = 0.0, width = 40.0, nBuckets = 8)
    }),

    // TPC-H Q1-style scan + partial-aggregable groupBy. At 100 TB this is a
    // single pass with map-side combine; no join, no wide row.
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(Dec)).cast("double").as("sum_base_price"),
          sum(revenueDec).cast("double").as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // Filter + projection; predicate and column pruning reach the parquet scan.
    "q2_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(revenueDec, 2).cast("double").as("revenue"))
    }),

    // Star join over two tiny dims — broadcast both; zero shuffle for the join,
    // one shuffle for the final groupBy.
    "q3_join_broadcast" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast(Dec)).cast("double").as("total_acctbal"))
    }),

    // Fact-fact join: lineitem x orders on orderkey. At scale this is a
    // shuffle (sort-merge) join on the natural key; AQE handles skew.
    "q4_join_facts" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          sum(revenueDec).cast("double").as("revenue"))
    }),

    // Global top-k: Spark's TakeOrderedAndProject — no full sort at scale.
    "q5_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    }),

    // Per-group top-k via a bounded-heap UDAF (graft.functions.TopK) instead
    // of rank() over a 5-partition window: partial aggregation reduces every
    // map task to ≤3 rows per group before a tiny shuffle — no skewed global
    // sort at 100 TB. Deterministic row_number semantics (price DESC, key ASC).
    "q6_window_rank" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(TopK.topK(3)(col("o_totalprice"), col("o_orderkey")).as("top"))
        .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("o_orderpriority"),
          col("e._2").as("o_orderkey"),
          col("e._1").as("o_totalprice"),
          (col("pos") + 1).cast("bigint").as("rnk"))
    }),

    // Set-op semantics (buyer ∩ / non-buyer ∖) in ONE pass: c_custkey is
    // unique, so intersect/except over it is equivalent to a single left join
    // against distinct buyers — 2 shuffles instead of 4, one scan per table.
    "q7_setops" -> ((s, dir) => {
      val custs = t(s, dir, "customer").select(col("c_custkey").as("k"))
      val buyers = t(s, dir, "orders").select(col("o_custkey").as("k")).distinct()
        .withColumn("b", lit(1))
      custs.join(buyers, Seq("k"), "left")
        .select(col("k"),
          when(col("b").isNull, "no_orders").otherwise("buyer").as("tag"))
    }),

    // Semi/anti joins (EXISTS / NOT EXISTS) with a SINGLE fact scan: aggregate
    // distinct suppliers appearing in lineitem (partial-agg, tiny result),
    // broadcast it to the supplier dim, tag by match.
    "q8_semi_anti" -> ((s, dir) => {
      val active = t(s, dir, "lineitem").select(col("l_suppkey")).distinct()
        .withColumn("a", lit(1))
      t(s, dir, "supplier")
        .join(broadcast(active), col("s_suppkey") === col("l_suppkey"), "left")
        .select(col("s_suppkey"),
          when(col("a").isNull, "inactive").otherwise("active").as("status"))
    }),

    // Exact distinct aggregation (two-phase at scale).
    "q9_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("n_parts"),
          countDistinct("l_suppkey").as("n_supps"))
    }),

    // ROLLUP hierarchy; NULL grouping slots coalesced for a stable oracle hash.
    "q10_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"),
          count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("cnt"))
    }),

    // Scalar function surface: date parts, string ops, conditional logic.
    "q11_scalar_fns" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          when(col("o_totalprice") > 100000, "big").otherwise("small").as("bucket"),
          upper(substring(col("o_orderstatus"), 1, 1)).as("st"))
        .groupBy("yr", "mo", "bucket", "st")
        .agg(count(lit(1)).as("cnt"))
    }),

    // Grouped HAVING: high-volume suppliers with a post-aggregation filter;
    // the supplier dim is broadcast against the lineitem aggregate.
    "q12_having" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast(Dec)).cast("double").as("total_qty"))
        .filter(col("n_lines") >= 100)
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select("s_name", "n_lines", "total_qty")
    }),

    // Analytic-window suite over the SCALE-SAFE partition key (per
    // customer — bounded rows per partition; the category-keyed analog
    // of these functions is the q103 histogram-cut path): order
    // sequence (row_number), days since the previous order (lag +
    // exact integer epoch div), and the customer-relative price
    // position (percent_rank / ntile(4) / cume_dist — each an int/int
    // ratio or integer bucket, IEEE-exact cross-engine because every
    // ordering is made total by the orderkey tiebreak).
    "q135_window_suite" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byDate = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val byPrice = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          row_number().over(byDate).cast("bigint").as("order_seq"),
          expr("(unix_micros(CAST(o_orderdate AS TIMESTAMP)) - " +
            "unix_micros(CAST(lag(o_orderdate) OVER " +
            "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) " +
            "AS TIMESTAMP))) div 86400000000").as("gap_days"),
          percent_rank().over(byPrice).as("price_pct"),
          ntile(4).over(byPrice).cast("bigint").as("price_quartile"),
          cume_dist().over(byPrice).as("price_cume"))
    }),

    // Key-space integrity audit: per 1000-key bucket of o_orderkey, how
    // many keys are present vs the bucket capacity — the gap report a
    // lossy ingest shows up in (the %97 plant simulates the dropped
    // rows; the generator's keys are dense, so every reported gap is a
    // plant). One map-side-combined agg; never a global sort or an
    // unpartitioned lead/lag window.
    // Sweep-line interval aggregation ([[graft.operators.Events
    // .inFlightByDay]]): lineitems in transit per day over derived
    // [ship, ship + 3..27d) intervals — ±1 deltas + the range-
    // partitioned prefix sum, never a days × intervals containment
    // join.
    "q183_in_transit" -> ((s, dir) =>
      graft.operators.Events.inFlightByDay(
        t(s, dir, "lineitem").select(col("l_shipdate"),
          date_add(to_date(col("l_shipdate")),
            (col("l_orderkey") % 25 + 3).cast("int")).as("l_receipt")),
        "l_shipdate", "l_receipt")),

    // Bucket capacity comes from the OBSERVED key domain, not a flat
    // 1000: the edge buckets are partial (keys start above the bucket's
    // lower bound; the last bucket ends at the global max), so a flat
    // capacity would report phantom gaps at the key-space edges. The
    // global bounds ride as a broadcast one-row frame.
    "q146_id_gaps" -> ((s, dir) => {
      val f = t(s, dir, "orders").select(col("o_orderkey"))
        .filter(col("o_orderkey") % 97 =!= 13)
      val bounds = f.agg(min(col("o_orderkey")).as("__gmin"),
        max(col("o_orderkey")).as("__gmax"))
      f.groupBy(expr("o_orderkey div 1000").as("bucket"))
        .agg(count(lit(1)).as("n_present"),
          min(col("o_orderkey")).as("lo"), max(col("o_orderkey")).as("hi"))
        .crossJoin(broadcast(bounds))
        .select(col("bucket"), col("n_present"),
          (least(col("bucket") * 1000L + 999L, col("__gmax")) -
            greatest(col("bucket") * 1000L, col("__gmin")) + 1L -
            col("n_present")).as("n_missing"), col("lo"), col("hi"))
        .filter(col("n_missing") > 0)
    }),

    // Correlated scalar subquery, decorrelated EXPLICITLY. The oracle
    // keeps the correlated SQL as the semantic spec; the engine ships
    // the aggregate join that spec decorrelates to — because handing
    // Catalyst the raw subquery is a measured scale-killer: an
    // EQUALITY-correlated predicate decorrelates cleanly, but the
    // non-equi `l_extendedprice > p.p_retailprice` correlation makes
    // Spark 4 build the DOMAIN join (distinct p_retailprice values
    // BroadcastNestedLoopJoin'd against every lineitem — |prices|×|li|
    // comparisons; 189 s at sf0.1 vs 0.6 s for this form, caught by
    // the session bench). The explicit form is one partkey-keyed
    // equi-join with the inequality as a join predicate + a map-side-
    // combined count + a left join back — per-part work only.
    "q164_correlated" -> ((s, dir) => {
      val p = t(s, dir, "part").select(col("p_partkey"), col("p_retailprice"))
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_extendedprice"))
      val cnt = li.join(p, li("l_partkey") === p("p_partkey") &&
          li("l_extendedprice") > p("p_retailprice"))
        .groupBy(col("p_partkey")).agg(count(lit(1)).as("__n"))
      p.join(cnt, Seq("p_partkey"), "left")
        .select(col("p_partkey"), col("p_retailprice"),
          coalesce(col("__n"), lit(0L)).as("n_pricier"))
    }),
    // Explicit skew salting ([[graft.operators.Skew.saltedJoin]]): the
    // customer→nation join shuffled on (key, salt) — the plan every
    // known-skew deployment wants (the hot key spreads across `salt`
    // reducers by construction; AQE's runtime splitter is the fallback
    // for UNKNOWN skew). Salting is semantics-preserving and the salt
    // never escapes, so the oracle is the PLAIN join; the aggregates
    // are order-free (count/min/max), bit-stable under any lane split.
    "q189_salted_join" -> ((s, dir) =>
      graft.operators.Skew.saltedJoin(
        t(s, dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal"),
        t(s, dir, "nation").select("n_nationkey", "n_name"),
        "c_nationkey", "n_nationkey", saltBy = col("c_custkey"), salt = 8)
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_cust"),
          min(col("c_acctbal")).as("min_bal"),
          max(col("c_acctbal")).as("max_bal"))),

    // part names within 2 edits, blocked on the first token — the
    // catalog-dedup tier (candidate+verify over a blocking key, the
    // LSH shape applied to edit distance). Levenshtein is exact.
    "q136_fuzzy_pairs" -> ((s, dir) =>
      graft.operators.Linkage.fuzzyPairs(
        t(s, dir, "part"), "p_partkey", "p_name",
        sc => element_at(split(sc, " "), 1), maxDist = 3)),

    // Z-order layout skipping card ([[graft.operators.Layout.skippingCard]]):
    // the same lineitem rows bucketed under a linear (l_partkey-ordered)
    // vs a compact-Morton (l_partkey, l_suppkey) layout, min/max pruned
    // by a box selective on BOTH keys — the measured "fewer files read"
    // claim behind OPTIMIZE ZORDER. The linear layout can only prune the
    // partkey dim; the z layout prunes multiplicatively. Bit widths
    // derive from the data maxima, so the card is parameter-free and
    // scale-portable (the box's relative selectivity shrinks as the key
    // space grows — exactly the regime where skipping matters).
    "q236_zorder_card" -> ((s, dir) =>
      graft.operators.Layout.skippingCard(
        t(s, dir, "lineitem").select("l_partkey", "l_suppkey"),
        Seq("l_partkey", "l_suppkey"),
        lo = Seq(1L, 1L), hi = Seq(500L, 25L), log2Buckets = 6))
  )

  val oracles: Map[String, String] = Map(
    // q199: identical contingency counts, the same fixed double op
    // chain per cell (E = R·C/N, term = d·d/E, floored micro units).
    "q199_chi2_mix" ->
      """WITH cells AS (SELECT 'arm' || CAST(user_id % 3 AS VARCHAR) AS arm,
        |    event_type, count(*) AS observed
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT arm, sum(observed) AS rt FROM cells GROUP BY 1),
        |c AS (SELECT event_type, sum(observed) AS ct FROM cells GROUP BY 1),
        |n AS (SELECT sum(observed) AS nt FROM cells),
        |j AS (SELECT ra.arm, ca.event_type, coalesce(cells.observed, 0) AS observed,
        |        CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(nt AS DOUBLE) AS e
        |      FROM r ra CROSS JOIN c ca
        |      LEFT JOIN cells ON cells.arm = ra.arm AND cells.event_type = ca.event_type, n)
        |SELECT arm, event_type, CAST(observed AS BIGINT) AS observed,
        |  CAST(floor(e * 1000000.0) AS BIGINT) AS expected_micro,
        |  CAST(floor((CAST(observed AS DOUBLE) - e) * (CAST(observed AS DOUBLE) - e) / e * 1000000.0) AS BIGINT) AS term_micro
        |FROM j""".stripMargin,

    // q200: same per-value counts, the cumulative via a window (the
    // oracle is single-node), the same doubled-U integer grid and the
    // same IEEE z chain. Every hugeint aggregate cast back to BIGINT.
    "q200_rank_shift" ->
      """WITH p AS (SELECT value AS v, 1 AS ia FROM events WHERE event_type='purchase' AND value IS NOT NULL),
        |q AS (SELECT value AS v, 0 AS ia FROM events WHERE event_type='view' AND value IS NOT NULL),
        |u AS (SELECT * FROM p UNION ALL SELECT * FROM q),
        |byv AS (SELECT v, sum(ia) AS ca, count(*) AS ct FROM u GROUP BY 1),
        |w AS (SELECT ca, ct, coalesce(sum(ct) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lt FROM byv),
        |g AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(ct-ca) AS BIGINT) AS n_b,
        |             CAST(sum(ca*(2*lt+ct+1)) AS BIGINT) AS r2_a,
        |             CAST(sum(ct*ct*ct-ct) AS BIGINT) AS tie_cube FROM w),
        |h AS (SELECT n_a, n_b, r2_a - n_a*(n_a+1) AS u2_a, tie_cube FROM g),
        |z AS (SELECT *, CAST(n_a AS DOUBLE)*CAST(n_b AS DOUBLE)/12.0 *
        |        ((CAST(n_a+n_b AS DOUBLE)+1.0) - CAST(tie_cube AS DOUBLE)/(CAST(n_a+n_b AS DOUBLE)*(CAST(n_a+n_b AS DOUBLE)-1.0))) AS varr
        |      FROM h)
        |SELECT n_a, n_b, u2_a, 2*n_a*n_b - u2_a AS u2_b, tie_cube,
        |  CASE WHEN varr <= 0.0 THEN NULL ELSE
        |    CAST(floor((CAST(u2_a AS DOUBLE)/2.0 - CAST(n_a AS DOUBLE)*CAST(n_b AS DOUBLE)/2.0) / sqrt(varr) * 1000000.0) AS BIGINT)
        |  END AS z_micro
        |FROM z""".stripMargin,

    // q201: same exact integer numerator |cum_a·n_b − cum_b·n_a|; the
    // arg-sup row via ORDER BY d DESC, v LIMIT 1 (Spark: top-1).
    "q201_ks_drift" ->
      """WITH p AS (SELECT value AS v, 1 AS ia FROM events WHERE event_type='purchase' AND value IS NOT NULL),
        |q AS (SELECT value AS v, 0 AS ia FROM events WHERE event_type='view' AND value IS NOT NULL),
        |u AS (SELECT * FROM p UNION ALL SELECT * FROM q),
        |byv AS (SELECT v, sum(ia) AS ca, count(*) AS ct FROM u GROUP BY 1),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(ct-ca) AS BIGINT) AS n_b FROM byv),
        |w AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cua, sum(ct) OVER (ORDER BY v) AS cut FROM byv),
        |curve AS (SELECT v, CAST(abs(cua*n_b - (cut-cua)*n_a) AS BIGINT) AS d, n_a, n_b FROM w, tot)
        |SELECT n_a, n_b, d AS d_num,
        |  CAST(floor(CAST(d AS DOUBLE)/(CAST(n_a AS DOUBLE)*CAST(n_b AS DOUBLE))*1000000.0) AS BIGINT) AS d_micro,
        |  v AS ks_at
        |FROM curve ORDER BY d DESC, v LIMIT 1""".stripMargin,

    // q202: the same micro-grid moments (hugeint sums exact, like
    // Spark's DECIMAL(38,0)), the same variance/t/df IEEE chains.
    "q202_welch_means" ->
      """WITH a AS (SELECT CAST(floor(value*1000000.0) AS BIGINT) AS m FROM events WHERE event_type='purchase' AND value IS NOT NULL),
        |b AS (SELECT CAST(floor(value*1000000.0) AS BIGINT) AS m FROM events WHERE event_type='view' AND value IS NOT NULL),
        |ga AS (SELECT CAST(count(*) AS BIGINT) AS n_a, CAST(sum(m) AS BIGINT) AS s1a, CAST(sum(m*m) AS DOUBLE) AS s2a FROM a),
        |gb AS (SELECT CAST(count(*) AS BIGINT) AS n_b, CAST(sum(m) AS BIGINT) AS s1b, CAST(sum(m*m) AS DOUBLE) AS s2b FROM b),
        |j AS (SELECT *,
        |  (s2a - CAST(s1a AS DOUBLE)*CAST(s1a AS DOUBLE)/CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE)-1.0) / CAST(n_a AS DOUBLE) AS sea,
        |  (s2b - CAST(s1b AS DOUBLE)*CAST(s1b AS DOUBLE)/CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE)-1.0) / CAST(n_b AS DOUBLE) AS seb
        |  FROM ga, gb)
        |SELECT n_a, n_b,
        |  CAST(floor(CAST(s1a AS DOUBLE)/CAST(n_a AS DOUBLE)) AS BIGINT) AS mean_a_micro,
        |  CAST(floor(CAST(s1b AS DOUBLE)/CAST(n_b AS DOUBLE)) AS BIGINT) AS mean_b_micro,
        |  CASE WHEN n_a < 2 OR n_b < 2 OR sea + seb <= 0.0 THEN NULL ELSE
        |    CAST(floor((CAST(s1a AS DOUBLE)/CAST(n_a AS DOUBLE) - CAST(s1b AS DOUBLE)/CAST(n_b AS DOUBLE)) / sqrt(sea+seb) * 1000000.0) AS BIGINT)
        |  END AS t_micro,
        |  CASE WHEN n_a < 2 OR n_b < 2 OR sea + seb <= 0.0 THEN NULL ELSE
        |    CAST(floor((sea+seb)*(sea+seb) / (sea*sea/(CAST(n_a AS DOUBLE)-1.0) + seb*seb/(CAST(n_b AS DOUBLE)-1.0)) * 1000000.0) AS BIGINT)
        |  END AS df_micro
        |FROM j""".stripMargin,

    // q203: same window restriction, same epoch_us hour grid (NOT
    // date_diff — that counts boundary crossings), same micro-floored
    // per-step hazard summed as integers.
    "q203_retention_hazard" ->
      """WITH ev AS (SELECT * FROM events WHERE ts IS NOT NULL AND ts <= TIMESTAMP '2024-01-03 00:00:00'),
        |subj AS (SELECT user_id, min(epoch_us(ts)) AS t0,
        |           min(CASE WHEN event_type='purchase' THEN epoch_us(ts) END) AS te
        |         FROM ev GROUP BY 1),
        |durs AS (SELECT (coalesce(te, epoch_us(TIMESTAMP '2024-01-03 00:00:00')) - t0) // 3600000000 AS dur,
        |           CASE WHEN te IS NOT NULL THEN 1 ELSE 0 END AS e
        |         FROM subj),
        |byd AS (SELECT dur, CAST(sum(e) AS BIGINT) AS d, CAST(sum(1-e) AS BIGINT) AS c FROM durs GROUP BY 1),
        |tot AS (SELECT CAST(sum(d+c) AS BIGINT) AS n FROM byd),
        |w AS (SELECT dur, d, c, CAST(n - coalesce(sum(d+c) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk FROM byd, tot),
        |h AS (SELECT dur, d, c, n_risk, CAST(floor(CAST(d AS DOUBLE)/CAST(n_risk AS DOUBLE)*1000000.0) AS BIGINT) AS hazard_micro FROM w)
        |SELECT CAST(dur AS BIGINT) AS dur, d, c, n_risk, hazard_micro,
        |  CAST(sum(hazard_micro) OVER (ORDER BY dur) AS BIGINT) AS cumhaz_micro
        |FROM h""".stripMargin,

    // q204: same micro grid, same rank-interval clamp arithmetic (all
    // integer until the final two divisions), boundary order statistics
    // via the same conditional max.
    "q204_robust_mean" ->
      """WITH m AS (SELECT CAST(floor(value*1000000.0) AS BIGINT) AS m FROM events WHERE value IS NOT NULL),
        |byv AS (SELECT m, count(*) AS ct FROM m GROUP BY 1),
        |w AS (SELECT m, ct, coalesce(sum(ct) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),0) AS less FROM byv),
        |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS n, CAST(floor(CAST(sum(ct) AS DOUBLE) * 0.05) AS BIGINT) AS k FROM byv),
        |kept AS (SELECT m, ct, less, n, k,
        |    GREATEST(LEAST(less+ct, n-k) - GREATEST(less, k), 0) AS wkeep FROM w, tot),
        |agg AS (SELECT CAST(max(n) AS BIGINT) AS n, CAST(max(k) AS BIGINT) AS k,
        |               CAST(sum(m*wkeep) AS BIGINT) AS tsum, CAST(sum(wkeep) AS BIGINT) AS tcnt,
        |               CAST(max(CASE WHEN less <= k AND k < less+ct THEN m END) AS BIGINT) AS lo_micro,
        |               CAST(max(CASE WHEN less <= n-k-1 AND n-k-1 < less+ct THEN m END) AS BIGINT) AS hi_micro
        |        FROM kept)
        |SELECT n, k, lo_micro, hi_micro,
        |  CAST(floor(CAST(tsum AS DOUBLE)/CAST(tcnt AS DOUBLE)) AS BIGINT) AS trimmed_mean_micro,
        |  CAST(floor(CAST(tsum + k*lo_micro + k*hi_micro AS DOUBLE)/CAST(n AS DOUBLE)) AS BIGINT) AS winsor_mean_micro
        |FROM agg""".stripMargin,

    // q205: same integer-cents first digit (string head of an exact
    // integer), the same literal expected shares interpolated from
    // Stats.benfordExpectedMicro.
    "q205_benford_price" -> {
      val spine = graft.operators.Stats.benfordExpectedMicro.zipWithIndex
        .map { case (e, i) => s"(${i + 1}, ${e})" }.mkString(", ")
      s"""WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice*100.0) AS BIGINT) AS VARCHAR),1,1) AS BIGINT) AS digit
        |           FROM orders WHERE o_totalprice >= 0.01),
        |h AS (SELECT digit, count(*) AS observed FROM d GROUP BY 1),
        |tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM h),
        |s(digit, expected_micro) AS (VALUES ${spine})
        |SELECT CAST(s.digit AS BIGINT) AS digit, CAST(coalesce(h.observed,0) AS BIGINT) AS observed,
        |  CAST(coalesce(h.observed,0) * 1000000 // n AS BIGINT) AS share_micro,
        |  CAST(s.expected_micro AS BIGINT) AS expected_micro,
        |  CAST(abs(coalesce(h.observed,0) * 1000000 // n - s.expected_micro) AS BIGINT) AS dev_micro
        |FROM s LEFT JOIN h ON s.digit = h.digit, tot""".stripMargin
    },

    // q206: same per-user integer sums (hugeint cross products = Spark's
    // DECIMAL(38,0)), same pooled-θ and adjusted-mean chains.
    "q206_cuped_adjust" ->
      """WITH pu AS (
        |  SELECT user_id % 2 AS arm,
        |    coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN CAST(floor(value*1000000.0) AS BIGINT) END), 0) AS x,
        |    coalesce(sum(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00' AND event_type='purchase' THEN CAST(floor(value*1000000.0) AS BIGINT) END), 0) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
        |pool AS (SELECT CAST(count(*) AS BIGINT) n, CAST(sum(x) AS BIGINT) sx, CAST(sum(y) AS BIGINT) sy,
        |  CAST(sum(CAST(x AS HUGEINT)*y) AS DOUBLE) sxy, CAST(sum(CAST(x AS HUGEINT)*x) AS DOUBLE) sxx, CAST(sum(CAST(y AS HUGEINT)*y) AS DOUBLE) syy FROM pu),
        |byarm AS (SELECT arm, CAST(count(*) AS BIGINT) ng, CAST(sum(x) AS BIGINT) sxg, CAST(sum(y) AS BIGINT) syg FROM pu GROUP BY 1),
        |j AS (SELECT *,
        |  CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE) AS covn,
        |  CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) AS varxn,
        |  CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE) AS varyn
        |  FROM byarm, pool)
        |SELECT CAST(arm AS BIGINT) AS arm, ng AS n,
        |  CAST(floor(CAST(syg AS DOUBLE)/CAST(ng AS DOUBLE)) AS BIGINT) AS mean_y_micro,
        |  CASE WHEN varxn <= 0.0 THEN NULL ELSE
        |    CAST(floor(CAST(syg AS DOUBLE)/CAST(ng AS DOUBLE) - covn/varxn * (CAST(sxg AS DOUBLE)/CAST(ng AS DOUBLE) - CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))) AS BIGINT)
        |  END AS mean_adj_micro,
        |  CASE WHEN varxn <= 0.0 THEN NULL ELSE CAST(floor(covn/varxn * 1000000.0) AS BIGINT) END AS theta_micro,
        |  CASE WHEN varxn <= 0.0 OR varyn <= 0.0 THEN NULL ELSE CAST(floor(covn*covn/(varxn*varyn) * 1000000.0) AS BIGINT) END AS var_reduction_ppm
        |FROM j""".stripMargin,

    // q207: the same md5 digest of (seed, key, pair) with replicates 2q
    // and 2q+1 drawn from the digest's disjoint 60-bit halves, and the
    // same Poisson thresholds interpolated as literals (exp/md5
    // arithmetic agreed by construction, not by luck).
    "q207_bootstrap_ci" -> {
      import graft.functions.Stable
      val t = graft.operators.Stats.poissonThresholds
      s"""WITH sp AS (SELECT unnest(generate_series(0, 49)) AS q),
        |rows AS (SELECT event_id AS k, CAST(floor(value*1000000.0) AS BIGINT) AS m
        |  FROM events WHERE value IS NOT NULL),
        |d AS (SELECT q, ${Stable.duckSeededDigest(1L, "k", "q")} AS d, m
        |      FROM rows CROSS JOIN sp),
        |x AS (SELECT 2*q AS b, ${Stable.duckDigestLo("d")} AS h, m FROM d
        |      UNION ALL
        |      SELECT 2*q+1 AS b, ${Stable.duckDigestHi("d")} AS h, m FROM d),
        |w AS (SELECT b, m, CASE WHEN h < ${t(0)} THEN 0 WHEN h < ${t(1)} THEN 1
        |        WHEN h < ${t(2)} THEN 2 WHEN h < ${t(3)} THEN 3
        |        WHEN h < ${t(4)} THEN 4 WHEN h < ${t(5)} THEN 5 ELSE 6 END AS w FROM x),
        |g AS (SELECT b, CAST(sum(w) AS BIGINT) AS n_b, CAST(sum(w*m) AS BIGINT) AS s FROM w GROUP BY 1)
        |SELECT CAST(b AS BIGINT) AS b, n_b,
        |  CASE WHEN n_b <= 0 THEN NULL ELSE CAST(floor(CAST(s AS DOUBLE)/CAST(n_b AS DOUBLE)) AS BIGINT) END AS mean_micro
        |FROM g""".stripMargin
    },

    // q214: same epoch-day grid, same cumulative windows over the
    // bounded (arm × day) frame, same z/boundary chains with the shared
    // CAST DOUBLE literal.
    "q214_sequential_monitor" -> {
      val z = s"CAST(${graft.operators.Stats.z975} AS DOUBLE)"
      s"""WITH pu AS (
        |  SELECT user_id % 2 AS arm,
        |    min(epoch_us(ts) // 86400000000) AS fs,
        |    min(CASE WHEN event_type='purchase' THEN epoch_us(ts) // 86400000000 END) AS fp
        |  FROM events GROUP BY user_id),
        |dn AS (SELECT arm, fs AS day, count(*) AS dn FROM pu GROUP BY 1, 2),
        |dx AS (SELECT arm, fp AS day, count(*) AS dx FROM pu WHERE fp IS NOT NULL GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM (SELECT day FROM dn UNION ALL SELECT day FROM dx)),
        |sp AS (SELECT a.arm, d.day FROM (VALUES (0), (1)) a(arm) CROSS JOIN days d),
        |de AS (SELECT sp.arm, sp.day, coalesce(dn.dn, 0) AS dn, coalesce(dx.dx, 0) AS dx
        |       FROM sp LEFT JOIN dn ON dn.arm = sp.arm AND dn.day = sp.day
        |               LEFT JOIN dx ON dx.arm = sp.arm AND dx.day = sp.day),
        |cum AS (SELECT arm, day, CAST(sum(dn) OVER (PARTITION BY arm ORDER BY day) AS BIGINT) AS cn,
        |               CAST(sum(dx) OVER (PARTITION BY arm ORDER BY day) AS BIGINT) AS cx FROM de),
        |tot AS (SELECT CAST(sum(dn) AS BIGINT) AS nt FROM de),
        |w AS (SELECT day,
        |        max(CASE WHEN arm = 0 THEN cn END) AS n_a, max(CASE WHEN arm = 0 THEN cx END) AS x_a,
        |        max(CASE WHEN arm = 1 THEN cn END) AS n_b, max(CASE WHEN arm = 1 THEN cx END) AS x_b
        |      FROM cum GROUP BY 1),
        |c AS (SELECT w.*, nt,
        |        CAST(x_a + x_b AS DOUBLE)/CAST(n_a + n_b AS DOUBLE) AS pp,
        |        CAST(n_a + n_b AS DOUBLE)/CAST(nt AS DOUBLE) AS frac,
        |        (CAST(x_a AS DOUBLE)/CAST(n_a AS DOUBLE) - CAST(x_b AS DOUBLE)/CAST(n_b AS DOUBLE)) AS pd
        |      FROM w, tot WHERE n_a > 0 AND n_b > 0)
        |SELECT CAST(day AS BIGINT) AS day, n_a, x_a, n_b, x_b,
        |  CAST(floor(frac * 1000000.0) AS BIGINT) AS frac_ppm,
        |  CASE WHEN pp <= 0.0 OR pp >= 1.0 THEN NULL ELSE
        |    CAST(floor(pd / sqrt(pp*(1.0-pp)*(1.0/CAST(n_a AS DOUBLE) + 1.0/CAST(n_b AS DOUBLE))) * 1000000.0) AS BIGINT)
        |  END AS z_micro,
        |  CAST(floor(${z}/sqrt(frac) * 1000000.0) AS BIGINT) AS bound_micro,
        |  CAST(CASE WHEN pp <= 0.0 OR pp >= 1.0 THEN 0 WHEN
        |    abs(pd / sqrt(pp*(1.0-pp)*(1.0/CAST(n_a AS DOUBLE) + 1.0/CAST(n_b AS DOUBLE)))) >= ${z}/sqrt(frac)
        |    THEN 1 ELSE 0 END AS BIGINT) AS crossed
        |FROM c""".stripMargin
    },

    // q216: the FULL composition replayed — same hashed assignment
    // (md5 fragment ≡ assignSplit's seededHash), same CUPED moment
    // chains as q206, same Wilson chains as q208, same monitor chains
    // as q214, final-day row by ORDER BY day DESC LIMIT 1.
    "q216_experiment_readout" -> {
      val z = s"CAST(${graft.operators.Stats.z975} AS DOUBLE)"
      val h = graft.functions.Stable.duckSeededHash(216, "user_id")
      s"""WITH pu AS (
        |  SELECT user_id,
        |    coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN CAST(floor(value*1000000.0) AS BIGINT) END), 0) AS x,
        |    coalesce(sum(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00' AND event_type='purchase' THEN CAST(floor(value*1000000.0) AS BIGINT) END), 0) AS y,
        |    min(epoch_us(ts) // 86400000000) AS fs,
        |    min(CASE WHEN event_type='purchase' AND value >= 200 THEN epoch_us(ts) // 86400000000 END) AS fp
        |  FROM events GROUP BY user_id),
        |a AS (SELECT *, CASE WHEN $h % 1000 < 500 THEN 0 ELSE 1 END AS arm FROM pu),
        |pool AS (SELECT CAST(count(*) AS BIGINT) n, CAST(sum(x) AS BIGINT) sx, CAST(sum(y) AS BIGINT) sy,
        |  CAST(sum(CAST(x AS HUGEINT)*y) AS DOUBLE) sxy, CAST(sum(CAST(x AS HUGEINT)*x) AS DOUBLE) sxx, CAST(sum(CAST(y AS HUGEINT)*y) AS DOUBLE) syy FROM a),
        |byarm AS (SELECT arm, CAST(count(*) AS BIGINT) ng, CAST(sum(x) AS BIGINT) sxg, CAST(sum(y) AS BIGINT) syg FROM a GROUP BY 1),
        |cu AS (SELECT arm, ng, sxg, syg, n, sx,
        |  CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE) AS covn,
        |  CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) AS varxn,
        |  CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE) AS varyn
        |  FROM byarm, pool),
        |cuc AS (SELECT CAST(arm AS BIGINT) AS arm, ng AS n,
        |  CAST(floor(CAST(syg AS DOUBLE)/CAST(ng AS DOUBLE)) AS BIGINT) AS mean_y_micro,
        |  CASE WHEN varxn <= 0.0 THEN NULL ELSE
        |    CAST(floor(CAST(syg AS DOUBLE)/CAST(ng AS DOUBLE) - covn/varxn * (CAST(sxg AS DOUBLE)/CAST(ng AS DOUBLE) - CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))) AS BIGINT)
        |  END AS mean_adj_micro,
        |  CASE WHEN varxn <= 0.0 THEN NULL ELSE CAST(floor(covn/varxn * 1000000.0) AS BIGINT) END AS theta_micro,
        |  CASE WHEN varxn <= 0.0 OR varyn <= 0.0 THEN NULL ELSE CAST(floor(covn*covn/(varxn*varyn) * 1000000.0) AS BIGINT) END AS var_reduction_ppm
        |  FROM cu),
        |wg AS (SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS successes FROM a GROUP BY 1),
        |wc AS (SELECT *, CAST(successes AS DOUBLE)/CAST(n AS DOUBLE) AS ph, 1.0 + ${z}*${z}/CAST(n AS DOUBLE) AS denom FROM wg),
        |wh AS (SELECT *, (ph + ${z}*${z}/(2.0*CAST(n AS DOUBLE)))/denom AS center,
        |  ${z}*sqrt(ph*(1.0-ph)/CAST(n AS DOUBLE) + ${z}*${z}/(4.0*CAST(n AS DOUBLE)*CAST(n AS DOUBLE)))/denom AS half FROM wc),
        |wil AS (SELECT CAST(arm AS BIGINT) AS arm, successes,
        |  CAST(floor(ph * 1000000.0) AS BIGINT) AS rate_ppm,
        |  CAST(floor((center - half) * 1000000.0) AS BIGINT) AS lo_ppm,
        |  CAST(floor((center + half) * 1000000.0) AS BIGINT) AS hi_ppm FROM wh),
        |dn AS (SELECT arm, fs AS day, count(*) AS dn FROM a GROUP BY 1, 2),
        |dx AS (SELECT arm, fp AS day, count(*) AS dx FROM a WHERE fp IS NOT NULL GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM (SELECT day FROM dn UNION ALL SELECT day FROM dx)),
        |sp AS (SELECT s.arm, d.day FROM (VALUES (0), (1)) s(arm) CROSS JOIN days d),
        |de AS (SELECT sp.arm, sp.day, coalesce(dn.dn, 0) AS dn, coalesce(dx.dx, 0) AS dx
        |       FROM sp LEFT JOIN dn ON dn.arm = sp.arm AND dn.day = sp.day
        |               LEFT JOIN dx ON dx.arm = sp.arm AND dx.day = sp.day),
        |cum AS (SELECT arm, day, CAST(sum(dn) OVER (PARTITION BY arm ORDER BY day) AS BIGINT) AS cn,
        |               CAST(sum(dx) OVER (PARTITION BY arm ORDER BY day) AS BIGINT) AS cx FROM de),
        |tot AS (SELECT CAST(sum(dn) AS BIGINT) AS nt FROM de),
        |byday AS (SELECT day,
        |        max(CASE WHEN arm = 0 THEN cn END) AS n_a, max(CASE WHEN arm = 0 THEN cx END) AS x_a,
        |        max(CASE WHEN arm = 1 THEN cn END) AS n_b, max(CASE WHEN arm = 1 THEN cx END) AS x_b
        |      FROM cum GROUP BY 1),
        |mc AS (SELECT byday.*, nt,
        |        CAST(x_a + x_b AS DOUBLE)/CAST(n_a + n_b AS DOUBLE) AS pp,
        |        CAST(n_a + n_b AS DOUBLE)/CAST(nt AS DOUBLE) AS frac,
        |        (CAST(x_a AS DOUBLE)/CAST(n_a AS DOUBLE) - CAST(x_b AS DOUBLE)/CAST(n_b AS DOUBLE)) AS pd
        |      FROM byday, tot WHERE n_a > 0 AND n_b > 0),
        |mon AS (SELECT CAST(day AS BIGINT) AS final_day,
        |  CASE WHEN pp <= 0.0 OR pp >= 1.0 THEN NULL ELSE
        |    CAST(floor(pd / sqrt(pp*(1.0-pp)*(1.0/CAST(n_a AS DOUBLE) + 1.0/CAST(n_b AS DOUBLE))) * 1000000.0) AS BIGINT)
        |  END AS z_micro,
        |  CAST(floor(${z}/sqrt(frac) * 1000000.0) AS BIGINT) AS bound_micro,
        |  CAST(CASE WHEN pp <= 0.0 OR pp >= 1.0 THEN 0 WHEN
        |    abs(pd / sqrt(pp*(1.0-pp)*(1.0/CAST(n_a AS DOUBLE) + 1.0/CAST(n_b AS DOUBLE)))) >= ${z}/sqrt(frac)
        |    THEN 1 ELSE 0 END AS BIGINT) AS crossed
        |  FROM mc ORDER BY day DESC LIMIT 1)
        |SELECT cuc.*, wil.successes, wil.rate_ppm, wil.lo_ppm, wil.hi_ppm,
        |       mon.final_day, mon.z_micro, mon.bound_micro, mon.crossed
        |FROM cuc JOIN wil ON cuc.arm = wil.arm, mon""".stripMargin
    },

    // q213: the same micro-grid moments (hugeint cross products ≡
    // Spark's DECIMAL(38,0)), the same per-pair IEEE chains, one UNION
    // branch per unordered pair off the single aggregate row.
    "q213_corr_matrix" -> {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val ms = cs.zipWithIndex.map { case (c, i) =>
        s"CAST(floor($c*1000000.0) AS BIGINT) AS m$i" }.mkString(", ")
      val moments = (Seq("CAST(count(*) AS BIGINT) AS n") ++
        cs.indices.map(i => s"CAST(sum(m$i) AS BIGINT) AS s$i") ++
        (for (i <- cs.indices; j <- i until cs.size) yield
          s"CAST(sum(CAST(m$i AS HUGEINT) * m$j) AS DOUBLE) AS p${i}_$j"))
        .mkString(", ")
      val rows = (for (i <- cs.indices; j <- (i + 1) until cs.size) yield {
        val covn = s"(CAST(n AS DOUBLE)*p${i}_$j - CAST(s$i AS DOUBLE)*CAST(s$j AS DOUBLE))"
        val vin = s"(CAST(n AS DOUBLE)*p${i}_$i - CAST(s$i AS DOUBLE)*CAST(s$i AS DOUBLE))"
        val vjn = s"(CAST(n AS DOUBLE)*p${j}_$j - CAST(s$j AS DOUBLE)*CAST(s$j AS DOUBLE))"
        s"SELECT '${cs(i)}' AS col_a, '${cs(j)}' AS col_b, n, " +
          s"CASE WHEN $vin <= 0.0 OR $vjn <= 0.0 THEN NULL ELSE " +
          s"CAST(floor($covn / sqrt($vin * $vjn) * 1000000.0) AS BIGINT) END AS r_micro FROM g"
      }).mkString("\nUNION ALL\n")
      val nonNull = cs.map(c => s"$c IS NOT NULL").mkString(" AND ")
      s"""WITH m AS (SELECT $ms FROM lineitem WHERE $nonNull),
         |g AS (SELECT $moments FROM m)
         |$rows""".stripMargin
    },

    // q212: same grouped counts; count(DISTINCT) exact on both engines.
    "q212_anonymity_audit" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS class_size,
        |  CAST(count(DISTINCT CAST(floor(c_acctbal / 2000.0) AS BIGINT)) AS BIGINT) AS distinct_sensitive,
        |  CAST(CASE WHEN count(*) >= 3 THEN 1 ELSE 0 END AS BIGINT) AS k_ok,
        |  CAST(CASE WHEN count(DISTINCT CAST(floor(c_acctbal / 2000.0) AS BIGINT)) >= 2 THEN 1 ELSE 0 END AS BIGINT) AS l_ok
        |FROM customer GROUP BY 1, 2""".stripMargin,

    // q209: date_trunc('day') = the UTC-aligned tumbling window; same
    // bucketing, complete per-window spine, integer shares, bit logs.
    "q209_window_drift" ->
      """WITH v AS (SELECT date_trunc('day', ts) AS win_start,
        |    LEAST(GREATEST(CAST(floor((value - 0.0) / 40.0) AS BIGINT), 0), 7) AS bucket
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |hist AS (SELECT win_start, bucket, count(*) AS n FROM v GROUP BY 1, 2),
        |wins AS (SELECT DISTINCT win_start FROM hist),
        |ref AS (SELECT bucket, count(*) AS n_ref FROM v GROUP BY 1),
        |rt AS (SELECT CAST(coalesce(sum(n_ref), 0) AS BIGINT) AS tb FROM ref),
        |wt AS (SELECT win_start, CAST(sum(n) AS BIGINT) AS ta FROM hist GROUP BY 1),
        |j AS (SELECT w.win_start, s.bucket, CAST(coalesce(h.n, 0) AS BIGINT) AS n,
        |        CAST(coalesce(r.n_ref, 0) AS BIGINT) AS n_ref, ta, tb
        |      FROM wins w CROSS JOIN generate_series(0, 7) s(bucket)
        |      LEFT JOIN hist h ON h.win_start = w.win_start AND h.bucket = s.bucket
        |      LEFT JOIN ref r ON r.bucket = s.bucket
        |      JOIN wt ON wt.win_start = w.win_start, rt),
        |k AS (SELECT win_start, bucket, n, n_ref,
        |        CASE WHEN ta > 0 THEN n * 1000000 // ta ELSE 0 END AS share_a,
        |        CASE WHEN tb > 0 THEN n_ref * 1000000 // tb ELSE 0 END AS share_b
        |      FROM j)
        |SELECT win_start, CAST(bucket AS BIGINT) AS bucket, n, n_ref,
        |  CAST(share_a AS BIGINT) AS share_a, CAST(share_b AS BIGINT) AS share_b,
        |  CAST((share_a - share_b) * ((length(bin(share_a + 1)) - 1) -
        |       (length(bin(share_b + 1)) - 1)) AS BIGINT) AS psi_term
        |FROM k""".stripMargin,

    // q208: the same literal z (Double.toString round-trips), the same
    // center/half-width chains over exact counts.
    "q208_conversion_ci" -> {
      // CAST the literal: DuckDB parses bare decimal literals as
      // DECIMAL, whose exact z*z would round ONCE where Spark's
      // double*double rounds each factor — a 1-ulp divergence class.
      val z = s"CAST(${graft.operators.Stats.z975} AS DOUBLE)"
      s"""WITH pu AS (SELECT user_id % 3 AS arm, user_id,
        |    max(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS successes
        |      FROM pu GROUP BY 1),
        |c AS (SELECT *,
        |  CAST(successes AS DOUBLE)/CAST(n AS DOUBLE) AS ph,
        |  1.0 + ${z}*${z}/CAST(n AS DOUBLE) AS denom FROM g),
        |h AS (SELECT *,
        |  (ph + ${z}*${z}/(2.0*CAST(n AS DOUBLE)))/denom AS center,
        |  ${z}*sqrt(ph*(1.0-ph)/CAST(n AS DOUBLE) + ${z}*${z}/(4.0*CAST(n AS DOUBLE)*CAST(n AS DOUBLE)))/denom AS half
        |  FROM c)
        |SELECT CAST(arm AS BIGINT) AS arm, n, successes,
        |  CAST(floor(ph * 1000000.0) AS BIGINT) AS rate_ppm,
        |  CAST(floor((center - half) * 1000000.0) AS BIGINT) AS lo_ppm,
        |  CAST(floor((center + half) * 1000000.0) AS BIGINT) AS hi_ppm
        |FROM h""".stripMargin
    },

    // q198: identical bucketing (one IEEE floor per value, clamped),
    // integer shares, bit-log psi terms over the complete bucket spine.
    "q198_value_drift" ->
      """WITH av AS (SELECT LEAST(GREATEST(CAST(floor((value - 0.0) / 40.0) AS BIGINT), 0), 7) AS bucket
        |            FROM events WHERE event_type = 'view' AND value IS NOT NULL),
        |bv AS (SELECT LEAST(GREATEST(CAST(floor((value - 0.0) / 40.0) AS BIGINT), 0), 7) AS bucket
        |       FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
        |ha AS (SELECT bucket, count(*) AS n_a FROM av GROUP BY 1),
        |hb AS (SELECT bucket, count(*) AS n_b FROM bv GROUP BY 1),
        |h AS (SELECT g.bucket, coalesce(ha.n_a, 0) AS n_a, coalesce(hb.n_b, 0) AS n_b
        |      FROM generate_series(0, 7) g(bucket)
        |      LEFT JOIN ha ON ha.bucket = g.bucket
        |      LEFT JOIN hb ON hb.bucket = g.bucket),
        |t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM h),
        |s AS (SELECT h.bucket, h.n_a, h.n_b,
        |        CASE WHEN t.ta > 0 THEN h.n_a * 1000000 // t.ta ELSE 0 END AS share_a,
        |        CASE WHEN t.tb > 0 THEN h.n_b * 1000000 // t.tb ELSE 0 END AS share_b
        |      FROM h, t)
        |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(n_a AS BIGINT) AS n_a,
        |  CAST(n_b AS BIGINT) AS n_b, CAST(share_a AS BIGINT) AS share_a,
        |  CAST(share_b AS BIGINT) AS share_b,
        |  CAST((share_a - share_b) * ((length(bin(share_a + 1)) - 1) -
        |       (length(bin(share_b + 1)) - 1)) AS BIGINT) AS psi_term
        |FROM s""".stripMargin,

    // q197: one scalar select per declared check, violation counts and
    // the 0/1 pass flag exactly as the operator defines them.
    "q197_quality_checks" ->
      """SELECT 'not_null' AS check_name, 'l_orderkey' AS col_name,
        |  CAST(count(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT) AS n_violations,
        |  CAST(CASE WHEN count(*) FILTER (WHERE l_orderkey IS NULL) = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
        |FROM lineitem
        |UNION ALL SELECT 'in_range', 'l_quantity',
        |  CAST(count(*) FILTER (WHERE l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 30)) AS BIGINT) AS v,
        |  CAST(CASE WHEN count(*) FILTER (WHERE l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 30)) = 0 THEN 1 ELSE 0 END AS BIGINT)
        |FROM lineitem
        |UNION ALL SELECT 'in_range', 'l_discount',
        |  CAST(count(*) FILTER (WHERE l_discount IS NOT NULL AND (l_discount < 0.0 OR l_discount > 0.05)) AS BIGINT),
        |  CAST(CASE WHEN count(*) FILTER (WHERE l_discount IS NOT NULL AND (l_discount < 0.0 OR l_discount > 0.05)) = 0 THEN 1 ELSE 0 END AS BIGINT)
        |FROM lineitem
        |UNION ALL SELECT 'accepted_values', 'l_returnflag',
        |  CAST(count(*) FILTER (WHERE l_returnflag IS NULL OR l_returnflag NOT IN ('A', 'N')) AS BIGINT),
        |  CAST(CASE WHEN count(*) FILTER (WHERE l_returnflag IS NULL OR l_returnflag NOT IN ('A', 'N')) = 0 THEN 1 ELSE 0 END AS BIGINT)
        |FROM lineitem
        |UNION ALL SELECT 'matches_regex', 'l_linestatus',
        |  CAST(count(*) FILTER (WHERE l_linestatus IS NULL OR NOT regexp_full_match(l_linestatus, '(?:[OF])')) AS BIGINT),
        |  CAST(CASE WHEN count(*) FILTER (WHERE l_linestatus IS NULL OR NOT regexp_full_match(l_linestatus, '(?:[OF])')) = 0 THEN 1 ELSE 0 END AS BIGINT)
        |FROM lineitem
        |UNION ALL SELECT 'unique', 'l_orderkey,l_linenumber',
        |  CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
        |  CAST(CASE WHEN count(*) - count(DISTINCT (l_orderkey, l_linenumber)) = 0 THEN 1 ELSE 0 END AS BIGINT)
        |FROM lineitem
        |UNION ALL SELECT 'unique', 'l_orderkey',
        |  CAST(count(*) - count(DISTINCT l_orderkey) AS BIGINT),
        |  CAST(CASE WHEN count(*) - count(DISTINCT l_orderkey) = 0 THEN 1 ELSE 0 END AS BIGINT)
        |FROM lineitem
        |UNION ALL SELECT 'ref_integrity', 'l_orderkey',
        |  CAST((SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
        |        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
        |  CAST(CASE WHEN (SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
        |        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) = 0 THEN 1 ELSE 0 END AS BIGINT)
        |UNION ALL SELECT 'min_rows', '',
        |  CAST(GREATEST(0, 1000 - (SELECT count(*) FROM lineitem)) AS BIGINT),
        |  CAST(CASE WHEN (SELECT count(*) FROM lineitem) >= 1000 THEN 1 ELSE 0 END AS BIGINT)""".stripMargin,
    // q183: identical delta construction; the cumulative window runs
    // over the bounded day table (fine single-node — the engine's
    // point is avoiding exactly that shape distributed).
    "q183_in_transit" ->
      """WITH iv AS (SELECT CAST(l_shipdate AS DATE) AS s,
        |    CAST(l_shipdate AS DATE) + CAST(l_orderkey % 25 + 3 AS INT) AS e
        |  FROM lineitem),
        |d AS (SELECT s AS day, 1 AS dd FROM iv
        |      UNION ALL SELECT e, -1 FROM iv),
        |g AS (SELECT day, CAST(sum(dd) AS BIGINT) AS net FROM d GROUP BY 1)
        |SELECT CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS day,
        |  net, CAST(sum(net) OVER (ORDER BY day) AS BIGINT) AS in_transit
        |FROM g""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(REV) AS DOUBLE) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
        .replace("REV", DuckRevenue),

    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(REV, 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_quantity < 24""".stripMargin
        .replace("REV", DuckRevenue),

    "q3_join_broadcast" ->
      """SELECT r_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q4_join_facts" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(sum(REV) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin
        .replace("REV", DuckRevenue),

    "q5_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q6_window_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders) WHERE rnk <= 3""".stripMargin,

    "q7_setops" ->
      """WITH custs AS (SELECT c_custkey AS k FROM customer),
        |buyers AS (SELECT DISTINCT o_custkey AS k FROM orders)
        |SELECT k, 'buyer' AS tag FROM (SELECT k FROM custs INTERSECT SELECT k FROM buyers)
        |UNION ALL
        |SELECT k, 'no_orders' AS tag FROM (SELECT k FROM custs EXCEPT SELECT k FROM buyers)""".stripMargin,

    "q8_semi_anti" ->
      """SELECT s_suppkey, 'active' AS status FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
        |UNION ALL
        |SELECT s_suppkey, 'inactive' AS status FROM supplier
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)""".stripMargin,

    "q9_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q10_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q11_scalar_fns" ->
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |  CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS bucket,
        |  upper(substring(o_orderstatus, 1, 1)) AS st,
        |  count(*) AS cnt
        |FROM orders GROUP BY 1, 2, 3, 4""".stripMargin,

    // Oracle groups by l_suppkey (the key Spark groups on), then joins the
    // dim — structurally identical grouping, robust to duplicate s_name.
    "q12_having" ->
      """SELECT s_name, n_lines, total_qty FROM (
        |  SELECT l_suppkey, count(*) AS n_lines,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |  FROM lineitem GROUP BY l_suppkey HAVING count(*) >= 100
        |) JOIN supplier ON l_suppkey = s_suppkey""".stripMargin,

    // q135: identical windows — total orderings via the orderkey
    // tiebreak, epoch-microsecond floor division for the day gap,
    // percent_rank/ntile/cume_dist standard-SQL on both engines.
    "q135_window_suite" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(row_number() OVER w_date AS BIGINT) AS order_seq,
        |  (epoch_us(o_orderdate) - epoch_us(lag(o_orderdate) OVER w_date))
        |    // 86400000000 AS gap_days,
        |  percent_rank() OVER w_price AS price_pct,
        |  CAST(ntile(4) OVER w_price AS BIGINT) AS price_quartile,
        |  cume_dist() OVER w_price AS price_cume
        |FROM orders
        |WINDOW w_date AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  w_price AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)""".stripMargin,

    // q146: same bucket agg; `//` = `div` on non-negative keys; same
    // observed-domain capacity clamp at the key-space edges.
    "q146_id_gaps" ->
      """WITH f AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 97 <> 13),
        |g AS (SELECT min(o_orderkey) AS gmin, max(o_orderkey) AS gmax FROM f),
        |b AS (SELECT o_orderkey // 1000 AS bucket, count(*) AS n_present,
        |        min(o_orderkey) AS lo, max(o_orderkey) AS hi
        |      FROM f GROUP BY 1)
        |SELECT bucket, n_present,
        |  least(bucket * 1000 + 999, gmax) - greatest(bucket * 1000, gmin)
        |    + 1 - n_present AS n_missing, lo, hi
        |FROM b, g
        |WHERE least(bucket * 1000 + 999, gmax) - greatest(bucket * 1000, gmin)
        |    + 1 - n_present > 0""".stripMargin,

    // q164: the identical correlated text — DuckDB unnests it the same
    // way (a NULL-count from the decorrelated join reads as 0 via
    // count(*)'s scalar-subquery semantics on both engines).
    "q164_correlated" ->
      """SELECT p_partkey, p_retailprice,
        |  (SELECT count(*) FROM lineitem l
        |   WHERE l.l_partkey = p.p_partkey
        |     AND l.l_extendedprice > p.p_retailprice) AS n_pricier
        |FROM part p""".stripMargin,

    // q189: the PLAIN join — salting is internal plumbing the result
    // must be invariant to, which is exactly what this compare pins.
    "q189_salted_join" ->
      """SELECT n_name, count(*) AS n_cust,
        |  min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,

    // q136: same collapse → block → candidate+verify chain; DuckDB's
    // levenshtein is the same unit-cost edit distance as Spark's.
    "q136_fuzzy_pairs" ->
      """WITH names AS (SELECT p_name AS s, min(p_partkey) AS id FROM part GROUP BY 1),
        |b AS (SELECT s, id, string_split(s, ' ')[1] AS bk FROM names)
        |SELECT a.id AS id1, c.id AS id2, a.s AS s1, c.s AS s2,
        |  CAST(levenshtein(a.s, c.s) AS BIGINT) AS dist
        |FROM b a JOIN b c ON a.bk = c.bk AND a.id < c.id
        |WHERE levenshtein(a.s, c.s) <= 3""".stripMargin,

    // q236: the skipping card replayed — the same compact Morton
    // interleave (per-dim bit widths = bitLen of the key maxima, level-b
    // bits packed together), the same smallest-shift bucket width
    // (min b with maxKey >> b < 2^6), the same min/max envelope
    // intersection test. All integers; read_frac is one IEEE division.
    "q236_zorder_card" -> duckZorderCard(lo1 = 1, hi1 = 500, lo2 = 1, hi2 = 25)
  )

  /** [[graft.operators.Layout.zValue]]'s COMPACT 2-dim interleave as a SQL
    * expression over scalar bit widths b1/b2 (from the `bl` CTE): dim
    * 1's bit b lands at position b + min(b, b2); dim 2's at
    * b + min(b, b1) + [b < b1]. Unrolled to 31 levels — terms above a
    * key's actual width contribute 0 (the bit is 0), matching the Scala
    * side's data-derived widths exactly. */
  private def duckZ(c1: String, c2: String): String =
    (0 until 31).flatMap(b => Seq(
      s"((($c1 >> $b) & 1) << ($b + least($b, bl.b2)))",
      s"((($c2 >> $b) & 1) << ($b + least($b, bl.b1) + " +
        s"(CASE WHEN $b < bl.b1 THEN 1 ELSE 0 END)))")).mkString(" + ")

  private def duckZorderCard(lo1: Long, hi1: Long, lo2: Long,
      hi2: Long): String =
    s"""WITH mx0 AS (SELECT max(l_partkey) AS mp, max(l_suppkey) AS ms FROM lineitem),
       |bs AS (SELECT unnest(generate_series(0, 63)) AS b),
       |bl AS (SELECT (SELECT min(b) FROM bs, mx0 WHERE (mx0.mp >> b) = 0) AS b1,
       |              (SELECT min(b) FROM bs, mx0 WHERE (mx0.ms >> b) = 0) AS b2),
       |zs AS (SELECT l_partkey AS p, l_suppkey AS s2,
       |    ${duckZ("l_partkey", "l_suppkey")} AS z,
       |    CASE WHEN l_partkey BETWEEN $lo1 AND $hi1
       |          AND l_suppkey BETWEEN $lo2 AND $hi2 THEN 1 ELSE 0 END AS m
       |  FROM lineitem, bl),
       |mx AS (SELECT max(p) AS ml, max(z) AS mz FROM zs),
       |shl AS (SELECT min(b) AS v FROM bs, mx WHERE (mx.ml >> b) < 64),
       |shz AS (SELECT min(b) AS v FROM bs, mx WHERE (mx.mz >> b) < 64),
       |r AS (SELECT 'linear' AS layout, p >> (SELECT v FROM shl) AS bucket,
       |        p, s2, m FROM zs
       |      UNION ALL
       |      SELECT 'zorder', z >> (SELECT v FROM shz), p, s2, m FROM zs),
       |pb AS (SELECT layout, bucket, min(p) AS mnp, max(p) AS mxp,
       |         min(s2) AS mns, max(s2) AS mxs,
       |         count(*) AS n, sum(m) AS nm
       |       FROM r GROUP BY 1, 2),
       |pr AS (SELECT *, (mnp <= $hi1 AND mxp >= $lo1 AND
       |                  mns <= $hi2 AND mxs >= $lo2) AS rd FROM pb)
       |SELECT layout,
       |  CAST(count(*) AS BIGINT) AS buckets_total,
       |  CAST(sum(CASE WHEN rd THEN 1 ELSE 0 END) AS BIGINT) AS buckets_read,
       |  CAST(sum(n) AS BIGINT) AS rows_total,
       |  CAST(sum(CASE WHEN rd THEN n ELSE 0 END) AS BIGINT) AS rows_read,
       |  CAST(sum(nm) AS BIGINT) AS rows_match,
       |  CAST(sum(CASE WHEN rd THEN n ELSE 0 END) AS DOUBLE) /
       |    CAST(sum(n) AS DOUBLE) AS read_frac
       |FROM pr GROUP BY 1""".stripMargin
}
