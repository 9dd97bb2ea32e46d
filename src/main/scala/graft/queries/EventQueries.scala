package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Stable
import graft.sources.{SplitSource, Synthetic, Tables}

/** Split assignment, synthetic generators, and event-time operators
  * (tumbling windows, gap sessionization) over the `events` table — the
  * batch twins of the Structured Streaming path in graft.streaming. */
object EventQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic train/valid/test assignment by hashed key (H5PY split
    // analog). Output: per-split counts.
    "q32_split_assign" -> ((s, dir) => {
      SplitSource.assignSplit(t(s, dir, "customer"), col("c_custkey"), seed = 42,
          weights = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
        .groupBy("split").agg(count(lit(1)).as("n"))
    }),

    // Seeded synthetic generator: Spiral label distribution (the float
    // geometry is covered in SyntheticSpec; the oracle checks the integer
    // class assignment bit-for-bit).
    "q33_spiral" -> ((s, _) => {
      Synthetic.spiral(s, numExamples = 2000, classes = 3, cycles = 1.0, seed = 7)
        .groupBy("label").agg(count(lit(1)).as("n"))
    }),

    // Tumbling 5-minute event-time windows (batch twin of the streaming
    // windowed aggregation; same window() operator). The window key is
    // emitted as epoch seconds: a constructed timestamp column types
    // differently across engines (DuckDB to_timestamp → TIMESTAMPTZ vs
    // Spark's TIMESTAMP), which failed the r2 schema compare; the integer
    // start instant is representation-independent.
    "q34_events_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .select(col("w.start").cast("long").as("win_start_s"), col("event_type"),
          col("n_events"), col("sum_value"))
    }),

    // Seeded deterministic sample: a pure row-property Bernoulli filter,
    // reproducible across engines (unlike rand()-based sample()).
    "q38_sample" -> ((s, dir) => {
      SplitSource.sample(t(s, dir, "orders"), col("o_orderkey"), seed = 11, fraction = 0.1)
        .select("o_orderkey", "o_custkey")
    }),

    // CUBE over two dimensions (completes the rollup/cube/grouping-sets
    // line of SURVEY §2.6).
    "q37_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
        .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"), col("cnt"))
    }),

    // As-of backward join: each purchase matched to the user's latest
    // click at or before it. One key shuffle (union + per-key window) —
    // never the naive range join. Oracle = DuckDB's NATIVE ASOF LEFT JOIN,
    // so the operator's semantics are checked against a reference
    // implementation of as-of, not a re-derivation.
    "q44_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click").select("user_id", "ts")
      // Output timestamps as integer epoch micros: DuckDB's ASOF coerces
      // TIMESTAMP_NS to TIMESTAMP, so raw timestamp columns type-mismatch
      // even when every value is equal (same lesson as q34).
      graft.operators.AsOf.asofBackward(purchases, clicks, "user_id", "ts", "last_click_ts")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("purchase_ts_us"),
          unix_micros(col("last_click_ts")).as("last_click_ts_us"))
    }),

    // Stratified rebalancing sample over documents: downsample dominant
    // English to 30%, keep rare languages at 100% — per-stratum seeded
    // Bernoulli, a pure pushed-down filter (no shuffle, no sampleBy RNG).
    "q41_stratified" -> ((s, dir) => {
      SplitSource.stratifiedSample(t(s, dir, "documents"),
          col("lang"), col("doc_id"), seed = 5,
          fractions = Seq("en" -> 0.3, "zh" -> 1.0, "es" -> 1.0),
          defaultFraction = 0.5)
        .groupBy("lang").agg(count(lit(1)).as("n"))
    }),

    // Arbitrary GROUPING SETS (beyond the rollup/cube hierarchies):
    // per-flag and per-status marginals in one pass through the SQL entry
    // point.
    "q42_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("li_gs")
      s.sql("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
              |  coalesce(l_linestatus, 'ALL') AS linestatus,
              |  count(*) AS cnt
              |FROM li_gs
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin)
    }),

    // Deterministic event-time dedup: each (user, event_type)'s earliest
    // event plus the suppressed-duplicate count — the oracled batch twin
    // of the streaming dedup path (dropDuplicatesWithinWatermark keeps the
    // first ARRIVAL; the (ts, event_id) order makes that well-defined, and
    // StreamingSpec asserts the two agree on an event-time-ordered
    // replay). Timestamps emitted as epoch micros (the q44 type lesson).
    "q54_event_dedup" -> ((s, dir) => {
      graft.dedup.Dedup.firstPerKey(t(s, dir, "events"),
          Seq("user_id", "event_type"), "ts", "event_id")
        .select(col("user_id"), col("event_type"),
          col("event_id").as("first_event_id"),
          unix_micros(col("ts")).as("first_ts_us"), col("n_dups"))
    }),

    // Gap-based sessionization: a new session when >30 min passes between a
    // user's events. Per-user window — scale-safe (users are many, sessions
    // short).
    "q35_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("gap_s",
          col("ts").cast("double") - lag(col("ts").cast("double"), 1).over(byUser))
        .withColumn("new_session",
          when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
        .withColumn("session_id", sum("new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))
    }),

    // Strict-order funnel ([[graft.operators.Events.funnel]]): users
    // whose first view follows their first signup, and whose first
    // purchase follows THAT view — per-step user counts and the
    // conversion fraction (long/long). Step k is one filtered user-
    // keyed min-agg joined to step k-1's per-user frame; the event
    // stream never sees a window.
    "q125_funnel" -> ((s, dir) =>
      graft.operators.Events.funnel(t(s, dir, "events"),
        "user_id", "event_type", "ts", Seq("signup", "view", "purchase"))),

    // Weekly retention cohorts ([[graft.operators.Events.retentionCohorts]]):
    // cohort = ISO week of the user's first event (Monday-start in both
    // engines), cells = distinct cohort users active at each week
    // offset — the retention-curve matrix, exact integers throughout.
    "q126_retention" -> ((s, dir) =>
      graft.operators.Events.retentionCohorts(t(s, dir, "events"),
        "user_id", "ts")),

    // Top session journeys ([[graft.operators.Events.topJourneys]]):
    // q35's sessions, each reduced to its ordered event-type path,
    // ranked by frequency — the user-flow table. TakeOrdered top-20 by
    // (count DESC, path ASC); deterministic assembly order via
    // (ts, event_id).
    "q127_top_journeys" -> ((s, dir) =>
      graft.operators.Events.topJourneys(t(s, dir, "events"),
        "user_id", "event_type", "ts", "event_id")),

    // Semi-structured JSON property analytics: the events table's
    // `props` column parsed in-flight (codegen get_json_object — no
    // UDF, no pre-flattening ETL) and aggregated per event type —
    // Spark's semi-structured tier against DuckDB's JSON extension.
    // All integer outputs.
    "q128_json_props" -> ((s, dir) =>
      t(s, dir, "events").select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          coalesce(sum(col("k")), lit(0L)).as("sum_k"),
          count_distinct(col("k")).as("n_distinct_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))),

    // Interval self-join ([[graft.operators.Events.withinWindowPairs]]):
    // same-user event pairs within 60 s — the engine runs the bucketed
    // candidate+verify form (the LSH shape applied to time; a plain
    // range self-join plans per-user cartesians), the oracle the naive
    // quadratic join; identical microsecond-exact pair sets certify
    // the rewrite.
    "q129_window_pairs" -> ((s, dir) =>
      graft.operators.Events.withinWindowPairs(t(s, dir, "events"),
        "user_id", "ts", "event_id", deltaSeconds = 60)),

    // Regular-grid resample + forward fill ([[graft.operators.Events
    // .resampleFfill]]): each user's event stream on a hourly grid,
    // gaps carried forward from the bucket's last observation ((ts,
    // event_id)-total order) — the fixed-rate sequence preprocessor.
    // Values are carried, never summed, so doubles stay bit-exact.
    "q138_resample_ffill" -> ((s, dir) =>
      graft.operators.Events.resampleFfill(t(s, dir, "events"),
        "user_id", "ts", "value", "event_id", bucketSeconds = 3600)),

    // OHLC bars ([[graft.operators.Events.ohlc]]): hourly open/high/
    // low/close of `value` per user — carried values via (ts,
    // event_id)-ordered struct extrema, no double ever summed.
    "q140_ohlc" -> ((s, dir) =>
      graft.operators.Events.ohlc(t(s, dir, "events"),
        "user_id", "ts", "value", "event_id", bucketSeconds = 3600)),

    // SLIDING event-time windows (10-minute length, 5-minute slide):
    // every event lands in exactly two overlapping windows — the
    // smoothed-rate view q34's tumbling windows cannot give. Same
    // epoch-aligned window() operator, streaming-identical semantics.
    "q154_sliding_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("w.start").cast("long").as("win_start_s"),
          col("event_type"), col("n_events"))),

    // NATIVE gap session windows (session_window — the built-in whose
    // manual twin is q35's lag/sum chain): per-user 30-minute-gap
    // sessions with [first, last+gap) bounds. The boundary differs
    // from q35 BY CONTRACT: session_window's end is exclusive, so an
    // exactly-30-minute gap starts a NEW session (q35's `>` keeps it)
    // — the oracle replays the native rule in microseconds.
    "q155_session_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("w.start").cast("long").as("session_start_s"),
          col("w.end").cast("long").as("session_end_s"), col("n_events"))),

    // Trailing RANGE-frame rolling aggregates: per-user hourly activity
    // with 3-hour trailing sums — the RANGE frame (value-based, so
    // missing buckets shrink the window — the correct time semantics a
    // ROWS frame gets wrong on gaps). Counts are longs; the value sum
    // runs in DECIMAL and casts to double only at the edge.
    "q144_rolling" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = t(s, dir, "events")
        .groupBy(col("user_id"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000").as("__b"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).as("__v"))
      val w = Window.partitionBy("user_id").orderBy("__b").rangeBetween(-2, 0)
      hourly.select(col("user_id"), (col("__b") * 3600).as("bucket_start_s"),
        col("n"), sum(col("n")).over(w).as("n_3h"),
        sum(col("__v")).over(w).cast("double").as("v_3h"))
    }),

    // SCD type-2 dimension build ([[graft.operators.Events.scd2]]): the
    // event stream compressed into per-user validity intervals over a
    // derived "tier" attribute (floor(value/50) — coarse enough that
    // consecutive-equal runs actually collapse, so the change gate is
    // exercised, not vacuous). Timestamps exit as epoch micros (the q44
    // representation lesson); is_current as INT. Both windows partition
    // by the uniform user key — the PlanSpec no-unpartitioned-window
    // audit holds, and Catalyst reuses one exchange+sort for the pair.
    // Theil–Sen robust trend ([[graft.operators.Events.theilSenTrend]]):
    // the median pairwise slope per type on the ppm grid — the
    // outlier-proof line beside q181's OLS.
    "q187_theil_sen" -> ((s, dir) =>
      graft.operators.Events.theilSenTrend(t(s, dir, "events"),
        "event_type", "ts")),

    // Burstiness card ([[graft.operators.Events.burstiness]]): CV² of
    // per-(user, type) inter-event gaps on the second grid — Poisson
    // reads 1, bursts read higher.
    "q186_burstiness" -> ((s, dir) =>
      graft.operators.Events.burstiness(t(s, dir, "events"),
        "event_type", "user_id", "ts", "event_id")),

    // Lagged cross-correlation ([[graft.operators.Events
    // .crossCorrelation]]): lead-lag Pearson r between each ordered
    // pair of daily event series at lags 0-3 — exact sums, one
    // division, inner day alignment.
    "q184_cross_correlation" -> ((s, dir) =>
      graft.operators.Events.crossCorrelation(t(s, dir, "events"),
        "event_type", "ts")),

    // Z-order layout keys ([[graft.operators.Layout.mortonKey]] /
    // `zoneMapReport`): Morton keys over (user_id, epoch day) and the
    // per-bucket zone-map statistics a reader's file pruning
    // consults — the write-side layout primitive for 100 TB scans.
    "q182_zorder" -> ((s, dir) =>
      graft.operators.Layout.zoneMapReport(
        t(s, dir, "events").select(col("user_id"),
          unix_date(to_date(col("ts"))).cast("bigint").as("day")),
        "user_id", "day", bucketShift = 10)),

    // Daily OLS trend ([[graft.operators.Events.dailyTrend]]): slope
    // and intercept of daily counts per type from five exact long
    // sums — drift, beside q178's level shifts.
    "q181_daily_trend" -> ((s, dir) =>
      graft.operators.Events.dailyTrend(t(s, dir, "events"),
        "event_type", "ts")),

    // Seasonality heatmap ([[graft.operators.Events.activityProfile]]):
    // the 7×24 weekday/hour grid per event type with ppm shares.
    "q179_seasonality" -> ((s, dir) =>
      graft.operators.Events.activityProfile(t(s, dir, "events"),
        "event_type", "ts")),

    // Session-basket co-occurrence ([[graft.operators.Events
    // .sessionCooccurrence]]): which event types share sessions, with
    // integer-ppm lift — the market-basket table over the q35 session
    // cut.
    "q180_cooccurrence" -> ((s, dir) =>
      graft.operators.Events.sessionCooccurrence(t(s, dir, "events"),
        "user_id", "event_type", "ts", "event_id")),

    // CUSUM change point ([[graft.operators.Events.changePoint]]): the
    // day each event type's daily level shifted, integer-scaled
    // statistic, ties to the earliest day.
    "q178_change_point" -> ((s, dir) =>
      graft.operators.Events.changePoint(t(s, dir, "events"),
        "event_type", "ts")),

    // Conversion-lag distribution ([[graft.operators.Events
    // .conversionLags]] → [[graft.text.TextOps.quantileCard]]): first
    // view → first subsequent purchase per user, second-grid lags,
    // histogram-exact p50/p90/p99 COHORTED by the anchor's weekday
    // (a real partition key — a constant cohort would constant-fold
    // quantileCard's window unpartitioned).
    "q177_conversion_lag" -> ((s, dir) =>
      graft.text.TextOps.quantileCard(
        graft.operators.Events.conversionLags(t(s, dir, "events"),
          "user_id", "event_type", "ts", "view", "purchase")
          .select(weekday(timestamp_micros(col("from_us"))).cast("bigint")
              .as("view_dow"),
            expr("lag_us div 1000000").as("lag_s")),
        "view_dow", "lag_s")),

    // The SALTED conversion-lag path ([[graft.operators.Events
    // .conversionLags]] with salt = 16 → [[graft.operators.Skew
    // .saltedJoin]]): the production call site for explicit salting —
    // AQE's skew splitter is suppressed at this join by the same-key
    // aggregate downstream (measured in PlanSpec), so a flooding user
    // is spread across 16 salt lanes by construction. Same oracle
    // shape as q177's interior: salting is semantics-preserving.
    "q192_conversion_lag_salted" -> ((s, dir) =>
      graft.operators.Events.conversionLags(t(s, dir, "events"),
        "user_id", "event_type", "ts", "view", "purchase", salt = 16)),

    // Markov transition matrix ([[graft.operators.Events
    // .transitionMatrix]]): sessionized first-order transitions with
    // __start/__end boundary states, row-normalized on the integer
    // ppm grid — the factored form of q127's whole-path journeys.
    "q170_transitions" -> ((s, dir) =>
      graft.operators.Events.transitionMatrix(t(s, dir, "events"),
        "user_id", "event_type", "ts", "event_id")),

    "q168_scd2" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"), col("ts"),
        col("event_id"), floor(col("value") / 50).cast("long").as("tier"))
      graft.operators.Events.scd2(ev, "user_id", "ts", "tier", "event_id")
        .select(col("user_id"), col("version"),
          unix_micros(col("valid_from")).as("valid_from_us"),
          unix_micros(col("valid_to")).as("valid_to_us"),
          col("tier"), col("is_current"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q32_split_assign" -> {
      val b = s"pmod_b"
      s"""SELECT CASE WHEN $b < 800 THEN 'train' WHEN $b < 900 THEN 'valid'
         |            ELSE 'test' END AS split, count(*) AS n
         |FROM (SELECT ${Stable.duckSeededHash(42, "c_custkey")} % 1000 AS $b
         |      FROM customer)
         |GROUP BY 1""".stripMargin
    },

    "q33_spiral" ->
      s"""SELECT CAST(floor(${Stable.duckSeededHash(7 + 1000003, "id")}
         |  / 1152921504606846976.0 * 3) AS INT) AS label, count(*) AS n
         |FROM range(2000) t(id)
         |GROUP BY 1""".stripMargin,

    "q34_events_window" ->
      """SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS win_start_s, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q38_sample" ->
      s"""SELECT o_orderkey, o_custkey FROM orders
         |WHERE ${Stable.duckSeededHash(11, "o_orderkey")} % 1000 < 100""".stripMargin,

    "q44_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS purchase_ts_us,
        |  epoch_us(c.ts) AS last_click_ts_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts""".stripMargin,

    "q41_stratified" ->
      s"""SELECT lang, count(*) AS n FROM documents
         |WHERE ${Stable.duckSeededHash(5, "doc_id")} % 1000 <
         |  CASE lang WHEN 'en' THEN 300 WHEN 'zh' THEN 1000 WHEN 'es' THEN 1000
         |            ELSE 500 END
         |GROUP BY lang""".stripMargin,

    "q42_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus, count(*) AS cnt
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,

    "q37_cube" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        |  coalesce(o_orderstatus, 'ALL') AS status, count(*) AS cnt
        |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin,

    "q54_event_dedup" ->
      """WITH r AS (
        |  SELECT user_id, event_type, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id, event_type) AS n_dups
        |  FROM events)
        |SELECT user_id, event_type, event_id AS first_event_id,
        |  epoch_us(ts) AS first_ts_us, CAST(n_dups AS BIGINT) AS n_dups
        |FROM r WHERE rn = 1""".stripMargin,

    "q35_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM g),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events, min(ts) AS session_start
        |FROM s GROUP BY user_id, session_id""".stripMargin,

    // q125: one conditional-min CTE per step, each anchored to the
    // previous step's per-user first time; counts + long/long
    // conversion.
    "q125_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |       JOIN s1 ON s1.user_id = e.user_id
        |       WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |       JOIN s2 ON s2.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id),
        |n AS (SELECT 1 AS step, 'signup' AS event_type,
        |             (SELECT count(*) FROM s1) AS n_users
        |      UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
        |      UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        |SELECT CAST(step AS BIGINT) AS step, event_type,
        |  CAST(n_users AS BIGINT) AS n_users,
        |  CASE WHEN (SELECT count(*) FROM s1) > 0
        |       THEN CAST(n_users AS DOUBLE) /
        |            CAST((SELECT count(*) FROM s1) AS DOUBLE)
        |       ELSE 0.0 END AS conversion
        |FROM n""".stripMargin,

    // q126: week-truncated firsts and activity, day-difference div 7.
    "q126_retention" ->
      """WITH w AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort FROM w GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, wk FROM w)
        |SELECT c.cohort AS cohort_week,
        |  CAST(date_diff('day', c.cohort, a.wk) // 7 AS BIGINT) AS week_offset,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
        |FROM a JOIN c ON c.user_id = a.user_id
        |GROUP BY 1, 2""".stripMargin,

    // q127: q35's session CTEs + ordered string_agg paths + the
    // (count DESC, path ASC) rank limit.
    "q127_top_journeys" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM g),
        |s AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM f),
        |p AS (
        |  SELECT user_id, session_id,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM s GROUP BY user_id, session_id),
        |c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        |      FROM p GROUP BY path)
        |SELECT path, n_sessions FROM c
        |ORDER BY n_sessions DESC, path ASC LIMIT 20""".stripMargin,

    // q129: the NAIVE quadratic self-join — the point of the oracle is
    // that the engine's bucketed rewrite emits the identical pair set.
    "q129_window_pairs" ->
      """SELECT a.user_id, a.event_id AS e1, b.event_id AS e2,
        |  epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |WHERE (epoch_us(b.ts) > epoch_us(a.ts)
        |       OR (epoch_us(b.ts) = epoch_us(a.ts) AND b.event_id > a.event_id))
        |  AND epoch_us(b.ts) - epoch_us(a.ts) <= 60000000""".stripMargin,

    // q128: the same extraction through DuckDB's JSON extension.
    "q128_json_props" ->
      """WITH k AS (SELECT event_type,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k,
        |  CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k,
        |  CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k
        |FROM k GROUP BY event_type""".stripMargin,

    // q138: per-bucket last observation via DESC row_number (the struct
    // max's twin), per-key generate_series grid, IGNORE NULLS running
    // last_value — values carried verbatim, bit-exact doubles.
    "q138_resample_ffill" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) // 3600000000 AS b, ts,
        |              event_id, value FROM events),
        |obs AS (SELECT user_id, b, value FROM (
        |          SELECT user_id, b, value, row_number() OVER (
        |            PARTITION BY user_id, b ORDER BY ts DESC, event_id DESC) AS rn
        |          FROM ev) WHERE rn = 1),
        |sp AS (SELECT user_id, min(b) AS lo, max(b) AS hi FROM obs GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(lo, hi)) AS b FROM sp),
        |j AS (SELECT g.user_id, g.b, o.value AS v
        |      FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.b = o.b)
        |SELECT user_id, b * 3600 AS bucket_start_s,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY b
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |  CAST(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS observed
        |FROM j""".stripMargin,

    // q154: the two epoch-aligned 5-minute starts covering each event.
    "q154_sliding_window" ->
      """WITH e AS (SELECT epoch_us(ts) // 1000000 AS t, event_type FROM events),
        |x AS (SELECT t, event_type,
        |        unnest([(t // 300) * 300, (t // 300) * 300 - 300]) AS s
        |      FROM e)
        |SELECT s AS win_start_s, event_type, count(*) AS n_events
        |FROM x GROUP BY 1, 2""".stripMargin,

    // q155: gap rule in MICROSECONDS (sub-second gaps must round the
    // same way Spark compares them); start/end floor to seconds at the
    // output edge only. `>= gap` = the native exclusive-end boundary.
    "q155_session_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tu, event_id FROM events),
        |o AS (SELECT user_id, tu,
        |        CASE WHEN lag(tu) OVER w IS NULL
        |               OR tu - lag(tu) OVER w >= 1800000000 THEN 1 ELSE 0 END AS ns
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)),
        |s AS (SELECT user_id, tu,
        |        sum(ns) OVER (PARTITION BY user_id ORDER BY tu
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM o)
        |SELECT user_id, min(tu) // 1000000 AS session_start_s,
        |  (max(tu) + 1800000000) // 1000000 AS session_end_s,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,

    // q144: identical RANGE frame; DECIMAL window sum cast once.
    "q144_rolling" ->
      """WITH h AS (SELECT user_id, epoch_us(ts) // 3600000000 AS b,
        |             count(*) AS n, sum(CAST(value AS DECIMAL(18,6))) AS v
        |           FROM events GROUP BY 1, 2)
        |SELECT user_id, b * 3600 AS bucket_start_s, CAST(n AS BIGINT) AS n,
        |  CAST(sum(n) OVER w AS BIGINT) AS n_3h,
        |  CAST(sum(v) OVER w AS DOUBLE) AS v_3h
        |FROM h
        |WINDOW w AS (PARTITION BY user_id ORDER BY b
        |             RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,

    // q140: open/close via ASC/DESC row_number (the struct extrema's
    // twin), high/low plain min/max — every value carried or compared,
    // never summed.
    "q140_ohlc" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) // 3600000000 AS b, ts,
        |              event_id, value FROM events),
        |r AS (SELECT user_id, b, value,
        |        row_number() OVER (PARTITION BY user_id, b
        |          ORDER BY ts ASC, event_id ASC) AS ro,
        |        row_number() OVER (PARTITION BY user_id, b
        |          ORDER BY ts DESC, event_id DESC) AS rc
        |      FROM ev)
        |SELECT user_id, b * 3600 AS bucket_start_s,
        |  min(CASE WHEN ro = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  min(CASE WHEN rc = 1 THEN value END) AS close,
        |  count(*) AS n_events
        |FROM r GROUP BY user_id, b""".stripMargin,

    // q187: same pairwise fan-out over the daily table, same micro-
    // floored slope grid and 2·cum ≥ tot lower median.
    "q187_theil_sen" ->
      """WITH d AS (SELECT event_type AS t,
        |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.t,
        |        CAST(floor(1000000.0 * CAST(b.x - a.x AS DOUBLE) /
        |          CAST(b.day - a.day AS DOUBLE)) AS BIGINT) AS s
        |      FROM d a JOIN d b ON b.t = a.t AND a.day < b.day),
        |h AS (SELECT t, s, count(*) AS c FROM p GROUP BY 1, 2),
        |w AS (SELECT t, s, c, sum(c) OVER (PARTITION BY t ORDER BY s) AS cum,
        |        sum(c) OVER (PARTITION BY t) AS tot FROM h)
        |SELECT t AS event_type, CAST(max(tot) AS BIGINT) AS n_pairs,
        |  CAST(min(CASE WHEN cum * 2 >= tot THEN s END) AS BIGINT)
        |    AS slope_ppm
        |FROM w GROUP BY t""".stripMargin,

    // q186: same per-(user, type) lag, same integer-second grid and
    // exact-sum CV² reformulation.
    "q186_burstiness" ->
      """WITH g AS (SELECT event_type,
        |    (epoch_us(ts) - lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id, event_type ORDER BY ts, event_id))
        |      // 1000000 AS gp
        |  FROM events),
        |a AS (SELECT event_type, count(*) AS n_gaps,
        |        CAST(sum(gp) AS BIGINT) AS sum_gap_s,
        |        CAST(sum(gp * gp) AS BIGINT) AS sg2
        |      FROM g WHERE gp IS NOT NULL GROUP BY 1)
        |SELECT event_type, n_gaps, sum_gap_s,
        |  CAST(sum_gap_s AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_s,
        |  (CAST(n_gaps AS DOUBLE) * CAST(sg2 AS DOUBLE)
        |    - CAST(sum_gap_s AS DOUBLE) * CAST(sum_gap_s AS DOUBLE)) /
        |    (CAST(sum_gap_s AS DOUBLE) * CAST(sum_gap_s AS DOUBLE)) AS cv2
        |FROM a WHERE sum_gap_s > 0""".stripMargin,

    // q184: same daily table, lag fan-out via generate_series, day-
    // keyed self-join, q162's product-then-divide order.
    "q184_cross_correlation" ->
      """WITH d AS (SELECT event_type AS t,
        |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT t AS type_a, day, x AS xa,
        |        unnest(generate_series(0, 3)) AS lag FROM d),
        |j AS (SELECT a.type_a, b.t AS type_b, a.lag, a.xa, b.x AS xb
        |      FROM a JOIN d b ON b.day = a.day + a.lag AND b.t <> a.type_a),
        |g AS (SELECT type_a, type_b, CAST(lag AS BIGINT) AS lag,
        |        count(*) AS n, CAST(sum(xa) AS BIGINT) AS sx,
        |        CAST(sum(xb) AS BIGINT) AS sy,
        |        CAST(sum(xa * xb) AS BIGINT) AS sxy,
        |        CAST(sum(xa * xa) AS BIGINT) AS sxx,
        |        CAST(sum(xb * xb) AS BIGINT) AS syy
        |      FROM j GROUP BY 1, 2, 3)
        |SELECT type_a, type_b, lag, n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |         (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r
        |FROM g
        |WHERE CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |  AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0""".stripMargin,

    // q182: the same five shift-or-mask spread rounds staged through
    // CTEs (x on even bits, y << 1 on odd); DuckDB's checked << stays
    // in range because every stage pre-masks — same reasoning as the
    // engine's 31-bit domain contract.
    "q182_zorder" ->
      """WITH b AS (SELECT user_id AS x0,
        |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS y0 FROM events),
        |s1 AS (SELECT x0, y0, (x0 | (x0 << 16)) & 281470681808895 AS x,
        |         (y0 | (y0 << 16)) & 281470681808895 AS y FROM b),
        |s2 AS (SELECT x0, y0, (x | (x << 8)) & 71777214294589695 AS x,
        |         (y | (y << 8)) & 71777214294589695 AS y FROM s1),
        |s3 AS (SELECT x0, y0, (x | (x << 4)) & 1085102592571150095 AS x,
        |         (y | (y << 4)) & 1085102592571150095 AS y FROM s2),
        |s4 AS (SELECT x0, y0, (x | (x << 2)) & 3689348814741910323 AS x,
        |         (y | (y << 2)) & 3689348814741910323 AS y FROM s3),
        |s5 AS (SELECT x0, y0, (x | (x << 1)) & 6148914691236517205 AS x,
        |         (y | (y << 1)) & 6148914691236517205 AS y FROM s4),
        |z AS (SELECT x0, y0, (x | (y << 1)) >> 10 AS bucket FROM s5)
        |SELECT bucket, count(*) AS n, min(x0) AS x_min, max(x0) AS x_max,
        |  min(y0) AS y_min, max(y0) AS y_max
        |FROM z GROUP BY 1""".stripMargin,

    // q181: identical integer sums; the closing products run in DOUBLE
    // with the engine's exact a·b − c·d operation order (long products
    // of absolute-epoch-day sums would overflow — raising here, wrapping
    // in Spark — at ~10⁸ events/year).
    "q181_daily_trend" ->
      """WITH d AS (SELECT event_type AS t,
        |             CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |               AS BIGINT) AS x, count(*) AS y
        |           FROM events GROUP BY 1, 2),
        |a AS (SELECT t, count(*) AS n, CAST(sum(y) AS BIGINT) AS sy,
        |        CAST(sum(x) AS BIGINT) AS sx,
        |        CAST(sum(x * x) AS BIGINT) AS sxx,
        |        CAST(sum(x * y) AS BIGINT) AS sxy
        |      FROM d GROUP BY 1)
        |SELECT t AS event_type, CAST(n AS BIGINT) AS n_days, sy AS total,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
        |  (CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS intercept
        |FROM a WHERE CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0""".stripMargin,

    // q179: isodow−1 is the engine-neutral Monday-zero weekday.
    "q179_seasonality" ->
      """WITH c AS (SELECT event_type, CAST(isodow(ts) - 1 AS BIGINT) AS dow,
        |             CAST(hour(ts) AS BIGINT) AS hour, count(*) AS n
        |           FROM events GROUP BY 1, 2, 3),
        |t2 AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot
        |       FROM c GROUP BY 1)
        |SELECT c.event_type, c.dow, c.hour, c.n,
        |  CAST((1000000 * c.n) // t2.tot AS BIGINT) AS share_ppm
        |FROM c JOIN t2 USING (event_type)""".stripMargin,

    // q180: q127's session gate, DISTINCT types per session, ordered
    // self-join for a<b pairs, lift cross-multiplied on the ppm grid.
    "q180_cooccurrence" ->
      """WITH g AS (SELECT user_id, event_id, ts, event_type,
        |    epoch(ts) - lag(epoch(ts)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
        |  FROM events),
        |f AS (SELECT user_id, event_id, ts, event_type,
        |        CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END AS nw
        |      FROM g),
        |sd AS (SELECT user_id, event_type,
        |         sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS UNBOUNDED PRECEDING) AS sid
        |       FROM f),
        |b AS (SELECT DISTINCT user_id, sid, event_type FROM sd),
        |s2 AS (SELECT count(*) AS s FROM (SELECT DISTINCT user_id, sid FROM b)),
        |n1 AS (SELECT event_type, count(*) AS n FROM b GROUP BY 1),
        |p AS (SELECT x.event_type AS a, y.event_type AS bb
        |      FROM b x JOIN b y ON x.user_id = y.user_id AND x.sid = y.sid
        |        AND x.event_type < y.event_type),
        |pc AS (SELECT a, bb, count(*) AS n_ab FROM p GROUP BY 1, 2)
        |SELECT pc.a AS type_a, pc.bb AS type_b, pc.n_ab, na.n AS n_a,
        |  nb.n AS n_b,
        |  CAST((1000000 * pc.n_ab * s2.s) // (na.n * nb.n) AS BIGINT)
        |    AS lift_ppm
        |FROM pc JOIN n1 na ON na.event_type = pc.a
        |        JOIN n1 nb ON nb.event_type = pc.bb, s2""".stripMargin,

    // q178: identical integer scaling; the argmax is a rank window
    // (abs DESC, day ASC) over the bounded interior-day rows.
    "q178_change_point" ->
      """WITH d AS (SELECT event_type AS t, CAST(ts AS DATE) AS dd,
        |             count(*) AS x
        |           FROM events GROUP BY 1, 2),
        |w AS (SELECT t, dd, x,
        |        sum(x) OVER (PARTITION BY t ORDER BY dd) AS cum,
        |        row_number() OVER (PARTITION BY t ORDER BY dd) AS k,
        |        count(*) OVER (PARTITION BY t) AS n,
        |        sum(x) OVER (PARTITION BY t) AS tt
        |      FROM d),
        |s AS (SELECT t, dd, n, tt, n * cum - k * tt AS sv FROM w WHERE k < n),
        |sel AS (SELECT t, dd, sv, n, tt,
        |          row_number() OVER (PARTITION BY t
        |            ORDER BY abs(sv) DESC, dd ASC) AS rn
        |        FROM s)
        |SELECT t AS event_type, CAST(n AS BIGINT) AS n_days,
        |  CAST(tt AS BIGINT) AS total,
        |  CAST(datediff('day', DATE '1970-01-01', dd) AS BIGINT) AS cp_day,
        |  CAST(abs(sv) AS BIGINT) AS cusum_abs
        |FROM sel WHERE rn = 1""".stripMargin,

    // q177: min(tB − tA) = min(tB) − tA per user; the quantile rule is
    // quantileCard's cross-product cut over the lag histogram.
    "q177_conversion_lag" ->
      """WITH a AS (SELECT user_id, min(ts) AS ta FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |b AS (SELECT e.user_id, CAST(isodow(a.ta) - 1 AS BIGINT) AS g,
        |        min(epoch_us(e.ts) - epoch_us(a.ta)) AS lag_us
        |      FROM events e JOIN a USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts >= a.ta GROUP BY 1, 2),
        |h AS (SELECT g, lag_us // 1000000 AS v, count(*) AS c
        |      FROM b GROUP BY 1, 2),
        |w AS (SELECT g, v, c,
        |        sum(c) OVER (PARTITION BY g ORDER BY v) AS cum,
        |        sum(c) OVER (PARTITION BY g) AS tot FROM h)
        |SELECT g AS view_dow, CAST(max(tot) AS BIGINT) AS n_rows,
        |  CAST(min(CASE WHEN cum * 100 >= tot * 50 THEN v END) AS BIGINT) AS p50,
        |  CAST(min(CASE WHEN cum * 100 >= tot * 90 THEN v END) AS BIGINT) AS p90,
        |  CAST(min(CASE WHEN cum * 100 >= tot * 99 THEN v END) AS BIGINT) AS p99
        |FROM w GROUP BY g""".stripMargin,

    // q192: q177's interior without the quantile tail — the salted join
    // must produce EXACTLY the plain join's rows (salt invariance).
    "q192_conversion_lag_salted" ->
      """WITH a AS (SELECT user_id, min(ts) AS ta FROM events
        |           WHERE event_type = 'view' GROUP BY 1)
        |SELECT e.user_id, CAST(epoch_us(a.ta) AS BIGINT) AS from_us,
        |  CAST(min(epoch_us(e.ts) - epoch_us(a.ta)) AS BIGINT) AS lag_us
        |FROM events e JOIN a USING (user_id)
        |WHERE e.event_type = 'purchase' AND e.ts >= a.ta
        |GROUP BY 1, 2""".stripMargin,

    // q170: q127's session gate verbatim, a second window for the
    // lead of the derived flag, three boundary-cased selects for the
    // transition stream, integer ppm normalization.
    "q170_transitions" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    epoch(ts) - lag(epoch(ts)) OVER w AS gap_s,
        |    lead(event_type) OVER w AS lt
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |f AS (
        |  SELECT user_id, event_id, ts, event_type, lt,
        |    CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END AS nw
        |  FROM g),
        |h AS (
        |  SELECT event_type, lt, nw,
        |    lead(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ln
        |  FROM f),
        |tr AS (
        |  SELECT '__start' AS from_type, event_type AS to_type FROM h WHERE nw = 1
        |  UNION ALL
        |  SELECT event_type, lt FROM h WHERE ln = 0
        |  UNION ALL
        |  SELECT event_type, '__end' FROM h WHERE ln IS NULL OR ln = 1),
        |p AS (SELECT from_type, to_type, count(*) AS n FROM tr GROUP BY 1, 2),
        |t2 AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total
        |       FROM p GROUP BY 1)
        |SELECT p.from_type, p.to_type, p.n, t2.row_total,
        |  CAST((1000000 * p.n) // t2.row_total AS BIGINT) AS p_ppm
        |FROM p JOIN t2 USING (from_type)""".stripMargin,

    // q168: change gate = lag over the (ts, event_id) per-key order;
    // IS DISTINCT FROM is the engine-neutral null-safe inequality. The
    // first-row arm is row_number() = 1, NOT `pv IS NULL` — a NULL
    // predecessor TIER would satisfy the latter and open a version for
    // every row of a NULL run, where the engine (and the ScD2 spec)
    // collapse consecutive NULL tiers into one version.
    "q168_scd2" ->
      """WITH c AS (SELECT user_id, ts, event_id,
        |             CAST(floor(value / 50) AS BIGINT) AS tier,
        |             lag(CAST(floor(value / 50) AS BIGINT)) OVER wk AS pv,
        |             row_number() OVER wk AS rn
        |           FROM events
        |           WINDOW wk AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, event_id, tier FROM c
        |      WHERE rn = 1 OR tier IS DISTINCT FROM pv)
        |SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version,
        |  epoch_us(ts) AS valid_from_us,
        |  epoch_us(lead(ts) OVER w) AS valid_to_us, tier,
        |  CAST(CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS INT)
        |    AS is_current
        |FROM s
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin
  )
}
