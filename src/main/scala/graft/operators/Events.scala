package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence event analytics — the funnel and cohort tables every
  * event-log deployment reports (the analytics layer over the engine's
  * event machinery: q34 windows, q35 sessionize, q44 as-of, q54 dedup).
  * Both operators are exact integer/timestamp computations, so the DuckDB
  * oracle replays them bit-for-bit.
  */
object Events {

  /** Ordered funnel: for each step k, the users whose FIRST qualifying
    * occurrence of step k happens strictly AFTER their first qualifying
    * occurrence of step k-1 (the strict-order funnel — a purchase
    * before signup does not convert). One row per step: (step,
    * event_type, n_users, conversion), conversion = n_k / n_1 as a
    * long/long division.
    *
    * Scale shape: step k is one filtered (small: a single event type)
    * user-keyed min-agg joined to step k-1's user frame — k-1 joins
    * keyed by the uniform user id, each side already collapsed to one
    * row per user; no window ever sees the full event stream. The
    * per-user "first occurrence after t" is the conditional min, so
    * repeated events cost nothing. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val frames = steps.foldLeft(List.empty[(String, DataFrame)]) {
      case (acc, step) =>
        val hits = events.filter(col(typeCol) === step)
          .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
        val reached = acc match {
          case Nil =>
            hits.groupBy("__u").agg(min(col("__ts")).as("__t"))
          case (_, prev) :: _ =>
            hits.join(prev.select(col("__u"), col("__t").as("__pt")), Seq("__u"))
              .filter(col("__ts") > col("__pt"))
              .groupBy("__u").agg(min(col("__ts")).as("__t"))
        }
        (step, reached) :: acc
    }.reverse
    val counts = frames.zipWithIndex.map { case ((step, df), i) =>
      df.agg(count(lit(1)).as("n"))
        .select(lit(i + 1L).as("step"), lit(step).as("event_type"),
          col("n").as("n_users"))
    }.reduce(_ unionByName _)
    val first = counts.filter(col("step") === 1L)
      .select(col("n_users").as("__n1"))
    counts.crossJoin(broadcast(first))
      .withColumn("conversion",
        when(col("__n1") > 0,
          col("n_users").cast("double") / col("__n1").cast("double"))
          .otherwise(lit(0.0)))
      .drop("__n1")
  }

  /** Top session journeys — the most common event-type PATHS through a
    * session (the "user flow" report): sessions cut at `gapSeconds` of
    * inactivity (q35's sessionization rule verbatim), each session's
    * path the '>'-joined event types in (ts, event id) order, ranked by
    * frequency. Output: (path, n_sessions), top `topK` by
    * (count DESC, path ASC).
    *
    * Scale shape: the per-user session window (partitioned — the q35
    * rule), per-session assembly bounded by the session's own length
    * (array_sort over a collect_list, never a sort shuffle), one
    * map-side-combined path-keyed count, and a TakeOrdered top-k —
    * never a full path-table sort. */
  def topJourneys(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, eventIdCol: String, gapSeconds: Int = 1800,
      topK: Int = 20): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(col(tsCol), col(eventIdCol))
    val paths = events
      .withColumn("__gap",
        col(tsCol).cast("double") - lag(col(tsCol).cast("double"), 1).over(byUser))
      .withColumn("__new",
        when(col("__gap").isNull || col("__gap") > gapSeconds, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(byUser.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col(userCol), col("__sid"))
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col(tsCol).as("t"),
          col(eventIdCol).as("e"), col(typeCol).as("y")))),
        s => s.getField("y"))).as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(topK)
  }

  /** Interval self-join: all ordered event pairs of the same user
    * within `deltaSeconds` — the time-window correlation every
    * event-log investigation runs (errors within a minute of a
    * purchase, click trains, fraud bursts). A naive range self-join
    * plans as a per-user cartesian; the scale-safe form here is the
    * LSH shape applied to TIME: bucket by ⌊t/Δ⌋, probe buckets b and
    * b+1 (a later event within Δ lands in one of the two), verify the
    * exact microsecond gap on the joined row. Each qualifying pair
    * meets in EXACTLY one bucket branch — no distinct needed. Output:
    * (userCol, e1, e2, gap_us), microsecond-exact integers.
    *
    * Scale shape: explode ×2 on the probe side, joins keyed by
    * (user, bucket) — uniform unless one user floods one Δ-window,
    * which is the self-join's inherent quadratic (cap upstream with
    * [[funnel]]-style firsts or dedup if a user can flood). */
  def withinWindowPairs(events: DataFrame, userCol: String, tsCol: String,
      eventIdCol: String, deltaSeconds: Int): DataFrame = {
    require(deltaSeconds >= 1, s"withinWindowPairs: delta $deltaSeconds < 1s")
    val deltaUs = deltaSeconds * 1000000L
    val base = events.select(col(userCol), col(eventIdCol).as("__e"),
      unix_micros(col(tsCol)).as("__t"))
      .withColumn("__b", expr(s"__t div $deltaUs"))
    val probe = base
      .withColumn("__pb", explode(array(col("__b"), col("__b") + 1)))
      .select(col(userCol), col("__e").as("e1"), col("__t").as("__t1"),
        col("__pb").as("__b"))
    probe.join(base.select(col(userCol), col("__e").as("e2"),
        col("__t").as("__t2"), col("__b")), Seq(userCol, "__b"))
      .filter((col("__t2") > col("__t1") ||
          (col("__t2") === col("__t1") && col("e2") > col("e1"))) &&
        col("__t2") - col("__t1") <= deltaUs)
      .select(col(userCol), col("e1"), col("e2"),
        (col("__t2") - col("__t1")).as("gap_us"))
  }

  /** Weekly retention cohorts — the activity matrix (cohort week ×
    * weeks-since-cohort × distinct active users) behind every retention
    * curve: a user's cohort is the ISO week (`date_trunc('week')`,
    * Monday start in Spark AND DuckDB) of their first event; a cell
    * counts the cohort's users active in that offset week. Offsets are
    * integer day-differences div 7 — exact cross-engine.
    *
    * Scale shape: one user-keyed min-agg for cohorts, one distinct over
    * (user, week) — both map-side combined — a user-keyed join (both
    * sides one-or-few rows per user), and the final bounded
    * (cohort, offset)-keyed distinct count. The event stream shuffles
    * only user-keyed; the matrix is weeks² rows. */
  def retentionCohorts(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val weeks = events.select(col(userCol).as("__u"),
      date_trunc("week", col(tsCol)).as("__w"))
    val cohorts = weeks.groupBy("__u").agg(min(col("__w")).as("__cohort"))
    weeks.distinct()
      .join(cohorts, Seq("__u"))
      .select(col("__u"),
        // week-start as TIMESTAMP, not DATE — parquet DATE and the
        // oracle's datetime64 compare as unequal python types
        col("__cohort").as("cohort_week"),
        // both sides are week-truncated Mondays, so the day difference is
        // an exact multiple of 7; integer div keeps it integer throughout
        expr("CAST(datediff(__w, __cohort) div 7 AS BIGINT)").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count_distinct(col("__u")).as("n_active"))
  }

  /** Regular-grid resampling with forward fill — the time-series
    * normalizer (pandas' `resample().ffill()`, Timescale's
    * `time_bucket_gapfill` + `locf`) that turns an irregular event
    * stream into one row per (key, bucket) with the
    * last-observation-carried-forward value: the preprocessor for any
    * model that consumes fixed-rate sequences.
    *
    * Per (key, bucket) the OBSERVED value is the bucket's last event's
    * value, "last" made total by (ts, tieCol) — a struct-max agg, so
    * picking it is map-side combined and no float is ever summed (the
    * value is carried, not aggregated — bit-exact trivially). The grid
    * is each key's [min, max] bucket span, generated bounded (the
    * span guard raises past `maxBuckets` — a sensor that went quiet
    * for a year would otherwise explode the grid silently); the fill
    * is `last(value, ignoreNulls)` over the per-key bucket order —
    * a key-partitioned running window, never corpus-wide. Leading
    * buckets are always observed (the span starts at an event).
    * Output: (keyCol, bucket_start_s, value, observed 0|1).
    *
    * Scale shape: one (key, bucket)-keyed struct-max agg (map-side
    * combined), one key-keyed span agg, a bounded per-key explode, a
    * (key, bucket)-keyed left join of two already-collapsed frames,
    * and one key-partitioned window — every shuffle keyed by the
    * uniform key, grid size bounded by span·keys. */
  /** OHLC bucket downsampling — the financial-bar aggregation (open /
    * high / low / close / count per (key, bucket)), the lossy-but-
    * shaped summary a fixed-rate consumer wants when [[resampleFfill]]'s
    * last-value-only grid is too coarse a description of within-bucket
    * motion. Open and close are CARRIED values picked by struct-min/max
    * over the (ts, tie)-total order (map-side combined, no sort); high
    * and low are plain min/max — no double is ever summed, so every
    * column is bit-exact cross-engine. One (key, bucket)-keyed
    * map-side-combined agg over a projection; nothing else. */
  def ohlc(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, tieCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0,
      s"ohlc: bucketSeconds must be positive, got $bucketSeconds")
    val bucket = expr(
      s"unix_micros(CAST($tsCol AS TIMESTAMP)) div ${bucketSeconds * 1000000}")
    events
      .select(col(keyCol).as("__k"), bucket.as("__b"),
        struct(col(tsCol), col(tieCol), col(valCol)).as("__s"),
        col(valCol).as("__v"))
      .groupBy("__k", "__b")
      .agg(min(col("__s")).getField(valCol).as("open"),
        max(col("__v")).as("high"), min(col("__v")).as("low"),
        max(col("__s")).getField(valCol).as("close"),
        count(lit(1)).as("n_events"))
      .select(col("__k").as(keyCol),
        (col("__b") * bucketSeconds).as("bucket_start_s"),
        col("open"), col("high"), col("low"), col("close"), col("n_events"))
  }

  def resampleFfill(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, tieCol: String, bucketSeconds: Long,
      maxBuckets: Long = 1000000): DataFrame = {
    require(bucketSeconds > 0,
      s"resampleFfill: bucketSeconds must be positive, got $bucketSeconds")
    val bucket = expr(
      s"unix_micros(CAST($tsCol AS TIMESTAMP)) div ${bucketSeconds * 1000000}")
    val obs = events
      .select(col(keyCol).as("__k"), bucket.as("__b"),
        struct(col(tsCol), col(tieCol), col(valCol)).as("__s"))
      .groupBy("__k", "__b").agg(max(col("__s")).as("__s"))
      .select(col("__k"), col("__b"), col("__s").getField(valCol).as("__v"))
    val span = obs.groupBy("__k")
      .agg(min(col("__b")).as("__lo"), max(col("__b")).as("__hi"))
      .withColumn("__hi",
        when(col("__hi") - col("__lo") < maxBuckets, col("__hi"))
          .otherwise(raise_error(concat(
            lit("resampleFfill: key "), col("__k").cast("string"),
            lit(s" spans more than maxBuckets=$maxBuckets buckets — the "),
            lit("grid would explode. Widen bucketSeconds, split the time " +
              "range, or raise maxBuckets")))))
    val grid = span.select(col("__k"),
      explode(sequence(col("__lo"), col("__hi"))).as("__b"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__k")
      .orderBy("__b").rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    grid.join(obs, Seq("__k", "__b"), "left")
      .select(col("__k").as(keyCol),
        (col("__b") * bucketSeconds).as("bucket_start_s"),
        last(col("__v"), ignoreNulls = true).over(w).as("value"),
        when(col("__v").isNotNull, 1L).otherwise(0L).as("observed"))
  }

  /** Inter-event burstiness card — "is this event stream Poisson or
    * bursty?": per type, the squared coefficient of variation of the
    * per-(user, type) inter-event gaps. CV² = 1 is the memoryless
    * (exponential) baseline; > 1 means bursts, < 1 means pacing — the
    * dispersion diagnostic behind rate-limit tuning and bot detection.
    * Gaps land on the integer SECOND grid (µs div 10⁶ — exact), so
    * n, Σg, Σg² accumulate as LONGS; the CV² products are then taken
    * in DOUBLE (each factor cast once — NOT as long products: (Σg)²
    * overflows 2⁶³ already at ~3×10⁹ total gap-seconds per type,
    * which a few thousand users × a two-month span reaches; the
    * sf0.1 bench caught exactly that) with the identical cast-then-
    * multiply-then-divide order on every engine:
    * CV² = (n·Σg² − (Σg)²)/(Σg)² (the q161/q162 reformulation).
    * Output: (typeCol, n_gaps, sum_gap_s, mean_gap_s, cv2); types
    * with no gaps or zero total gap drop.
    *
    * Scale shape: ONE per-(user, type)-partitioned lag window (the
    * q35 key — never partitioned by type alone, which would gather a
    * hot type's whole stream), then a type-keyed map-side-combined
    * agg. */
  def burstiness(events: DataFrame, typeCol: String, userCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol, typeCol)
      .orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__gus", unix_micros(col(tsCol)) -
        lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("__g", expr("__gus div 1000000"))
      .filter(col("__g").isNotNull)
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_gaps"), sum(col("__g")).as("sum_gap_s"),
        sum(col("__g") * col("__g")).as("__sg2"))
      .filter(col("sum_gap_s") > 0)
      .select(col(typeCol), col("n_gaps"), col("sum_gap_s"),
        (col("sum_gap_s").cast("double") / col("n_gaps").cast("double"))
          .as("mean_gap_s"),
        ((col("n_gaps").cast("double") * col("__sg2").cast("double") -
          col("sum_gap_s").cast("double") * col("sum_gap_s").cast("double")) /
          (col("sum_gap_s").cast("double") * col("sum_gap_s").cast("double")))
          .as("cv2"))
  }

  /** Lagged cross-correlation between daily event series — "which
    * metric LEADS which?" (errors today predicting churn in two days;
    * views leading purchases): for every ordered type pair (a ≠ b)
    * and lag 0…maxLag, the Pearson r between a's daily count and b's
    * count `lag` days LATER, over the days where both series have
    * data (inner alignment — absent days are absent, not zero,
    * matching [[dailyTrend]]'s observed-day convention). Positive r
    * at lag k reads "a leads b by k days". The q162 exactness
    * discipline: five LONG sums per cell, products in double once, one
    * sqrt; zero-variance cells drop. Output: (type_a, type_b, lag, n,
    * r).
    *
    * Scale shape: the stream collapses ONCE to the bounded (type,
    * day) table; the lag fan-out (×(maxLag+1)) and the day-keyed
    * self-join run over that bounded table, never the events; the
    * closing agg map-side combines onto the (pair × lag) domain. */
  def crossCorrelation(events: DataFrame, typeCol: String, tsCol: String,
      maxLag: Int = 3): DataFrame = {
    require(maxLag >= 0, s"crossCorrelation: maxLag must be >= 0, got $maxLag")
    val daily = events
      .groupBy(col(typeCol).as("__t"),
        unix_date(to_date(col(tsCol))).cast("bigint").as("__day"))
      .agg(count(lit(1)).as("__x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = daily.select(col("__t").as("type_a"), col("__day"),
        col("__x").as("__xa"),
        explode(expr(s"sequence(0L, ${maxLag}L)")).as("lag"))
    val joined = a.join(
      daily.select(col("__t").as("type_b"), col("__day").as("__bday"),
        col("__x").as("__xb")),
      col("__bday") === col("__day") + col("lag") &&
        col("type_b") =!= col("type_a"))
    // Closing arithmetic in DOUBLE, never long products: n·Σxx wraps a
    // long once per-day counts reach ~10⁷ over a year (the agg sums
    // themselves stay exact far longer — Σxx ≤ d·max_count²). One fixed
    // a·b − c·d operation order, mirrored verbatim in the oracle, keeps
    // the result bit-identical cross-engine (same discipline as
    // [[graft.ann.Ann.gramMatrix]]'s cov step).
    def d(c: Column): Column = c.cast("double")
    val varX = d(col("n")) * d(col("__sxx")) - d(col("__sx")) * d(col("__sx"))
    val varY = d(col("n")) * d(col("__syy")) - d(col("__sy")) * d(col("__sy"))
    joined
      .groupBy(col("type_a"), col("type_b"), col("lag"))
      .agg(count(lit(1)).as("n"), sum(col("__xa")).as("__sx"),
        sum(col("__xb")).as("__sy"),
        sum(col("__xa") * col("__xb")).as("__sxy"),
        sum(col("__xa") * col("__xa")).as("__sxx"),
        sum(col("__xb") * col("__xb")).as("__syy"))
      .filter(varX > 0 && varY > 0)
      .select(col("type_a"), col("type_b"), col("lag"), col("n"),
        ((d(col("n")) * d(col("__sxy")) - d(col("__sx")) * d(col("__sy"))) /
          sqrt(varX * varY)).as("r"))
  }

  /** Interval-overlap aggregation by sweep line — "how many intervals
    * cover each day?" (in-transit inventory, concurrent sessions,
    * active contracts): the curve every operations dashboard draws.
    * The naive form is a days × intervals containment join — quadratic
    * and unshippable at 100 TB; the sweep line is the textbook
    * rewrite: each interval [start, end) becomes +1 at start and −1
    * at end, the deltas collapse to a bounded per-day table, and the
    * curve is a prefix sum over the day axis. End day is EXCLUSIVE
    * (an interval shipped and received the same day never counts).
    * Output: (day — epoch days, net, in_transit), one row per day
    * that appears as some interval's endpoint (the curve is constant
    * between endpoints — consumers needing a dense grid resample with
    * [[resampleFfill]]).
    *
    * Scale shape: one union + one day-keyed map-side-combined agg
    * (the corpus never shuffles rows, only ±1 deltas), then
    * [[graft.sources.PrefixSum.withPrefixSum]]'s range-partitioned
    * two-phase scan over the BOUNDED day table — never an
    * unpartitioned running-sum window. */
  def inFlightByDay(df: DataFrame, startCol: String,
      endCol: String): DataFrame = {
    val deltas = df
      .select(unix_date(to_date(col(startCol))).cast("bigint").as("day"),
        lit(1L).as("__d"))
      .unionByName(df.select(
        unix_date(to_date(col(endCol))).cast("bigint").as("day"),
        lit(-1L).as("__d")))
      .groupBy("day").agg(sum(col("__d")).as("net"))
    graft.sources.PrefixSum
      .withPrefixSum(deltas, Seq(col("day")), "net", "__before")
      .select(col("day"), col("net"),
        (col("__before") + col("net")).as("in_transit"))
  }

  /** Daily OLS trend card — the "is this metric growing?" line next to
    * [[changePoint]]'s "did it jump?" (a slope answers gradual drift;
    * CUSUM answers level shifts — monitoring wants both): per type,
    * ordinary least squares of daily count on epoch day over the
    * observed-day series. The q162 discipline lifted to regression:
    * all five sums are exact LONGS —
    * slope = (n·Σxy − Σx·Σy)/(n·Σxx − Σx²),
    * intercept = (Σy·Σxx − Σx·Σxy)/(n·Σxx − Σx²) — but the CLOSING
    * products run in DOUBLE, never long: x is the absolute epoch day
    * (~2·10⁴), so Σxx ≈ days·4·10⁸ and the long form of Σy·Σxx wraps
    * silently at only ~10⁸ events over a year (Spark wraps where
    * DuckDB raises — the engines would diverge in failure mode). The
    * fixed a·b − c·d operation order is mirrored verbatim in the
    * oracle, so each coefficient is still bit-stable cross-engine
    * (one IEEE rounding per cast/product, one per division).
    * Types observed on a single day drop (zero variance in x). Output:
    * (typeCol, n_days, total, slope, intercept).
    *
    * Scale shape: the stream collapses to the bounded (type, day)
    * table in one map-side-combined agg; the regression is a second
    * type-keyed agg over day rows. No windows at all. */
  def dailyTrend(events: DataFrame, typeCol: String,
      tsCol: String): DataFrame = {
    val daily = events
      .groupBy(col(typeCol), unix_date(to_date(col(tsCol))).cast("bigint")
        .as("__x"))
      .agg(count(lit(1)).as("__y"))
    def d(c: Column): Column = c.cast("double")
    val varX = d(col("n_days")) * d(col("__sxx")) -
      d(col("__sx")) * d(col("__sx"))
    daily.groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_days"), sum(col("__y")).as("total"),
        sum(col("__x")).as("__sx"), sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__x") * col("__y")).as("__sxy"))
      .filter(varX > 0)
      .select(col(typeCol), col("n_days"), col("total"),
        ((d(col("n_days")) * d(col("__sxy")) -
          d(col("__sx")) * d(col("total"))) / varX).as("slope"),
        ((d(col("total")) * d(col("__sxx")) -
          d(col("__sx")) * d(col("__sxy"))) / varX).as("intercept"))
  }

  /** Theil–Sen robust trend — [[dailyTrend]]'s outlier-proof sibling
    * (OLS lets one anomalous day drag the slope; the median of all
    * pairwise slopes shrugs off up to ~29% corruption — the robust
    * line a monitoring card should quote next to the OLS one): per
    * type, the LOWER MEDIAN of (x_j − x_i)/(day_j − day_i) over all
    * ordered day pairs, each slope micro-floored to the ppm grid
    * (one double division + one floor — deterministic) so the median
    * runs on exact integers via the 2·cum ≥ tot histogram rule (the
    * [[graft.text.TextOps.quantileCard]] cut). Output: (typeCol,
    * n_pairs, slope_ppm). Types with one observed day drop.
    *
    * Scale shape: the stream collapses ONCE to the bounded daily
    * table; the pairwise fan-out is the BOUNDED day-table self-join
    * keyed by type (d(d−1)/2 pairs of observed DAYS — 65 days is
    * ~2 000 pairs — never event pairs); the median's cumulative
    * window partitions by type over the slope histogram. */
  def theilSenTrend(events: DataFrame, typeCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col(typeCol).as("__t"),
        unix_date(to_date(col(tsCol))).cast("bigint").as("__day"))
      .agg(count(lit(1)).as("__x"))
    val a = daily.select(col("__t"), col("__day").as("__di"),
      col("__x").as("__xi"))
    val b = daily.select(col("__t"), col("__day").as("__dj"),
      col("__x").as("__xj"))
    val hist = a.join(b, Seq("__t")).filter(col("__di") < col("__dj"))
      .select(col("__t"),
        floor(lit(1000000d) * (col("__xj") - col("__xi")).cast("double") /
          (col("__dj") - col("__di")).cast("double")).as("__s"))
      .groupBy("__t", "__s").agg(count(lit(1)).as("__c"))
    val wv = Window.partitionBy("__t").orderBy("__s")
    hist
      .withColumn("__cum", sum(col("__c")).over(wv))
      .withColumn("__tot", sum(col("__c")).over(Window.partitionBy("__t")))
      .groupBy(col("__t").as(typeCol))
      .agg(max(col("__tot")).as("n_pairs"),
        min(when(col("__cum") * 2 >= col("__tot"), col("__s")))
          .as("slope_ppm"))
  }

  /** Activity seasonality profile — the (weekday × hour) heatmap table
    * behind every "when does this metric happen?" dashboard: per event
    * type, counts on the 7×24 grid and each cell's share of the
    * type's total on the integer ppm grid. Weekdays are ISO-shifted
    * (0 = Monday … 6 = Sunday — the engine-neutral convention; Spark's
    * `weekday` and DuckDB's `isodow − 1` agree), hours 0–23, both in
    * the session's UTC. Output: (typeCol, dow, hour, n, share_ppm).
    *
    * Scale shape: one (type, dow, hour)-keyed map-side-combined count
    * agg collapses the stream onto the fixed 168-cell-per-type grid;
    * totals re-aggregate the GRID (never the stream) and broadcast
    * back. */
  def activityProfile(events: DataFrame, typeCol: String,
      tsCol: String): DataFrame = {
    val cells = events
      .groupBy(col(typeCol), weekday(col(tsCol)).cast("bigint").as("dow"),
        hour(col(tsCol)).cast("bigint").as("hour"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col(typeCol)).agg(sum(col("n")).as("__tot"))
    cells.join(broadcast(totals), Seq(typeCol))
      .select(col(typeCol), col("dow"), col("hour"), col("n"),
        expr("(1000000 * n) div __tot").as("share_ppm"))
  }

  /** Session-basket co-occurrence with lift — "which event types travel
    * together?", the market-basket association table over [[topJourneys]]'
    * sessions: for each unordered pair of DISTINCT event types seen in
    * the same session, the co-occurrence count and the lift ratio on
    * the integer ppm grid — lift_ppm = ⌊10⁶·(n_ab·S)/(n_a·n_b)⌋ with S
    * the session count and n_x the sessions containing x (the PMI-ratio
    * move from [[graft.text.TextOps.pmiCollocations]], applied to
    * baskets). Pairs below `minCount` drop. Output: (type_a, type_b,
    * n_ab, n_a, n_b, lift_ppm), type_a < type_b.
    *
    * Scale shape: sessions cut by the q35 gate (per-user window), each
    * session collapses to its sorted DISTINCT type set (bounded by the
    * type alphabet), pairs explode in-array (k² of a tiny k), and the
    * pair/type/total tables all aggregate map-side onto the bounded
    * type domain — the corpus never shuffles twice.
    *
    * Overflow headroom: lift's numerator 10⁶·n_ab·S is a LONG —
    * exact while n_ab·S < ~9·10¹², i.e. up to ~3·10⁶ sessions with a
    * co-occurrence touching all of them; past that, widen the
    * numerator to DECIMAL(38,0) — free, since the lift arithmetic
    * runs on the ≤ |types|² pair table, never the corpus. */
  def sessionCooccurrence(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, eventIdCol: String,
      gapSeconds: Int = 1800, minCount: Long = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(eventIdCol))
    val sessions = events
      .withColumn("__gap",
        col(tsCol).cast("double") - lag(col(tsCol).cast("double"), 1).over(byUser))
      .withColumn("__new",
        when(col("__gap").isNull || col("__gap") > gapSeconds, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(byUser.rowsBetween(
        Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("__sid"))
      .agg(array_sort(collect_set(col(typeCol))).as("__ts"))
    val baskets = sessions.select(col("__ts"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val s = baskets.agg(count(lit(1)).as("__s"))
    val singles = baskets.select(explode(col("__ts")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("__n1"))
    // size >= 2 guards sequence()'s descending-on-empty trap (the
    // repetitionColumns lesson): sequence(0, -1) DESCENDS, it does not
    // return empty.
    val pairs = baskets.filter(size(col("__ts")) >= 2)
      .select(explode(expr(
        "flatten(transform(sequence(0, size(__ts) - 2), i -> " +
          "transform(sequence(i + 1, size(__ts) - 1), j -> " +
          "struct(__ts[i] AS a, __ts[j] AS b))))")).as("p"))
      .groupBy(col("p.a").as("type_a"), col("p.b").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    pairs
      .join(singles.select(col("t").as("type_a"), col("__n1").as("n_a")),
        Seq("type_a"))
      .join(singles.select(col("t").as("type_b"), col("__n1").as("n_b")),
        Seq("type_b"))
      .crossJoin(broadcast(s))
      .select(col("type_a"), col("type_b"), col("n_ab"), col("n_a"),
        col("n_b"), expr("(1000000 * n_ab * __s) div (n_a * n_b)")
          .as("lift_ppm"))
  }

  /** CUSUM change-point detection over daily event counts — "which day
    * did this metric's level shift?", the monitoring question behind
    * regression/incident attribution on an event stream. Per type, the
    * observed-day series x₁…xₙ (missing days are absent, not zero —
    * the series is the activity record, documented) gets the classic
    * cumulative-sum statistic, INTEGER-SCALED to avoid the float mean:
    * S'ₖ = n·Σᵢ≤ₖ xᵢ − k·T (= n·Σ(xᵢ − T/n), all LONG); the change
    * point is argmax |S'ₖ| over k < n (S'ₙ ≡ 0), ties to the earliest
    * day. Output: (typeCol, n_days, total, cp_day — epoch days,
    * cusum_abs); types with a single observed day drop (no interior
    * point to split at).
    *
    * Scale shape: one (type, day)-keyed map-side-combined count agg
    * collapses the stream to the BOUNDED daily table; the cumulative
    * windows partition by type over day rows (never the raw events);
    * the closing argmax is a struct-min agg, not a rank window. */
  def changePoint(events: DataFrame, typeCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col(typeCol).as("__t"), to_date(col(tsCol)).as("__d"))
      .agg(count(lit(1)).as("__x"))
    val w = Window.partitionBy("__t").orderBy("__d")
    val whole = Window.partitionBy("__t")
    daily
      .withColumn("__cum", sum(col("__x")).over(w))
      .withColumn("__k", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(whole))
      .withColumn("__tt", sum(col("__x")).over(whole))
      .filter(col("__k") < col("__n"))
      .withColumn("__s", col("__n") * col("__cum") - col("__k") * col("__tt"))
      .groupBy(col("__t").as(typeCol))
      .agg(max(col("__n")).as("n_days"), max(col("__tt")).as("total"),
        min(struct((-abs(col("__s"))).as("na"),
          unix_date(col("__d")).cast("bigint").as("d"))).as("__best"))
      .select(col(typeCol), col("n_days"), col("total"),
        col("__best.d").as("cp_day"), (-col("__best.na")).as("cusum_abs"))
  }

  /** Conversion lag per user — the time-to-convert measurement behind
    * every funnel report's "how long does it take?" column ([[funnel]]
    * counts WHO converts; this measures WHEN): each user's FIRST
    * `fromType` event, their first `toType` event at-or-after it, and
    * the microsecond-exact lag. Users without a `fromType`, or whose
    * `toType` events all precede it, drop. Output: (userCol, from_us —
    * the anchor's epoch micros, lag_us). Feed [[graft.text.TextOps
    * .quantileCard]] for the distribution, COHORTED on something real
    * (a constant cohort constant-folds quantileCard's per-group window
    * into an unpartitioned one — the q177 lesson, caught by PlanSpec's
    * global audit).
    *
    * Scale shape: two filtered user-keyed min-aggs (both map-side
    * combined; the second runs over the join-restricted toType rows)
    * and one user-keyed join — the same key everywhere, so one
    * partitioning carries the plan; min(t_B − t_A) = min(t_B) − t_A
    * because t_A is fixed per user.
    *
    * SKEW: the probe side of the join is the RAW toType stream, so a
    * flooding user (bot, SDK retry loop) concentrates one reducer —
    * the engine's one production-shaped known-skew join. AQE's
    * OptimizeSkewedJoin does NOT cover it, and PlanSpec's
    * "conversionLags' hot-user join" test MEASURES why: the same-key
    * aggregate directly downstream reuses the join's hash partitioning
    * (SMJ → partial+final agg fuse into one exchange-free stage), and
    * the splitter refuses any split that would invalidate a downstream
    * distribution requirement (`forceOptimizeSkewedJoin` exists
    * precisely because of this class). So this operator carries the
    * engine's production [[graft.operators.Skew.saltedJoin]] call site:
    * `salt > 0` keys the shuffle by (user, salt) — the flooding user's
    * rows spread over `salt` reducers; the firstA side (one row per
    * user after its min-agg) replicates `salt`x; the per-(user, anchor)
    * min re-aggregates across lanes afterwards (map-side combined, one
    * extra bounded exchange — the price of straggler immunity). Default
    * 0 = the exchange-minimal plan for non-pathological traffic;
    * results are IDENTICAL either way (q177/q192 share one oracle). */
  def conversionLags(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, fromType: String, toType: String,
      salt: Int = 0): DataFrame = {
    val firstA = events.filter(col(typeCol) === fromType)
      .groupBy(userCol).agg(min(col(tsCol)).as("__ta"))
    val toEvents = events.filter(col(typeCol) === toType)
      .select(col(userCol), col(tsCol))
    val joined =
      if (salt <= 0) toEvents.join(firstA, Seq(userCol))
      else Skew.saltedJoin(toEvents, firstA, userCol, userCol,
        saltBy = col(tsCol), salt = salt)
    joined
      .filter(col(tsCol) >= col("__ta"))
      .groupBy(col(userCol), unix_micros(col("__ta")).as("from_us"))
      .agg(min(unix_micros(col(tsCol)) - unix_micros(col("__ta")))
        .as("lag_us"))
  }

  /** First-order Markov transition matrix over sessionized event
    * streams — the model behind [[topJourneys]]' raw paths (journeys
    * rank WHOLE paths; the matrix factors them into memoryless steps,
    * the form attribution and next-action prediction consume). Sessions
    * cut at `gapSeconds` (the q35 rule); within a session every
    * consecutive pair emits (from_type → to_type), plus the boundary
    * states `__start` → first and last → `__end`, so every session
    * contributes exactly (len + 1) transitions and each row's
    * probabilities sum to ~1. Output: (from_type, to_type, n,
    * row_total, p_ppm) with p_ppm = (10⁶·n) div row_total — the
    * row-normalized probability on an integer ppm grid, exact on any
    * engine.
    *
    * Scale shape: ONE per-user window pass computes the session gate
    * and the lead pair; the ≤3 candidate transitions per event leave
    * as a bounded explode; the (from, to) count agg map-side combines
    * onto the bounded type-pair domain; row totals re-aggregate the
    * COUNTS (never rescan events) and broadcast back onto the pair
    * table. No event row crosses a second shuffle. */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, eventIdCol: String, gapSeconds: Int = 1800): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(eventIdCol))
    val trans = events
      .withColumn("__gap",
        col(tsCol).cast("double") - lag(col(tsCol).cast("double"), 1).over(byUser))
      .withColumn("__new",
        when(col("__gap").isNull || col("__gap") > gapSeconds, 1).otherwise(0))
      .withColumn("__lt", lead(col(typeCol), 1).over(byUser))
      .withColumn("__ln", lead(col("__new"), 1).over(byUser))
      .select(explode(array(
        when(col("__new") === 1,
          struct(lit("__start").as("from_type"), col(typeCol).as("to_type"))),
        when(col("__ln") === 0,
          struct(col(typeCol).as("from_type"), col("__lt").as("to_type"))),
        when(col("__ln").isNull || col("__ln") === 1,
          struct(col(typeCol).as("from_type"), lit("__end").as("to_type")))))
        .as("t"))
      .filter(col("t").isNotNull)
      .select(col("t.from_type"), col("t.to_type"))
    val pairs = trans.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum(col("n")).as("row_total"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"), col("row_total"),
        expr("(1000000 * n) div row_total").as("p_ppm"))
  }

  /** Slowly-changing-dimension type 2: compress a per-key change stream
    * into validity intervals — the warehouse dimension-table build that
    * turns an event log into an as-of-queryable history (the other half
    * of [[AsOf.asofBackward]]: as-of ANSWERS point-in-time questions,
    * SCD2 MATERIALIZES the table they're asked of). Rows order per key
    * by (`tsCol`, `tieCol`); a row opens a new version iff it is the
    * key's first or its `valueCol` differs (null-safely) from the
    * previous row's — because dropped rows always sit inside a run of
    * equal values, comparing to the immediate predecessor equals
    * comparing to the last survivor, so one lag suffices. Survivors get
    * `version` (1-based per key), `valid_from` = own ts, `valid_to` =
    * next survivor's ts (null on the current version), `is_current`.
    *
    * Scale shape: both windows (the lag-based change gate and the
    * lead/row_number interval build) partition by the key — no
    * unpartitioned window anywhere, and Catalyst reuses ONE exchange +
    * sort for the second window pair since the (partition, order) spec
    * is identical. Nothing but the per-key ordered scan; per-key state
    * is one row. */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val w = ord
    val survivors = changes
      .withColumn("__prev", lag(col(valueCol), 1).over(ord))
      .withColumn("__rn", row_number().over(ord))
      .filter(col("__rn") === 1 || !(col(valueCol) <=> col("__prev")))
      .drop("__prev", "__rn")
    survivors.select(col(keyCol),
      row_number().over(w).cast("long").as("version"),
      col(tsCol).as("valid_from"),
      lead(col(tsCol), 1).over(w).as("valid_to"),
      col(valueCol).as(valueCol),
      when(lead(col(tsCol), 1).over(w).isNull, 1).otherwise(0).as("is_current"))
  }
}
