package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-to-event analysis with right censoring — the retention /
  * conversion-latency card ([[Events]] measures lags among CONVERTED
  * users only; this keeps the not-yet-converted in the denominator, which
  * is what makes the rate unbiased). The estimator is Nelson–Aalen
  * cumulative hazard, chosen over Kaplan–Meier's product form because it
  * is a SUM — each step's hazard is floored once onto the integer micro
  * grid and the running total is then exact-integer, the engine's
  * no-float-accumulation discipline (a KM product would need log/exp,
  * which are not correctly-rounded and so not cross-engine stable;
  * S(t) ≈ exp(−H(t)) recovers the survival curve downstream).
  *
  * Study design is DECLARED, not data-derived (the [[Drift]] grid
  * argument): `studyEnd` closes the observation window — only rows at or
  * before it exist for the estimator; a subject with no qualifying event
  * inside the window is censored at `studyEnd`. Durations live on an
  * integer hour grid via `unix_micros` integer division (micros, not
  * seconds: both engines keep full timestamp precision; DuckDB's
  * boundary-counting date_diff is NOT the same function).
  *
  * Scale shape: one map-side-combined per-subject min-agg over the
  * window, one per-duration count agg (output bounded by distinct
  * durations), then two range-partitioned [[graft.sources.PrefixSum]]
  * passes — risk set n(t) = N − (subjects resolved earlier), and the
  * cumulative hazard — so there is NO unpartitioned window anywhere.
  * Output: one row per distinct duration — (dur, d, c, n_risk,
  * hazard_micro, cumhaz_micro) with d = events, c = censored; at each
  * step events precede censorings (both stay in n_risk at their own
  * step, the standard KM/NA convention). */
object Survival {

  /** `isEvent` marks the qualifying event rows (e.g. `event_type ===
    * "purchase"`); `studyEnd` is a timestamp literal like
    * `"2024-01-03 00:00:00"`. Duration = whole hours from the subject's
    * first in-window row to its first in-window qualifying event, else
    * to `studyEnd` (censored). */
  def hazardCurve(events: DataFrame, subjectCol: String, timeCol: String,
      isEvent: Column, studyEnd: String): DataFrame = {
    val end = to_timestamp(lit(studyEnd))
    val hourUs = 3600L * 1000000L
    val subj = events
      .filter(col(timeCol).isNotNull && col(timeCol) <= end)
      .groupBy(col(subjectCol))
      .agg(min(unix_micros(col(timeCol))).as("__t0"),
        min(when(isEvent, unix_micros(col(timeCol)))).as("__te"))
    val byDur = subj
      .select(
        // one integer division on the micros grid for BOTH branches
        // (durations are non-negative, so `div` truncation = floor)
        expr(s"(coalesce(__te, unix_micros(to_timestamp('$studyEnd'))) " +
          s"- __t0) div ${hourUs}L").as("dur"),
        when(col("__te").isNotNull, lit(1L)).otherwise(lit(0L)).as("__ev"))
      .groupBy(col("dur"))
      .agg(sum(col("__ev")).as("d"),
        sum(lit(1L) - col("__ev")).as("c"))
      .withColumn("__tc", col("d") + col("c"))
    // N comes eagerly from the prefix scan's phase-1 reduction — as a
    // literal, not a totals frame (which would re-derive the corpus
    // aggregation: no exchange reuse across the RDD bridge)
    val (pre, n) = graft.sources.PrefixSum
      .withPrefixSumTotal(byDur, Seq(col("dur")), "__tc", "__less")
    val risk = pre
      .withColumn("n_risk", lit(n) - col("__less"))
      .withColumn("hazard_micro",
        floor(col("d").cast("double") / col("n_risk").cast("double") *
          lit(1000000.0)).cast("bigint"))
    graft.sources.PrefixSum
      .withPrefixSum(risk, Seq(col("dur")), "hazard_micro", "__hless")
      .select(col("dur"), col("d"), col("c"), col("n_risk"),
        col("hazard_micro"),
        (col("__hless") + col("hazard_micro")).as("cumhaz_micro"))
  }
}
