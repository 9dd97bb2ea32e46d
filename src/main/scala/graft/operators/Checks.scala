package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints — the verification suite a 100 TB
  * ingest runs BEFORE curation (the Deequ / Great-Expectations tier;
  * fuel's converters hand-roll the same idea as per-dataset shape/range
  * asserts at ingest time, e.g. fuel/converters/mnist.py:60-108's header
  * checks): declare the contract, get one violations table back, gate the
  * pipeline on it.
  *
  * Evaluation is tiered by what each constraint needs, never more:
  *  - ROW-level checks (null, range, regex, accepted values) all fuse
  *    into ONE scan + ONE grouping-less aggregate — a single map-side
  *    pass whatever the check count; no shuffle beyond the 1-row agg.
  *  - [[Checks.Unique]] is the agg-form duplicate count (groupBy the key,
  *    map-side combined, `sum(cnt) − count(groups)` — never a
  *    corpus-keyed window or distinct-collect).
  *  - [[Checks.RefIntegrity]] is a keys-only anti-join count against the
  *    reference (both sides projected to the key column before any
  *    exchange; AQE broadcasts a small reference).
  *  - [[Checks.MinRows]] reuses the row-pass total.
  *
  * Output: one row per check — (check_name, col_name, n_violations,
  * passed 0/1) — integers only, so the report is oracle-exact and
  * mergeable across table shards by summing violations. */
object Checks {

  sealed trait Check
  /** Column must never be NULL. */
  final case class NotNull(column: String) extends Check
  /** Numeric column in [lo, hi] (inclusive); NULLs are NOT range
    * violations — pair with [[NotNull]] to ban them. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Check
  /** String column fully matches the (Java) regex; NULLs don't match
    * and DO count as violations here (an absent value cannot satisfy a
    * format contract). */
  final case class MatchesRegex(column: String, pattern: String) extends Check
  /** Column value drawn from a closed set; NULL counts as a violation. */
  final case class AcceptedValues(column: String, values: Seq[String]) extends Check
  /** The column tuple is a key: every combination appears once. */
  final case class Unique(columns: Seq[String]) extends Check
  /** Foreign-key containment: every non-null value of `column` exists in
    * `refColumn` of `ref`. */
  final case class RefIntegrity(column: String, ref: DataFrame, refColumn: String) extends Check
  /** Table carries at least `atLeast` rows (an empty/truncated shard
    * upstream is the classic silent killer). */
  final case class MinRows(atLeast: Long) extends Check

  private def rowViolation(c: Check): Option[(String, String, Column)] = c match {
    case NotNull(col0) =>
      Some(("not_null", col0, col(col0).isNull))
    case InRange(col0, lo, hi) =>
      Some(("in_range", col0,
        col(col0).isNotNull && (col(col0) < lit(lo) || col(col0) > lit(hi))))
    case MatchesRegex(col0, p) =>
      Some(("matches_regex", col0, !col(col0).rlike("^(?:" + p + ")$") ||
        col(col0).isNull))
    case AcceptedValues(col0, vs) =>
      Some(("accepted_values", col0,
        col(col0).isNull || !col(col0).isin(vs.map(v => v: Any): _*)))
    case _ => None
  }

  /** Run every check, one result row per check in input order. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Checks.run: no checks declared")
    val spark = df.sparkSession
    import spark.implicits._
    val rowChecks = checks.flatMap(c => rowViolation(c).map(c -> _))
    // One pass: total + one conditional count per row-level check.
    val aggs = count(lit(1)).as("__total") +:
      rowChecks.zipWithIndex.map { case ((_, (_, _, bad)), i) =>
        sum(when(bad, 1L).otherwise(0L)).as(s"__v$i")
      }
    val rowAgg = df.agg(aggs.head, aggs.tail: _*).head()
    val total = rowAgg.getLong(0)
    val rowResults: Map[Check, (String, String, Long)] =
      rowChecks.zipWithIndex.map { case ((c, (name, col0, _)), i) =>
        c -> ((name, col0, rowAgg.getLong(i + 1)))
      }.toMap
    val results = checks.map {
      case c if rowResults.contains(c) =>
        val (name, col0, v) = rowResults(c)
        (name, col0, v)
      case Unique(cols0) =>
        // duplicate rows beyond each group's first — agg form, map-side
        // combined on the key; the hot duplicated key never sorts in one
        // task the way a row_number window would force.
        val v = df.groupBy(cols0.map(col): _*).agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(col("__c")) - count(lit(1)), lit(0L)).cast("long"))
          .head().getLong(0)
        ("unique", cols0.mkString(","), v)
      case RefIntegrity(col0, ref, refCol) =>
        val v = df.select(col(col0)).filter(col(col0).isNotNull)
          .join(ref.select(col(refCol).as(col0)), Seq(col0), "left_anti")
          .count()
        ("ref_integrity", col0, v)
      case MinRows(atLeast) =>
        ("min_rows", "", math.max(0L, atLeast - total))
      case other => throw new IllegalArgumentException(s"unhandled check $other")
    }
    results.map { case (name, col0, v) =>
      (name, col0, v, if (v == 0L) 1L else 0L)
    }.toDF("check_name", "col_name", "n_violations", "passed")
  }
}
