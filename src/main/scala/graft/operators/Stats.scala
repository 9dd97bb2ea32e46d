package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    val cells = df.groupBy(col(groupCol), col(outcomeCol))
      .agg(count(lit(1)).as("observed"))
    val rowT = cells.groupBy(groupCol).agg(sum(col("observed")).as("__r"))
    val colT = cells.groupBy(outcomeCol).agg(sum(col("observed")).as("__c"))
    val grand = cells.agg(sum(col("observed")).as("__n"))
    cells
      .join(broadcast(rowT), Seq(groupCol))
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
}
