package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.PrefixSum

/** Pareto skyline — the multi-criteria frontier query ("no other row is
  * at least as good on both axes and strictly better on one"): the
  * classic trade-off surface over quality-vs-length, cost-vs-coverage,
  * recency-vs-rank. Maximization on both integer axes.
  */
object Skyline {

  /** 2-D skyline (maximize `xCol` AND `yCol`, both LONG): a point
    * survives iff nothing dominates it — p dominates q when p ≥ q on
    * both axes and beats it strictly on at least one. Equal points
    * never dominate each other, so duplicates of a frontier point all
    * survive and return as one row with their count. Output:
    * (xCol, yCol, n_points), the distinct frontier coordinates.
    *
    * Two reductions make it scan-shaped: (1) within one x, only the
    * max-y point can be undominated (any other is beaten by it
    * same-x/strictly-higher-y), so the corpus collapses to the
    * per-x argmax first; (2) across x, a survivor must beat the max y
    * of every STRICTLY larger x — an exclusive prefix max in x-desc
    * order. Both facts together are the textbook sort-scan skyline,
    * here in its distributed form.
    *
    * Scale shape: one (x, y)-keyed map-side-combined count agg over
    * the corpus, an x-keyed struct-max argmax over the pair table
    * (bounded by distinct (x, y) pairs — the histogram argument of
    * [[graft.text.TextOps.robustOutlierReport]]), then
    * [[PrefixSum.withPrefixMax]]'s range-partitioned two-phase scan
    * over the x-histogram — never an unpartitioned window, never a
    * corpus sort. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pairs = df.select(col(xCol).cast("bigint").as("__x"),
        col(yCol).cast("bigint").as("__y"))
      .groupBy("__x", "__y").agg(count(lit(1)).as("__n"))
    val perX = pairs.groupBy("__x")
      .agg(max(struct(col("__y"), col("__n"))).as("__top"))
      .select(col("__x"), col("__top.__y").as("__y"),
        col("__top.__n").as("__n"))
    PrefixSum.withPrefixMax(perX, Seq(col("__x").desc), "__y")
      .filter(col("__y") > col("__pmax"))
      .select(col("__x").as(xCol), col("__y").as(yCol),
        col("__n").as("n_points"))
  }
}
