package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Stable

/** Split-aware storage — the engine's H5PYDataset analog (reference:
  * fuel/datasets/hdf5.py:98-119,234-300: a `split` table mapping
  * train/valid/test to row ranges per source). Parquet-native design:
  * `split` is a partition column, so selecting one split is partition
  * pruning at the scan (zero I/O for other splits) instead of fuel's
  * driver-side Subset index translation.
  */
object SplitSource {
  /** Deterministic split assignment by hashed key: `weights` are per-split
    * proportions summing to 1 (order-sensitive; pass a Seq for stable
    * thresholds). bucket = seededHash(key) mod `Buckets`; cumulative
    * thresholds pick the split. A pure projection — reproducible under
    * retries, and by external engines. */
  val Buckets = 1000

  def assignSplit(df: DataFrame, key: Column, seed: Long,
      weights: Seq[(String, Double)]): DataFrame = {
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
    val bucket = pmod(Stable.seededHash(seed, key), lit(Buckets))
    val thresholds = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val expr = weights.zip(thresholds).foldRight(lit(weights.last._1): Column) {
      case (((name, _), cum), acc) =>
        when(bucket < math.round(cum * Buckets), name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** EXACT stratified split assignment: within each `groupCol` stratum,
    * rows rank by seeded hash and the cumulative-weight boundaries cut
    * the RANKS — so every stratum's split counts are exact to ±1 doc
    * (boundary k = floor(n_g · cumw_k), computed once in IEEE double),
    * where [[assignSplit]]'s per-row Bernoulli is exact only in
    * expectation. The difference matters precisely when strata are
    * small (a 40-doc language at 80/10/10 can land 0 valid docs under
    * Bernoulli); stratified evaluation sets are the standard fix.
    *
    * Scale bound, stated honestly: the rank is a window partitioned by
    * the stratum — each stratum's rows sort in one task, so this is a
    * SMALL-STRATA tool by construction (the regime where exactness
    * matters). For few huge strata, per-stratum exactness is
    * statistically irrelevant and [[assignSplit]]'s pure projection is
    * the right plan; the scaladoc IS the decision rule. */
  def assignSplitStratified(df: DataFrame, groupCol: String, key: Column,
      seed: Long, weights: Seq[(String, Double)]): DataFrame = {
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val ranked = df
      .withColumn("__h", Stable.seededHash(seed, col(groupCol), key))
      .withColumn("__r", row_number().over(w.orderBy(col("__h"))).cast("bigint") - 1L)
      .withColumn("__n", count(lit(1)).over(w))
    val cum = weights.scanLeft(0.0) { case (acc, (_, wt)) => acc + wt }.tail
    val expr = weights.zip(cum).foldRight(lit(weights.last._1): Column) {
      case (((name, _), c), acc) =>
        when(col("__r") < floor(col("__n").cast("double") * c), name).otherwise(acc)
    }
    ranked.withColumn("split", expr).drop("__h", "__r", "__n")
  }

  /** Split assignment from explicit [[Subset]]s — fuel's indices-ref
    * splits (hdf5.py:234-300: a split defined by an arbitrary index list
    * or range, not a proportion). Rows in no subset get `restName`;
    * overlapping subsets resolve to the FIRST match (fuel splits are
    * disjoint by construction; this makes the overlap behavior
    * deterministic rather than an error). A pure projection over `idxName`
    * — each membership test is the subset's range/IN predicate, so the
    * whole assignment collapses into one codegen'd CASE chain. */
  def assignSplitFromSubsets(df: DataFrame, splits: Seq[(String, Subset)],
      restName: String = "rest", idxName: String = Indexed.Idx): DataFrame = {
    val expr = splits.foldRight(lit(restName): Column) { case ((name, sub), acc) =>
      val member = sub.repr match {
        case Left((start, stop)) => col(idxName) >= start && col(idxName) < stop
        case Right(indices)      => col(idxName).isin(indices: _*)
      }
      when(member, name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Sink: split-partitioned columnar store (fuel converter sink analog,
    * fuel/converters/base.py:50-104 `fill_hdf5_file`). `format` is any
    * Spark columnar source with partition discovery — parquet (default)
    * or orc; both carry the split column as a partition directory, so
    * the pruned read below works identically. */
  def write(df: DataFrame, path: String, format: String = "parquet"): Unit =
    df.write.mode("overwrite").partitionBy("split").format(format).save(path)

  /** Split-pruned scan: the `split = x` filter is a partition filter —
    * `.explain` shows PartitionFilters, not a post-scan Filter. */
  def read(spark: SparkSession, path: String, split: String,
      format: String = "parquet"): DataFrame =
    spark.read.format(format).load(path).filter(col("split") === split)

  /** Seeded deterministic Bernoulli sample by hashed key — the engine's
    * exposed sampling capability (SURVEY §2.6 "Sampling / seeded shuffle";
    * reference contract fuel/schemes.py:216-221). Unlike `df.sample`, the
    * selection is a pure row property: stable under retries, partition
    * changes, AND across engines. */
  def sample(df: DataFrame, key: Column, seed: Long, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1]: $fraction")
    df.filter(pmod(Stable.seededHash(seed, key), lit(Buckets)) <
      math.round(fraction * Buckets))
  }

  /** Per-stratum seeded Bernoulli sample — the class-rebalancing operator
    * of a training-data pipeline (downsample the dominant language, keep
    * the rare ones). `df.stat.sampleBy` with the same determinism contract
    * as [[sample]]: selection is a pure row property (stratum fraction +
    * hashed key), stable under retries and reproducible by the oracle.
    * Strata not listed keep `defaultFraction`. A pure filter — pushes to
    * the scan, no shuffle. */
  def stratifiedSample(df: DataFrame, strata: Column, key: Column, seed: Long,
      fractions: Seq[(String, Double)], defaultFraction: Double = 0.0): DataFrame = {
    (fractions.map(_._2) :+ defaultFraction).foreach(f =>
      require(f >= 0 && f <= 1, s"fraction must be in [0,1]: $f"))
    val threshold = fractions.foldRight(lit(math.round(defaultFraction * Buckets)): Column) {
      case ((name, f), acc) => when(strata === name, lit(math.round(f * Buckets))).otherwise(acc)
    }
    df.filter(pmod(Stable.seededHash(seed, key), lit(Buckets)) < threshold)
  }
}
