package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Release-level privacy auditing — the companion tier to row-level PII
  * scrubbing ([[graft.text.Curation]]'s anonymization stage, q58): after
  * the strings are clean, CAN this table be released? k-anonymity asks
  * whether every quasi-identifier class hides each row among ≥ k others;
  * l-diversity asks whether the class also spans ≥ l distinct sensitive
  * values (a size-k class with one sensitive value re-identifies the
  * attribute, not the row — the homogeneity attack k alone misses).
  *
  * Scale shape: ONE map-side-combined agg keyed by the quasi-identifier
  * tuple — class count and exact distinct-sensitive count in the same
  * pass; output is bounded by the QI-class cardinality, which a release
  * audit requires to be small (that is the point of generalizing QIs).
  * NULL quasi-identifier values form their own class (they are a join
  * key an adversary can use too). All integers.
  */
object Privacy {

  /** One row per QI class: (qiCols..., class_size, distinct_sensitive,
    * k_ok, l_ok) with the flags as 0/1 longs — Σ class_size over
    * k_ok = 0 rows is the suppression cost of releasing at this k. */
  def anonymityAudit(df: DataFrame, qiCols: Seq[String],
      sensitive: Column, k: Int, l: Int): DataFrame = {
    require(qiCols.nonEmpty, "anonymityAudit: no quasi-identifier columns")
    require(k >= 2, s"anonymityAudit: k must be >= 2, got $k")
    require(l >= 1, s"anonymityAudit: l must be >= 1, got $l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("distinct_sensitive"))
      .select(qiCols.map(col) ++ Seq(
        col("class_size"), col("distinct_sensitive"),
        (col("class_size") >= k).cast("bigint").as("k_ok"),
        (col("distinct_sensitive") >= l).cast("bigint").as("l_ok")): _*)
  }
}
