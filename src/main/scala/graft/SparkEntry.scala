package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q59 is the engine in one query: PII redaction, normalization,
    * language ID, quality scoring, exact + MinHash/LSH dedup, benchmark
    * decontamination, and distributed token packing, composed. */
  def entry(spark: SparkSession): DataFrame =
    queries("q59_full_curation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Pipeline.queries ++ TextQueries.queries ++
      EventQueries.queries ++ ImageQueries.queries ++ PqQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Pipeline.oracles ++ TextQueries.oracles ++
      EventQueries.oracles ++ ImageQueries.oracles ++ PqQueries.oracleSql
}
