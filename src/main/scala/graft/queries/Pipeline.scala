package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Stable
import graft.schemes._
import graft.sources.{Indexed, Tables}

/** Scheme-surface queries (SURVEY.md §2.2): every entry compiles an
  * iteration scheme to (pos, batch_id) columns and is checked against a
  * DuckDB oracle computing the identical permutation via `row_number()` and
  * the shared md5 hash construction ([[Stable]]).
  */
object Pipeline {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SequentialScheme: consecutive batches in key order.
    "q13_scheme_sequential" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val idx = Indexed.withIdx(li, Seq(col("l_orderkey"), col("l_linenumber")))
      Schemes.compile(idx, SequentialScheme(4096))
        .select(col("l_orderkey"), col("l_linenumber"),
          col(Schemes.Pos).as("pos"), col(Schemes.BatchId).as("batch_id"))
    }),

    // ShuffledScheme: seeded reproducible permutation (md5-derived), then
    // consecutive batches of the permutation.
    "q14_scheme_shuffled" -> ((s, dir) => {
      val ord = Indexed.withIdx(t(s, dir, "orders"), Seq(col("o_orderkey")))
      Schemes.compile(ord, ShuffledScheme(batchSize = 512, seed = 7))
        .select(col("o_orderkey"),
          col(Schemes.Pos).as("pos"), col(Schemes.BatchId).as("batch_id"))
    }),

    // cross_validation fold assignment: fold i covers [n*i/k, n*(i+1)/k).
    "q15_cross_validation" -> ((s, dir) => {
      val cust = Indexed.withIdx(t(s, dir, "customer"), Seq(col("c_custkey")))
      val n = cust.count()
      cust.select(col("c_custkey"), col(Indexed.Idx).as("pos"),
          Schemes.foldId(col(Indexed.Idx), n, 5).as("fold_id"))
        .withColumn("role", when(col("fold_id") === 2, "valid").otherwise("train"))
    }),

    // ConcatenatedScheme: a sequential epoch segment followed by a shuffled
    // one; positions and batch ids continue across segments.
    "q16_scheme_concatenated" -> ((s, dir) => {
      val part = Indexed.withIdx(t(s, dir, "part"), Seq(col("p_partkey")))
      Schemes.compile(part,
          ConcatenatedScheme(Seq(SequentialScheme(50), ShuffledScheme(50, seed = 3))))
        .select(col("p_partkey"),
          col(Schemes.Pos).as("pos"), col(Schemes.BatchId).as("batch_id"))
    })
  )

  private def duckShuffleHash(seed: Long, idxExpr: String): String =
    Stable.duckSeededHash(seed, idxExpr)

  val oracles: Map[String, String] = Map(
    "q13_scheme_sequential" ->
      """SELECT l_orderkey, l_linenumber,
        |  row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS pos,
        |  CAST(floor((row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1) / 4096) AS BIGINT) AS batch_id
        |FROM lineitem""".stripMargin,

    "q14_scheme_shuffled" ->
      s"""WITH idx AS (
         |  SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) - 1 AS i FROM orders),
         |perm AS (
         |  SELECT o_orderkey,
         |    row_number() OVER (ORDER BY ${duckShuffleHash(7, "i")}, i) - 1 AS pos
         |  FROM idx)
         |SELECT o_orderkey, pos,
         |  CAST(floor(pos / 512) AS BIGINT) AS batch_id
         |FROM perm""".stripMargin,

    "q15_cross_validation" ->
      """WITH idx AS (
        |  SELECT c_custkey, row_number() OVER (ORDER BY c_custkey) - 1 AS pos FROM customer),
        |n AS (SELECT count(*) AS n FROM customer)
        |SELECT c_custkey, pos,
        |  CAST(floor((5 * (pos + 1) - 1) / n) AS BIGINT) AS fold_id,
        |  CASE WHEN CAST(floor((5 * (pos + 1) - 1) / n) AS BIGINT) = 2
        |       THEN 'valid' ELSE 'train' END AS role
        |FROM idx, n""".stripMargin,

    "q16_scheme_concatenated" ->
      s"""WITH idx AS (
         |  SELECT p_partkey, row_number() OVER (ORDER BY p_partkey) - 1 AS i FROM part),
         |n AS (SELECT count(*) AS n, CAST(ceil(count(*) / 50.0) AS BIGINT) AS nb FROM part)
         |SELECT p_partkey, i AS pos, CAST(floor(i / 50) AS BIGINT) AS batch_id FROM idx
         |UNION ALL
         |SELECT p.p_partkey, n.n + p.rn AS pos,
         |  n.nb + CAST(floor(p.rn / 50) AS BIGINT) AS batch_id
         |FROM (
         |  SELECT p_partkey,
         |    row_number() OVER (ORDER BY ${duckShuffleHash(3, "i")}, i) - 1 AS rn
         |  FROM idx) p, n""".stripMargin
  )
}
