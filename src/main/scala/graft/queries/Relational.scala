package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables

/** Relational operator surface (SURVEY.md §2.6): scans, projection, filter,
  * joins (broadcast/shuffle/semi/anti), aggregation, window functions,
  * sort/limit/top-k, set ops, rollup, scalar functions.
  *
  * fuel has no joins/aggregations (reference: SURVEY §2.6); these expose the
  * Catalyst built-ins as the engine's query surface. Every query is written
  * scale-first: dimension joins carry `broadcast` hints, aggregates are
  * partial-aggregable, doubles are rounded only at the output edge so the
  * oracle hash is stable across engines.
  */
object Relational {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style scan + partial-aggregable groupBy. At 100 TB this is a
    // single pass with map-side combine; no join, no wide row.
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // Filter + projection; predicate and column pruning reach the parquet scan.
    "q2_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2).as("revenue"))
    }),

    // Star join over two tiny dims — broadcast both; zero shuffle for the join,
    // one shuffle for the final groupBy.
    "q3_join_broadcast" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 2).as("total_acctbal"))
    }),

    // Fact-fact join: lineitem x orders on orderkey. At scale this is a
    // shuffle (sort-merge) join on the natural key; AQE handles skew.
    "q4_join_facts" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
    }),

    // Global top-k: Spark's TakeOrderedAndProject — no full sort at scale.
    "q5_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    }),

    // SQL window function (fuel has only sequence sliders — SURVEY §2.6).
    // rank() keeps tied rows, so the output is deterministic as a set.
    "q6_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice").desc)
      t(s, dir, "orders")
        .withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
    }),

    // Set ops: customers that placed an order vs. didn't (INTERSECT/EXCEPT).
    "q7_setops" -> ((s, dir) => {
      val custs = t(s, dir, "customer").select(col("c_custkey").as("k"))
      val buyers = t(s, dir, "orders").select(col("o_custkey").as("k")).distinct()
      custs.intersect(buyers).withColumn("tag", lit("buyer"))
        .union(custs.except(buyers).withColumn("tag", lit("no_orders")))
    }),

    // Semi/anti joins (EXISTS / NOT EXISTS).
    "q8_semi_anti" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_suppkey"))
      val sup = t(s, dir, "supplier")
      val semi = sup.join(li, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), lit("active").as("status"))
      val anti = sup.join(li, col("s_suppkey") === col("l_suppkey"), "left_anti")
        .select(col("s_suppkey"), lit("inactive").as("status"))
      semi.union(anti)
    }),

    // Exact distinct aggregation (two-phase at scale).
    "q9_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("n_parts"),
          countDistinct("l_suppkey").as("n_supps"))
    }),

    // ROLLUP hierarchy; NULL grouping slots coalesced for a stable oracle hash.
    "q10_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("cnt"))
    }),

    // Scalar function surface: date parts, string ops, conditional logic.
    "q11_scalar_fns" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          when(col("o_totalprice") > 100000, "big").otherwise("small").as("bucket"),
          upper(substring(col("o_orderstatus"), 1, 1)).as("st"))
        .groupBy("yr", "mo", "bucket", "st")
        .agg(count(lit(1)).as("cnt"))
    }),

    // Grouped HAVING: high-volume suppliers with a post-aggregation filter;
    // the supplier dim is broadcast against the lineitem aggregate.
    "q12_having" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_lines"), round(sum("l_quantity"), 2).as("total_qty"))
        .filter(col("n_lines") >= 100)
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select("s_name", "n_lines", "total_qty")
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * (1.0 - l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_quantity < 24""".stripMargin,

    "q3_join_broadcast" ->
      """SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q4_join_facts" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q5_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q6_window_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk
        |  FROM orders) WHERE rnk <= 3""".stripMargin,

    "q7_setops" ->
      """WITH custs AS (SELECT c_custkey AS k FROM customer),
        |buyers AS (SELECT DISTINCT o_custkey AS k FROM orders)
        |SELECT k, 'buyer' AS tag FROM (SELECT k FROM custs INTERSECT SELECT k FROM buyers)
        |UNION ALL
        |SELECT k, 'no_orders' AS tag FROM (SELECT k FROM custs EXCEPT SELECT k FROM buyers)""".stripMargin,

    "q8_semi_anti" ->
      """SELECT s_suppkey, 'active' AS status FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
        |UNION ALL
        |SELECT s_suppkey, 'inactive' AS status FROM supplier
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)""".stripMargin,

    "q9_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q10_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q11_scalar_fns" ->
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |  CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS bucket,
        |  upper(substring(o_orderstatus, 1, 1)) AS st,
        |  count(*) AS cnt
        |FROM orders GROUP BY 1, 2, 3, 4""".stripMargin,

    "q12_having" ->
      """SELECT s_name, count(*) AS n_lines, round(sum(l_quantity), 2) AS total_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name HAVING count(*) >= 100""".stripMargin
  )
}
