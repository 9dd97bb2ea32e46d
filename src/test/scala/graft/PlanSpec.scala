package graft

/** Physical-plan audits: the properties that make these queries survive a
  * 100 TB scale-up, asserted against the executed plan so a regression
  * (lost pushdown, a sneaky cartesian, a skewed window) fails loudly. */
class PlanSpec extends SparkSpec {
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q2: predicate and column pruning reach the parquet scan") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull"), "filters not pushed to scan")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    // only the 6 needed columns, not the 11-column lineitem row
    assert(!readSchema.contains("l_tax") && !readSchema.contains("l_returnflag"),
      s"scan reads unneeded columns: $readSchema")
  }

  test("q21 tokenize scans the corpus exactly once (in-band BOS/EOS)") {
    val p = plan("q21_tokenize")
    val docScans = p.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("documents"))
    assert(docScans == 1, s"tokenize should read documents once, saw $docScans scans")
  }

  test("ANN brute force: broadcast nested loop, never CartesianProduct") {
    val p = plan("q30_ann_topk")
    assert(!p.contains("CartesianProduct"), "brute-force ANN degenerated to a cartesian")
    assert(p.contains("BroadcastNestedLoopJoin"), "query side should broadcast")
  }

  test("LSH dedup: only key-partitioned joins, no CartesianProduct") {
    val p = plan("q28_lsh_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "LSH pipeline must stay equi-join only")
  }

  test("dimension joins broadcast the small side") {
    assert(plan("q3_join_broadcast").contains("BroadcastHashJoin"))
    assert(plan("q8_semi_anti").contains("BroadcastHashJoin"))
    assert(plan("q12_having").contains("BroadcastHashJoin"))
  }

  test("q6 per-group top-k: partial aggregation, no window sort") {
    val p = plan("q6_window_rank")
    assert(!p.contains("Window"), "top-k must not use a skewed window sort")
    assert(p.contains("partial_topk") || p.contains("ObjectHashAggregate"),
      s"expected partial-aggregable top-k, got:\n$p")
  }

  test("q35 sessionization window is partitioned by user, not global") {
    val p = plan("q35_sessionize")
    val windowLines = p.linesIterator.filter(_.contains("Window")).mkString("\n")
    assert(windowLines.contains("user_id"), s"window must partition by user_id:\n$windowLines")
  }

  test("q1: single-pass partial aggregation (map-side combine)") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate") && p.contains("partial"),
      "q1 must partial-aggregate before the shuffle")
  }

  test("bucketed tables co-locate: fact-dim join with NO exchange on either side") {
    // The 100 TB pattern for repeated fact-fact/fact-dim joins: bucket both
    // tables on the join key at write time; Spark's bucketed scan reports
    // the hash partitioning, so the join needs no shuffle at all.
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      import org.apache.spark.sql.functions.col
      graft.sources.Tables.load(spark, sf, "orders")
        .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("graft_b_orders")
      graft.sources.Tables.load(spark, sf, "customer")
        .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("graft_b_customer")
      val joined = spark.table("graft_b_orders")
        .join(spark.table("graft_b_customer"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
      spark.sql("DROP TABLE IF EXISTS graft_b_customer")
    }
  }

  // ------------------------------------------------- global scale audit
  // Two plan shapes are never acceptable at 100 TB, in ANY query:
  //   - WindowExec with an empty partitionSpec: moves every row to ONE
  //     partition (Spark warns "No Partition Defined for Window").
  //   - CartesianProduct: all-pairs blow-up.
  // Walked over every SparkEntry query so a future operator can't sneak
  // one in. (q30's BroadcastNestedLoopJoin is a deliberate broadcast
  // strategy, not a cartesian — it stays allowed.)
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val inner = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => allNodes(q.plan)
      case _ => p.children.flatMap(allNodes)
    }
    p +: inner
  }

  test("global audit: no unpartitioned Window, no CartesianProduct, in any query") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    import org.apache.spark.sql.execution.window.WindowExec
    SparkEntry.queries.foreach { case (name, fn) =>
      val nodes = allNodes(fn(spark, sf).queryExecution.executedPlan)
      val unpartitionedWindows = nodes.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w.nodeName
      }
      assert(unpartitionedWindows.isEmpty,
        s"$name moves all rows to one partition via an unpartitioned Window")
      val cartesians = nodes.collect { case c: CartesianProductExec => c.nodeName }
      assert(cartesians.isEmpty, s"$name contains a CartesianProduct")
    }
  }
}
