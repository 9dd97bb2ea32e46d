package graft

import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("every relational query runs and returns rows at sf0.001") {
    for ((name, fn) <- Relational.queries) {
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("q1_agg groups by (returnflag, linestatus) with positive sums") {
    val rows = Relational.queries("q1_agg")(spark, sf).collect()
    assert(rows.length >= 3 && rows.length <= 9)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("q5_topk returns exactly 10 rows in descending price order") {
    val prices = Relational.queries("q5_topk")(spark, sf)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length == 10)
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("q7_setops partitions all customers into buyer/no_orders") {
    val df = Relational.queries("q7_setops")(spark, sf)
    val total = graft.sources.Tables.load(spark, sf, "customer").count()
    assert(df.count() == total)
  }

  test("every query with an oracle has matching column names") {
    // cheap structural guard: oracle key set ⊆ queries key set
    assert(Relational.oracles.keySet.subsetOf(Relational.queries.keySet))
  }
}
