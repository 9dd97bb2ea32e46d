package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** Whole-operator semantics with exact small expected values. */
class OperatorsSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("asofBackward: latest right ts at-or-before, per key, null when none") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 10L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 10L), (1L, 15L), (3L, 1L)).toDF("k", "ts")
    val got = AsOf.asofBackward(left, right, "k", "ts", "m")
      .select("tag", "m").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(
      "a" -> 10L, // exact-ts right row matches (<= semantics)
      "b" -> 15L, // latest of {10, 15}
      "c" -> -1L, // no right row at or before 5
      "d" -> -1L)) // key 2 has no right rows at all
  }

  test("asofBackward plan: one key-partitioned window, no range join blow-up") {
    val ev = graft.sources.Tables.load(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
    val c = ev.filter(col("event_type") === "click").select("user_id", "ts")
    val plan = AsOf.asofBackward(p, c, "user_id", "ts").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not be a range/cross join:\n$plan")
    assert(plan.contains("Window"), "as-of should compile to a per-key window")
  }
}
