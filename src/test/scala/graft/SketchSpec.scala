package graft

import org.apache.spark.sql.functions._

import graft.sketch.Sketch

/** Count-min and deterministic-HLL semantics: the estimator guarantees
  * (CMS never under-counts; HLL ignores duplication) and the accuracy
  * envelopes. */
class SketchSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("countMin: estimates never under-count, and are exact without collisions") {
    val words = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val df = words.toDF("w")
    val probes = Seq("a", "b", "c").toDF("w")
    // Wide sketch: 3 distinct values over 4x4096 cells — collision
    // probability nil, every estimate exact.
    val wide = Sketch.cmsEstimate(
        Sketch.countMin(df, "w", depth = 4, width = 4096),
        probes, "w", depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide == Map("a" -> 7L, "b" -> 3L, "c" -> 1L))
    // Tiny sketch: collisions force over-counts, never under-counts.
    val tiny = Sketch.cmsEstimate(
        Sketch.countMin(df, "w", depth = 2, width = 2),
        probes, "w", depth = 2, width = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tiny("a") >= 7L && tiny("b") >= 3L && tiny("c") >= 1L)
  }

  test("countMin: an absent probe whose cells were never touched estimates 0") {
    val sketch = Sketch.countMin(Seq("x").toDF("w"), "w", depth = 4, width = 4096)
    val est = Sketch.cmsEstimate(sketch, Seq("never-seen").toDF("w"), "w",
        depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("never-seen") == 0L)
  }

  test("countMin: counter table is bounded by depth x width") {
    val many = (0 until 5000).map(i => s"w$i").toDF("w")
    assert(Sketch.countMin(many, "w", depth = 4, width = 64).count() <= 4L * 64L)
  }

  test("hyperLogLog: duplication-insensitive — registers see sets, not bags") {
    val vals = (0L until 2000L).map(i => s"v$i").toDF("x")
    val once = Sketch.hyperLogLog(vals, "x").collect()(0)
    val thrice = Sketch.hyperLogLog(
      vals.union(vals).union(vals), "x").collect()(0)
    assert(once.getLong(2) == thrice.getLong(2), "identical s_int")
    assert(once.getDouble(3) == thrice.getDouble(3), "identical estimate")
  }

  test("hyperLogLog: raw estimate within the error envelope at n >> 2.5m") {
    // b=8 -> m=256, rel error ~ 1.04/16 = 6.5%; assert a loose 3-sigma.
    val n = 20000
    val vals = (0 until n).map(i => s"item$i").toDF("x")
    val est = Sketch.hyperLogLog(vals, "x", b = 8).collect()(0).getDouble(3)
    assert(math.abs(est - n) / n < 0.2, s"estimate $est vs $n")
  }

  test("hyperLogLog: s_int accounts every bucket (occupied or empty)") {
    val one = Sketch.hyperLogLog(Seq("only").toDF("x"), "x", b = 8).collect()(0)
    val (m, vEmpty, sInt) = (one.getLong(0), one.getLong(1), one.getLong(2))
    assert(m == 256L && vEmpty == 255L)
    // 255 empty buckets at 2^53 plus one occupied register in [2^0, 2^52].
    assert(sInt > 255L * (1L << 53) && sInt <= 256L * (1L << 53))
  }

  test("hyperLogLogByGroup: each group's row equals the global sketch of its slice") {
    val a = (0 until 500).map(i => ("a", s"x$i"))
    val b = (0 until 80).map(i => ("b", s"y$i"))
    val grouped = Sketch.hyperLogLogByGroup((a ++ b).toDF("g", "x"), "g", "x")
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    for ((g, rows) <- Seq("a" -> a, "b" -> b)) {
      val solo = Sketch.hyperLogLog(rows.map(_._2).toDF("x"), "x").collect()(0)
      assert(grouped(g) == ((solo.getLong(1), solo.getLong(2), solo.getDouble(3))),
        s"group $g disagrees with its standalone sketch")
    }
  }

  test("mergeability law: register-wise max of shard sketches == direct union sketch") {
    // Overlapping shards (values recur across groups) — max's
    // idempotence must make the merge insensitive to duplication.
    val vals = (1L to 500L).map(i => (s"s${i % 3}", s"v${i % 137}"))
      .toDF("g", "v")
    val direct = Sketch.hyperLogLog(vals.select("v"), "v", b = 6).collect()(0)
    val merged = Sketch.hllMergeRegisters(
      Sketch.hllRegistersByGroup(vals, "g", "v", b = 6), b = 6).collect()(0)
    assert(merged.getLong(0) == direct.getLong(0) &&
      merged.getLong(1) == direct.getLong(1) &&
      merged.getLong(2) == direct.getLong(2) &&
      merged.getDouble(3) == direct.getDouble(3),
      s"merged $merged != direct $direct")
    // A single-group register table merges to itself.
    val one = vals.filter(col("g") === "s0")
    val d1 = Sketch.hyperLogLog(one.select("v"), "v", b = 6).collect()(0)
    val m1 = Sketch.hllMergeRegisters(
      Sketch.hllRegistersByGroup(one, "g", "v", b = 6), b = 6).collect()(0)
    assert(m1.getLong(2) == d1.getLong(2) && m1.getDouble(3) == d1.getDouble(3))
  }
}
