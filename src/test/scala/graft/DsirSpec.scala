package graft

import org.apache.spark.sql.functions._

import graft.text.Dsir

/** DSIR importance resampling: hand-computed λ math (buckets = 1
  * collapses the model to one row), target-likeness ordering, selection
  * determinism, and the empty-model contract. */
class DsirSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("importance: hand-checked λ on the one-bucket model") {
    // buckets=1 → every gram lands in bucket 0.
    // target "a b": grams {a, b, "a b"} → ct=3, Tt=3.
    // raw doc1 "a b" (3 grams) + doc2 "x" (1 gram) → cr=4, Tr=4.
    // λ0 = ilog2(4) - ilog2(5) + ilog2(4) - ilog2(3) = 2 - 2 + 2 - 1 = 1.
    val target = Seq((100L, Seq("a", "b"))).toDF("doc_id", "ts")
    val raw = Seq((1L, Seq("a", "b")), (2L, Seq("x"))).toDF("doc_id", "ts")
    val out = Dsir.importance(raw, target, buckets = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("lw")))).toMap
    assert(out == Map(1L -> ((3L, 3L)), 2L -> ((1L, 1L))))
  }

  test("importance: target-vocabulary docs outscore disjoint-vocabulary docs") {
    val target = Seq((100L, Seq("alpha", "beta", "gamma", "alpha", "beta")))
      .toDF("doc_id", "ts")
    val raw = Seq(
      (1L, Seq("alpha", "beta", "gamma")), // shares target vocab
      (2L, Seq("xx", "yy", "zz")),         // disjoint
      (3L, Seq.empty[String])              // zero grams → (0, 0)
    ).toDF("doc_id", "ts")
    val out = Dsir.importance(raw, target)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("lw")))).toMap
    assert(out(1L)._2 > out(2L)._2)
    assert(out(3L) == ((0L, 0L)))
  }

  test("select: top-k truncation, deterministic across runs") {
    val target = Seq((100L, Seq("alpha", "beta"))).toDF("doc_id", "ts")
    val raw = Seq(
      (1L, Seq("alpha", "beta")), (2L, Seq("alpha", "zz")),
      (3L, Seq("qq", "rr")), (4L, Seq("ss", "tt"))).toDF("doc_id", "ts")
    def ids = Dsir.select(raw, target, k = 2)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    val first = ids
    assert(first.length == 2 && first.head == 1L) // exact vocab match leads
    assert(ids == first)                          // retry-deterministic
  }

  test("importance: an empty target model fails with the contract message") {
    val target = Seq((100L, Seq.empty[String])).toDF("doc_id", "ts")
    val raw = Seq((1L, Seq("a"))).toDF("doc_id", "ts")
    val e = intercept[IllegalArgumentException] {
      Dsir.importance(raw, target)
    }
    assert(e.getMessage.contains("target corpus has no grams"))
  }
}
