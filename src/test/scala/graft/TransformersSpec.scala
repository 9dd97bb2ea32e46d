package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schemes.{Schemes, SequentialScheme, ShuffledScheme}
import graft.sources.{Indexed, Tables}
import graft.transform._

/** Transformer laws, in the spirit of the reference's
  * tests/transformers/test_transformers.py (exact small expected values,
  * schema/axis laws, error branches). */
class TransformersSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def nested = Seq(
    (1L, Seq(Seq(1.0, 2.0), Seq(3.0, 4.0))),
    (2L, Seq(Seq(5.0, 6.0), Seq(7.0, 8.0)))
  ).toDF("id", "x")

  test("Flatten reshapes nested arrays to rank 1") {
    val out = Flatten(Seq("x"))(nested).orderBy("id").collect()
    assert(out.map(_.getSeq[Double](1)).toSeq ==
      Seq(Seq(1.0, 2.0, 3.0, 4.0), Seq(5.0, 6.0, 7.0, 8.0)))
    // idempotent on flat columns
    val flat = Flatten(Seq("x"))(Flatten(Seq("x"))(nested))
    assert(flat.schema("x").dataType.asInstanceOf[ArrayType].elementType == DoubleType)
  }

  test("ScaleAndShift is elementwise through array nesting; Cast floatX resolves config") {
    val out = (ScaleAndShift(2.0, 1.0, Seq("x")) andThen Cast("floatX", Seq("x")))(nested)
    out.schema("x").dataType match {
      case ArrayType(ArrayType(e, _), _) => assert(e == FloatType)
      case other => fail(s"expected nested float array, got $other")
    }
    val row = out.orderBy("id").collect()(0).getSeq[Seq[Float]](1)
    assert(row == Seq(Seq(3.0f, 5.0f), Seq(7.0f, 9.0f)))
  }

  test("ForceFloatX casts only non-floatX float columns, leaves ints alone") {
    val df = Seq((1, 2.0, 3.0f, Seq(4.0))).toDF("i", "d", "f", "ad")
    val out = ForceFloatX()(df)
    assert(out.schema("i").dataType == IntegerType)       // untouched
    assert(out.schema("d").dataType == FloatType)         // double -> floatX
    assert(out.schema("f").dataType == FloatType)         // already floatX
    assert(out.schema("ad").dataType.asInstanceOf[ArrayType].elementType == FloatType)
  }

  test("floatX config cascade: spark.graft.floatX conf switches the engine width") {
    val saved = Graft.floatX
    try {
      spark.conf.set("spark.graft.floatX", "float64")
      spark.conf.getOption("spark.graft.floatX").foreach(Graft.setFloatX)
      val out = Cast("floatX", Seq("d"))(Seq((1, 2.0f)).toDF("i", "d"))
      assert(out.schema("d").dataType == DoubleType)
      intercept[IllegalArgumentException] { Graft.setFloatX("float16") }
    } finally { Graft.floatX = saved; spark.conf.unset("spark.graft.floatX") }
  }

  test("Mapping add_sources collides on existing name; replace keeps name") {
    val df = Seq((1, 2)).toDF("a", "b")
    val out = Mapping(replace = Seq("a" -> (col("a") * 10)),
      addSources = Seq("c" -> (col("a") + col("b"))))(df)
    assert(out.columns.toSeq == Seq("a", "b", "c"))
    assert(out.collect()(0).toSeq == Seq(10, 2, 12))
    intercept[IllegalArgumentException] {
      Mapping(addSources = Seq("b" -> lit(1)))(df).collect()
    }
  }

  test("Rename: raise/ignore/warn on missing, collision detection") {
    val df = Seq((1, 2)).toDF("a", "b")
    assert(Rename(Map("a" -> "z"))(df).columns.toSeq == Seq("z", "b"))
    intercept[IllegalArgumentException] { Rename(Map("nope" -> "z"))(df) }
    assert(Rename(Map("nope" -> "z"), onNonExistent = "ignore")(df).columns.toSeq == Seq("a", "b"))
    intercept[IllegalArgumentException] { Rename(Map("a" -> "b"))(df) }
    // chained swap is allowed (both sides renamed)
    val swapped = Rename(Map("a" -> "b", "b" -> "a"))(df)
    assert(swapped.columns.sorted.toSeq == Seq("a", "b"))
  }

  test("FilterSources keeps requested sources plus engine columns, rejects unknown") {
    val sup = Indexed.withIdx(Tables.load(spark, sf, "supplier"), Seq(col("s_suppkey")))
    val out = FilterSources(Seq("s_name", "s_suppkey"))(sup)
    assert(out.columns.toSeq == Seq("s_suppkey", "s_name", "__idx"))
    intercept[IllegalArgumentException] { FilterSources(Seq("nope"))(sup) }
  }

  test("Batch orders rows by __pos within each batch; strictness 0/1/2") {
    val sup = Indexed.withIdx(Tables.load(spark, sf, "supplier").select("s_suppkey"),
      Seq(col("s_suppkey")))
    val n = sup.count() // 10 at sf0.001
    val compiled = Schemes.compile(sup, SequentialScheme(4))
    val b0 = Batch(4)(compiled).orderBy("__batch_id").collect()
    assert(b0.map(_.getSeq[Long](1).size).toSeq == Seq(4, 4, 2))
    // in-batch order follows __pos (= key order here)
    assert(b0.flatMap(_.getSeq[Long](1)).toSeq == sup.orderBy("s_suppkey")
      .collect().map(_.getLong(0)).toSeq)
    val b1 = Batch(4, strictness = 1)(compiled)
    assert(b1.count() == 2)
    intercept[IllegalArgumentException] { Batch(4, strictness = 2)(compiled) }
    assert(Batch(5, strictness = 2)(
        compiled.withColumn("__batch_id", floor(col("__pos") / 5).cast("bigint")))
      .count() == 2) // divisible: no error
  }

  test("Unpack is the left inverse of Batch") {
    val sup = Indexed.withIdx(Tables.load(spark, sf, "supplier").select("s_suppkey", "s_acctbal"),
      Seq(col("s_suppkey")))
    val compiled = Schemes.compile(sup, ShuffledScheme(3, seed = 1))
    val roundtrip = (Batch(3) andThen Unpack())(compiled)
    val got = roundtrip.select("s_suppkey", "s_acctbal").collect()
      .map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val want = sup.select("s_suppkey", "s_acctbal").collect()
      .map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(got.toSeq == want.toSeq)
  }

  test("Padding pads to batch max and the mask row-sums recover lengths") {
    val df = Seq(
      (0L, 0L, 0L, Seq(1, 2, 3)),
      (1L, 1L, 0L, Seq(4)),
      (2L, 2L, 1L, Seq(5, 6))
    ).toDF("__idx", "__pos", "__batch_id", "seq")
    val batched = Batch(2)(df)
    val padded = Padding(Seq("seq"))(batched)
    assert(padded.schema("seq_mask").dataType == ArrayType(FloatType, containsNull = false) ||
      padded.schema("seq_mask").dataType.isInstanceOf[ArrayType])
    val out = Unpack()(padded).orderBy("__batch_id", "__i").collect()
    val seqs = out.map(_.getSeq[Int](2))
    val masks = out.map(_.getSeq[Float](3))
    assert(seqs.map(_.length).toSeq == Seq(3, 3, 2)) // batch0 max=3, batch1 max=2
    assert(seqs(1) == Seq(4, 0, 0))                  // zero-padded
    assert(masks.map(_.sum).toSeq == Seq(3.0f, 1.0f, 2.0f)) // mask sums = lengths
    // error branch: non-sequence source
    intercept[IllegalArgumentException] { Padding(Seq("__batch_id"))(batched) }
  }

  test("Padding rank-2: sequences of vectors pad with zero vectors") {
    val df = Seq(
      (0L, 0L, 0L, Seq(Seq(1.0, 2.0), Seq(3.0, 4.0), Seq(5.0, 6.0))),
      (1L, 1L, 0L, Seq(Seq(7.0, 8.0)))
    ).toDF("__idx", "__pos", "__batch_id", "seq")
    val out = (Batch(2) andThen Padding(Seq("seq")) andThen Unpack())(df)
      .orderBy("__i").collect()
    val second = out(1).getAs[scala.collection.Seq[scala.collection.Seq[Double]]](2)
      .map(_.toList).toList
    assert(second.length == 3) // padded to batch max
    assert(second(0) == List(7.0, 8.0))
    assert(second(1) == List(0.0, 0.0) && second(2) == List(0.0, 0.0)) // zero vectors
    assert(out(1).getSeq[Float](3).sum == 1.0f) // mask counts real rows only
  }

  test("Padding rank-3: recursive zero element pads with zero matrices") {
    val df = Seq(
      (0L, 0L, 0L, Seq(Seq(Seq(1, 2), Seq(3, 4)), Seq(Seq(5, 6), Seq(7, 8)))),
      (1L, 1L, 0L, Seq(Seq(Seq(9, 10), Seq(11, 12))))
    ).toDF("__idx", "__pos", "__batch_id", "seq")
    val out = (Batch(2) andThen Padding(Seq("seq")) andThen Unpack())(df)
      .orderBy("__i").collect()
    val second = out(1).getAs[scala.collection.Seq[scala.collection.Seq[scala.collection.Seq[Int]]]](2)
      .map(_.map(_.toList).toList).toList
    assert(second.length == 2) // padded to batch max
    assert(second(0) == List(List(9, 10), List(11, 12)))
    assert(second(1) == List(List(0, 0), List(0, 0))) // zero 2x2 matrix
    assert(out(1).getSeq[Float](3).sum == 1.0f) // mask counts real elements only
  }

  test("Cache persists the stream: second consumer reads InMemoryRelation") {
    val df = Tables.load(spark, sf, "supplier").select("s_suppkey")
    val cached = Cache()(df)
    try {
      cached.count() // materialize
      assert(cached.queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
        "Cache() must persist so downstream consumers reuse the materialized stream")
      assert(cached.count() == df.count())
    } finally cached.unpersist()
  }

  test("Merge zips positionally and rejects duplicate source names") {
    val a = Indexed.withIdx(Seq("x", "y", "z").toDF("l"), Seq(col("l")))
    val b = Indexed.withIdx(Seq(10, 20, 30, 40).toDF("r"), Seq(col("r")))
    val m = Merge(Seq(a, b)).orderBy("__idx").collect()
    assert(m.length == 3) // truncates to shortest, like fuel's zip
    assert(m.map(r => (r.getString(1), r.getInt(2))).toSeq ==
      Seq(("x", 10), ("y", 20), ("z", 30)))
    intercept[IllegalArgumentException] { Merge(Seq(a, a)) }
  }

  test("axis labels: declared, rewritten by Flatten and Batch, survive parquet") {
    import graft.types.AxisLabels
    val labeled = AxisLabels.set(nested, "x", Seq("height", "width"))
    assert(AxisLabels.get(labeled, "x").contains(Seq("height", "width")))
    // Flatten rewrites to ("feature")
    val flat = Flatten(Seq("x"))(labeled)
    assert(AxisLabels.get(flat, "x").contains(Seq("feature")))
    // Batch prepends "batch"
    val schemed = labeled.withColumn("__idx", col("id"))
      .withColumn("__pos", col("id")).withColumn("__batch_id", lit(0L))
    val batched = Batch(2)(schemed)
    assert(AxisLabels.get(batched, "x").contains(Seq("batch", "height", "width")))
    // labels survive a parquet round trip
    val dir = java.nio.file.Files.createTempDirectory("graft_axis").toString
    labeled.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(AxisLabels.get(back, "x").contains(Seq("height", "width")))
    // verify(): matching passes, mismatched raises
    AxisLabels.verify(labeled, "x", Seq("height", "width"))
    intercept[IllegalArgumentException] {
      AxisLabels.verify(labeled, "x", Seq("channel"))
    }
  }

  test("SortMapping reorders positions within a batch by key") {
    val df = Seq(
      (0L, 0L, 0L, "ccc"), (1L, 1L, 0L, "a"), (2L, 2L, 0L, "bb"),
      (3L, 3L, 1L, "dd"), (4L, 4L, 1L, "e")
    ).toDF("__idx", "__pos", "__batch_id", "s")
    val out = SortMapping(length(col("s")))(df).orderBy("__pos")
      .select("s").collect().map(_.getString(0)).toSeq
    assert(out == Seq("a", "bb", "ccc", "e", "dd"))
  }
}
