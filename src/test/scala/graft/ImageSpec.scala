package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.image.ImageOps
import graft.image.ImageOps.Frame
import graft.functions.Stable
import graft.sources.{InMemory, TextFileSource}
import graft.text.TextOps

/** Image kernels (fuel/transformers/image.py semantics) + file-backed text
  * sources. Fixtures are generated PNGs — real ImageIO decode, no mocks. */
class ImageSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def gradientFrame(h: Int, w: Int): Frame = {
    val px = new Array[Byte](h * w * 3)
    var i = 0
    while (i < h * w) { // r = col index, g = row index, b = 7
      px(3 * i) = (i % w).toByte; px(3 * i + 1) = (i / w).toByte; px(3 * i + 2) = 7.toByte
      i += 1
    }
    Frame(h, w, 3, px)
  }

  test("PNG encode/decode round-trips pixels exactly through a binary column") {
    val f = gradientFrame(9, 13)
    val df = Seq((1L, ImageOps.encodePng(f))).toDF("id", "png")
    val out = df.select(ImageOps.imagesFromBytes(col("png")).as("f"))
      .select("f.h", "f.w", "f.c", "f.px").collect()(0)
    assert(out.getInt(0) == 9 && out.getInt(1) == 13 && out.getInt(2) == 3)
    assert(out.getAs[Array[Byte]](3).toSeq == f.px.toSeq)
  }

  test("cropAt: explicit-offset crop window, bounds enforced; pxString/pxSum canonical") {
    val f = gradientFrame(8, 8)
    val df = Seq((1L, f)).toDF("id", "f")
    val out = df.select(
        ImageOps.cropAt(3, 2)(col("f"), lit(4), lit(5)).as("c"))
      .select(col("c.h"), col("c.w"), col("c.px"),
        ImageOps.pxSum(col("c")).as("s"), ImageOps.pxString(col("c")).as("str"))
      .collect()(0)
    assert(out.getInt(0) == 3 && out.getInt(1) == 2)
    val px = out.getAs[Array[Byte]](2)
    // window rows 4..6, cols 5..6 of the gradient: r=col, g=row, b=7
    val expect = for (y <- 4 to 6; x <- 5 to 6; v <- Seq(x, y, 7)) yield v
    assert(px.map(_ & 0xff).toSeq == expect)
    assert(out.getLong(3) == expect.sum)
    assert(out.getString(4) == expect.mkString(" "))
    // out-of-bounds offsets raise, not wrap
    intercept[org.apache.spark.SparkException] {
      df.select(ImageOps.cropAt(3, 2)(col("f"), lit(6), lit(0))).collect()
    }
  }

  test("frameFromVector quantizes in double — the closed form the q36 oracle replays") {
    val vec = Array(-1.5f, -1.0f, -0.25f, 0.0f, 0.25f, 0.5f, 0.999f, 1.5f, 0.1f)
    val df = Seq((1L, vec.toSeq)).toDF("id", "v")
    val out = df.select(ImageOps.frameFromVector(col("v")).as("f"))
      .select("f.h", "f.w", "f.px").collect()(0)
    assert(out.getInt(0) == 3 && out.getInt(1) == 3)
    val gray = out.getAs[Array[Byte]](2).grouped(3).map(_(0) & 0xff).toSeq
    val expect = vec.map(v =>
      math.max(0, math.min(255, ((v.toDouble + 1.0) * 127.5).toInt))).toSeq
    assert(gray == expect, s"got $gray expected $expect")
  }

  test("toBytes packs a uint8 array column into binary (fuel ToBytes)") {
    import org.apache.spark.sql.functions.col
    val df = Seq(Tuple1(Seq(0, 1, 127, 128, 255))).toDF("xs")
    val out = df.select(ImageOps.toBytes(col("xs")).as("b")).head().getAs[Array[Byte]](0)
    assert(out.toSeq == Seq[Byte](0, 1, 127, -128, -1)) // uint8 -> JVM signed bytes
  }

  test("minimumImageDimensions upscales only below the minimum") {
    val small = Seq((1L, gradientFrame(8, 8)), (2L, gradientFrame(20, 20)))
      .toDF("id", "f")
    val out = small.select(col("id"),
        ImageOps.minimumImageDimensions(16, 16)(col("f")).as("f"))
      .select(col("id"), col("f.h"), col("f.w")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(1L) == ((16, 16))) // upscaled
    assert(out(2L) == ((20, 20))) // untouched
  }

  test("randomFixedSizeCrop: right shape, in-bounds content, per-row deterministic") {
    val df = Seq((5L, gradientFrame(20, 30)), (6L, gradientFrame(20, 30))).toDF("id", "f")
    def run() = df.select(col("id"),
        ImageOps.randomFixedSizeCrop(8, 8, seed = 3)(col("f"), col("id")).as("f"))
      .select(col("id"), col("f.h"), col("f.w"), col("f.px")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3).toSeq))
    val a = run(); val b = run()
    assert(a.map(x => (x._1, x._2, x._3)).toSeq == Seq((5L, 8, 8), (6L, 8, 8)))
    assert(a.toSeq == b.toSeq)            // same seed => same crops
    assert(a(0)._4 != a(1)._4)            // different rows => different offsets
    // crop content is a contiguous window: blue channel constant 7
    assert(a(0)._4.grouped(3).forall(p => p(2) == 7.toByte))
  }

  test("random2DRotation keeps dimensions and is seed-deterministic") {
    val df = Seq((1L, gradientFrame(16, 16))).toDF("id", "f")
    def run(seed: Long) = df.select(
        ImageOps.random2DRotation(30.0, seed)(col("f"), col("id")).as("f"))
      .select(col("f.h"), col("f.w"), col("f.px")).collect()(0)
    val a = run(3); val b = run(3); val c = run(4)
    assert(a.getInt(0) == 16 && a.getInt(1) == 16)
    assert(a.getAs[Array[Byte]](2).toSeq == b.getAs[Array[Byte]](2).toSeq)
    assert(a.getAs[Array[Byte]](2).toSeq != c.getAs[Array[Byte]](2).toSeq)
  }

  test("binaryFile ingest: PNG files -> parquet frames (converter job)") {
    val dir = Files.createTempDirectory("graft_png")
    (0 until 3).foreach { i =>
      Files.write(dir.resolve(s"img_$i.png"), ImageOps.encodePng(gradientFrame(6 + i, 6)))
    }
    val out = Files.createTempDirectory("graft_frames").toString
    spark.read.format("binaryFile").load(dir.toString + "/*.png")
      .select(col("path"), ImageOps.imagesFromBytes(col("content")).as("frame"))
      .write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == 3)
    assert(back.select("frame.h").collect().map(_.getInt(0)).sorted.toSeq == Seq(6, 7, 8))
  }

  test("TextFileSource.lines + character-level tokenize match fuel's TextFile test") {
    val dir = Files.createTempDirectory("graft_txt")
    Files.writeString(dir.resolve("s1.txt"), "This is a sentence\nThis another one\n")
    val df = TextFileSource.lines(spark, Seq(dir.toString + "/s1.txt"))
      .withColumn("line", lower(col("line")))
    assert(df.count() == 2)
    // character dict as in tests/test_sequences.py test_text: a..z=0..25,
    // ' '=26, <S>=27, </S>=28, <UNK>=29
    val dict = (('a' to 'z').zipWithIndex.map { case (c, i) => (c.toString, i) } :+
      (" ", 26)).toDF("word", "token_id")
    val out = TextOps.tokenize(df, "line_no", "line", dict,
        bos = Some(27L), eos = Some(28L), unk = 29L, tokenizer = TextOps.charTokens)
      .filter(col("line_no") === 0).orderBy("pos")
      .collect().map(_.getLong(2)).toSeq
    assert(out.take(3) == Seq(27L, 19L, 7L)) // <S> t h
    assert(out.takeRight(3) == Seq(2L, 4L, 28L)) // c e </S>
  }

  test("TextFileSource.lines reads gzip transparently (fuel text.py:96-101)") {
    val dir = Files.createTempDirectory("graft_gz")
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("corpus.txt.gz")))
    gz.write("alpha beta\ngamma\n".getBytes("UTF-8")); gz.close()
    val df = TextFileSource.lines(spark, Seq(dir.toString + "/corpus.txt.gz"))
    assert(df.count() == 2)
    assert(df.orderBy("line_no").collect().map(_.getAs[String]("line")).toSeq ==
      Seq("alpha beta", "gamma"))
  }

  test("InMemory source preserves collection order via __idx") {
    val df = InMemory.fromSeq(spark, Seq("x", "y", "z"))
    assert(df.orderBy("__idx").collect().map(_.getString(0)).toSeq == Seq("x", "y", "z"))
  }

  test("dHash: invariant to brightness shift, far from unrelated, near-dup via Hamming bands") {
    def shift(f: Frame, d: Int): Frame = Frame(f.h, f.w, f.c,
      f.px.map(b => math.min(255, (b & 0xff) + d).toByte))
    def noisy(f: Frame): Frame = Frame(f.h, f.w, f.c,
      f.px.zipWithIndex.map { case (b, i) =>
        if (i % 29 == 0) math.min(255, (b & 0xff) + 3).toByte else b })
    val base = gradientFrame(32, 36)
    val rnd = Frame(32, 36, 3, Array.tabulate(32 * 36 * 3)(i =>
      (Stable.splitmix(i.toLong * 7 + 3) & 0xff).toByte))
    val df = Seq((1L, base), (2L, shift(base, 10)), (3L, noisy(base)),
        (4L, rnd)).toDF("id", "f")
      .select(col("id"), ImageOps.dHash(col("f")).as("h"))
    val hs = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // A uniform brightness shift leaves every horizontal gradient sign
    // unchanged: hash identical.
    assert(hs(1L) == hs(2L), s"brightness shift changed the hash")
    // Sparse pixel noise moves a few cells: small but possibly nonzero.
    assert(hamming(hs(1L), hs(3L)) <= 12, s"noise: ${hamming(hs(1L), hs(3L))}")
    // Unrelated content lands far away.
    assert(hamming(hs(1L), hs(4L)) >= 16, s"unrelated: ${hamming(hs(1L), hs(4L))}")
    // The hashes drop straight into the text path's banded-Hamming
    // near-dup machinery — the planted near-pair surfaces, the
    // unrelated image does not.
    val pairs = graft.dedup.Dedup.simhashNearDup(
        df.select(col("id").as("doc_id"), col("h").as("simhash")),
        "doc_id", "simhash", bands = 13, bitsPerBand = 4, maxHamming = 12)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"got $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"got $pairs")
    // Tiny images cannot form the 9x8 grid: null, not garbage.
    val tiny = Seq((9L, gradientFrame(4, 4))).toDF("id", "f")
      .select(ImageOps.dHash(col("f")).as("h")).collect()(0)
    assert(tiny.isNullAt(0))
  }
}
