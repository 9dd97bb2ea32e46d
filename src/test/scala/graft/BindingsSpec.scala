package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.image.ImageOps
import graft.image.ImageOps.Frame
import graft.types.AxisLabels

/** The last three fuel named-dataset bindings (VERDICT r13 #5/#6):
  * ILSVRC over the tar-of-tars ingest, CelebA's wide attribute matrix,
  * DogsVsCats' ragged decoded pixels — closing the reference's
  * named-dataset table at 13/13. */
class BindingsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def mkTar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val tar = new TarArchiveOutputStream(bos)
    tar.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    entries.foreach { case (name, bytes) =>
      val e = new TarArchiveEntry(name)
      e.setSize(bytes.length.toLong)
      tar.putArchiveEntry(e); tar.write(bytes); tar.closeArchiveEntry()
    }
    tar.finish(); tar.close()
    bos.toByteArray
  }

  private def png(seed: Int, w: Int = 4): Array[Byte] =
    ImageOps.encodePng(Frame(3, w, 3,
      Array.tabulate[Byte](3 * w * 3)(j => ((seed * 31 + j * 7) % 256).toByte)))

  test("ilsvrc2010: tar-of-tars ingest -> shaping -> decode chain -> epoch (imagenet.py:7, ilsvrc2010.py:204-316)") {
    val dir = java.nio.file.Files.createTempDirectory("ilsvrc-mini").toString
    // TRAIN: the tar-of-tars layout — one inner tar per class (wnid-named),
    // JPEGs inside (PNG here: the shipped codec; the layout is the test).
    val innerA = mkTar(Seq(
      "n01440764_1.png" -> png(1), "n01440764_2.png" -> png(2),
      "n01440764_3.png" -> png(3)))
    val innerB = mkTar(Seq(
      "n02084071_1.png" -> png(4), "n02084071_2.png" -> png(5)))
    val outer = mkTar(Seq(
      "n01440764.tar" -> innerA, "n02084071.tar" -> innerB))
    val f = new FileOutputStream(s"$dir/train.tar"); f.write(outer); f.close()
    // VALID: a flat tar + a filename-keyed ground-truth frame
    // (process_other_set's shape)
    val validTar = mkTar(Seq("val_1.png" -> png(6), "val_2.png" -> png(7)))
    val fv = new FileOutputStream(s"$dir/valid.tar"); fv.write(validTar); fv.close()

    import spark.implicits._
    val train = graft.sources.Ilsvrc.shapeTrain(
      graft.sources.Archive.tarEntries(spark, s"$dir/train.tar"))
    val valid = graft.sources.Ilsvrc.shapeFlat(
      graft.sources.Archive.tarEntries(spark, s"$dir/valid.tar"), "valid",
      Some(Seq(("val_1.png", 0), ("val_2.png", 1)).toDF("filename", "targets")))
    val store = s"$dir/store"
    graft.sources.Ilsvrc.ingest(s"$store/ilsvrc2010", Seq(train, valid))

    val cat = new graft.sources.Catalog(spark).registerIlsvrc(store)
    assert(Seq("train", "valid", "test").forall(s =>
      cat.names.contains(s"ilsvrc2010-mini/$s")))
    // Shaping: dense sorted-wnid labels (n01... = 0, n02... = 1), idx
    // contiguous 0-based in (targets, filename) order.
    val raw = cat.load("ilsvrc2010-mini/train")
    assert(raw.count() == 5)
    assert(raw.orderBy("idx").select("idx", "filename", "targets")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((0L, "n01440764_1.png", 0), (1L, "n01440764_2.png", 0),
        (2L, "n01440764_3.png", 0), (3L, "n02084071_1.png", 1),
        (4L, "n02084071_2.png", 1)))
    assert(AxisLabels.get(raw, "encoded_images") == Some(Seq("bytes")))
    // Default chain = rgb_images_from_encoded_bytes: DECODE ONLY — no
    // rescale, no floatX cast (defaults.py:40-42). Output is the decoded
    // Frame; pixel bytes are the PNG-lossless originals; targets untouched.
    val out = cat.defaultStream("ilsvrc2010-mini/train")
    val r1 = out.filter(col("idx") === 1).select("encoded_images", "targets").head()
    val frame = r1.getStruct(0)
    assert(frame.getInt(frame.fieldIndex("h")) == 3)
    assert(frame.getInt(frame.fieldIndex("w")) == 4)
    val px = frame.getAs[Array[Byte]](frame.fieldIndex("px"))
    // seed 2, j 10: (2*31 + 70) % 256 = 132 (signed byte -124)
    assert((px(10) & 0xff) == 132)
    assert(r1.getInt(1) == 0)
    // valid split: ground-truth joined by filename, partition-pruned scan
    val vout = cat.defaultStream("ilsvrc2010-mini/valid")
    assert(vout.count() == 2)
    assert(vout.filter(col("filename") === "val_2.png")
      .select("targets").head().getInt(0) == 1)
    val plan = vout.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("split"),
      s"split must prune partitions, not post-filter:\n$plan")
    // epoch: the decoded stream drives the scheme machinery end-to-end
    val stream = graft.stream.DataStream(out,
      graft.schemes.SequentialScheme(2), cat.order("ilsvrc2010-mini/train"))
    val batches = stream.epochIterator().toSeq
    assert(batches.map(_.size) == Seq(2, 2, 1))
  }

  test("celeba: format-parameterized filename, 40-attribute target matrix rides the chain untouched (celeba.py:33-50)") {
    val dir = java.nio.file.Files.createTempDirectory("celeba-mini").toString
    // inline body: a udf must not capture the (non-serializable) spec
    val mkPng = udf { (id: Long) =>
      ImageOps.encodePng(Frame(3, 4, 3,
        Array.tabulate[Byte](3 * 4 * 3)(j => ((id * 31 + j * 7) % 256).toByte)))
    }
    val attrs = expr(
      "transform(sequence(0, 39), a -> CAST((idx + a) % 2 AS INT))")
    val rows = spark.range(20).select(col("id").as("idx"))
      .withColumn("features", mkPng(col("idx")))
      .withColumn("targets", attrs)
      .withColumn("split",
        when(col("idx") < 14, "train").when(col("idx") < 17, "valid")
          .otherwise("test"))
    graft.sources.SplitSource.write(rows, s"$dir/celeba_64")
    val cat = new graft.sources.Catalog(spark)
      .registerCelebA(dir, whichFormat = "64")
    assert(Seq("train", "valid", "test").forall(s =>
      cat.names.contains(s"celeba-64-mini/$s")))
    val raw = cat.load("celeba-64-mini/train")
    assert(AxisLabels.get(raw, "targets") == Some(Seq("target")))
    // uint8_pixels_to_floatX on features ONLY: decoded unit floats in
    // floatX; the 40-wide integer target matrix passes through exact.
    val out = cat.defaultStream("celeba-64-mini/train")
    val ft = out.schema("features").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    assert(ft == Graft.floatX)
    val r5 = out.filter(col("idx") === 5).select("features", "targets").head()
    // seed 5, j 10: (5*31 + 70) % 256 = 225
    assert(math.abs(r5.getSeq[Float](0)(10) - 225f / 255f) < 1e-6)
    assert(r5.getSeq[Int](1) == (0 until 40).map(a => (5 + a) % 2))
    assert(r5.getSeq[Int](1).length == 40)
    assert(cat.defaultStream("celeba-64-mini/valid").count() == 3)
    // the format parameter picks the filename; invalid formats reject
    intercept[IllegalArgumentException] {
      new graft.sources.Catalog(spark).registerCelebA(dir, whichFormat = "128")
    }
  }

  test("dogs-vs-cats: ragged decoded pixels, scale-only defaults (no cast), unlabeled test split (dogs_vs_cats.py:6-30)") {
    val dir = java.nio.file.Files.createTempDirectory("dvc-mini").toString
    // Ragged: every image its own (h=2, w=3+idx%3, c=3) size — vlen
    // uint8 + shapes companion in the reference, native lists here.
    val pxs = expr(
      "transform(sequence(1, CAST(2 * (3 + idx % 3) * 3 AS INT)), " +
        "j -> CAST((idx * 13 + j * 5) % 256 AS INT))")
    val shapes = expr(
      "array(CAST(3 AS INT), CAST(2 AS INT), CAST(3 + idx % 3 AS INT))")
    val rows = spark.range(12).select(col("id").as("idx"))
      .withColumn("image_features", pxs)
      .withColumn("image_features_shapes", shapes)
      .withColumn("targets",
        when(col("idx") < 8, (col("idx") % 2).cast("int"))
          .otherwise(lit(null).cast("int")))
      .withColumn("split", when(col("idx") < 8, "train").otherwise("test"))
    graft.sources.SplitSource.write(rows, dir)
    val cat = new graft.sources.Catalog(spark).registerDogsVsCats(dir)
    val raw = cat.load("dogs-vs-cats-mini/train")
    assert(AxisLabels.get(raw, "image_features") ==
      Some(Seq("channel", "height", "width")))
    // defaults = ScaleAndShift(1/255, 0) ONLY — no floatX cast
    // (dogs_vs_cats.py:24-25): element type is double, not Graft.floatX.
    val out = cat.defaultStream("dogs-vs-cats-mini/train")
    val ft = out.schema("image_features").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    assert(ft == org.apache.spark.sql.types.DoubleType)
    val r4 = out.filter(col("idx") === 4)
      .select("image_features", "image_features_shapes", "targets").head()
    // raggedness: idx 4 -> w = 3 + 1 = 4, so 2*4*3 = 24 px
    assert(r4.getSeq[Double](0).length == 24)
    // (4*13 + 2*5) % 256 = 62, scaled
    assert(math.abs(r4.getSeq[Double](0)(1) - 62.0 / 255) < 1e-12)
    assert(r4.getSeq[Int](1) == Seq(3, 2, 4)) // companions untouched
    assert(r4.getInt(2) == 0)
    // test split: rows exist, targets source absent (null) — the split
    // dict omission, as data
    val test = cat.defaultStream("dogs-vs-cats-mini/test")
    assert(test.count() == 4)
    assert(test.filter(col("targets").isNull).count() == 4)
    // ragged width-5 row keeps its own length: idx 8 -> 2 * 5 * 3 = 30
    assert(test.filter(col("idx") === 8).select("image_features").head()
      .getSeq[Double](0).length == 30)
  }
}
