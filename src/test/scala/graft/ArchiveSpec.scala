package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.sources.Archive]] — the tar(-of-tars) ingest path, the ILSVRC
  * converter analog (fuel/converters/ilsvrc2010.py:204-316). */
class ArchiveSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  /** Build a tar in memory: (name, bytes) entries plus one directory
    * entry (which ingest must skip). */
  private def mkTar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val tar = new TarArchiveOutputStream(bos)
    tar.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    val dir = new TarArchiveEntry("somedir/")
    tar.putArchiveEntry(dir); tar.closeArchiveEntry()
    entries.foreach { case (name, bytes) =>
      val e = new TarArchiveEntry(name)
      e.setSize(bytes.length.toLong)
      tar.putArchiveEntry(e); tar.write(bytes); tar.closeArchiveEntry()
    }
    tar.finish(); tar.close()
    bos.toByteArray
  }

  test("tarEntries: tar-of-tars expands one level; gzip, dirs, and bytes round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("archive-spec").toString
    // inner class tar (the ILSVRC per-class shape) with two "JPEGs"
    val inner = mkTar(Seq(
      "n01/img1.jpg" -> Array[Byte](1, 2, 3, 4),
      "n01/img2.jpg" -> Array[Byte](5, 6)))
    // a doubly-nested tar must NOT be followed (one level only)
    val deeper = mkTar(Seq("too/deep.txt" -> "x".getBytes("UTF-8")))
    val innerWithTar = mkTar(Seq("nested.tar" -> deeper))
    // outer tar: two inner tars + a loose metadata file
    val outer = mkTar(Seq(
      "train/n01.tar" -> inner,
      "train/n02.tar" -> innerWithTar,
      "meta.txt" -> "hello".getBytes("UTF-8")))
    val f1 = new FileOutputStream(s"$dir/train.tar")
    f1.write(outer); f1.close()
    // and a gzipped sibling with one file
    val gz = new GzipCompressorOutputStream(new FileOutputStream(s"$dir/extra.tar.gz"))
    gz.write(mkTar(Seq("extra/a.bin" -> Array[Byte](9, 9, 9)))); gz.close()

    val rows = graft.sources.Archive.tarEntries(spark, s"$dir/*")
      .collect().map(r => (r.getString(1), r.getAs[Array[Byte]](3))).toMap
    // inner-tar entries surface with the outer!inner name and exact bytes
    assert(rows("train/n01.tar!n01/img1.jpg").toSeq == Seq[Byte](1, 2, 3, 4))
    assert(rows("train/n01.tar!n01/img2.jpg").toSeq == Seq[Byte](5, 6))
    // loose files pass through unprefixed
    assert(new String(rows("meta.txt"), "UTF-8") == "hello")
    // one level only: the doubly-nested tar stays opaque BYTES
    assert(rows("train/n02.tar!nested.tar").toSeq == deeper.toSeq)
    assert(!rows.contains("train/n02.tar!nested.tar!too/deep.txt"))
    // gzipped archives decompress in-stream
    assert(rows("extra/a.bin").toSeq == Seq[Byte](9, 9, 9))
    // directory entries never become rows
    assert(!rows.keys.exists(_.contains("somedir")))
    assert(rows.size == 5, s"got ${rows.keys.toSeq.sorted}")
    // nested=false keeps inner tars opaque
    val flat = graft.sources.Archive.tarEntries(spark, s"$dir/train.tar",
        nested = false)
      .collect().map(_.getString(1)).toSet
    assert(flat == Set("train/n01.tar", "train/n02.tar", "meta.txt"))
    // and the frame writes to parquet (the converter's storage edge):
    // content round-trips binary-exact
    val out = s"$dir/out"
    graft.sources.Archive.tarEntries(spark, s"$dir/*")
      .write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == 5)
    assert(back.filter(col("entry") === "train/n01.tar!n01/img1.jpg")
      .select("n_bytes").head().getLong(0) == 4L)
  }
}
