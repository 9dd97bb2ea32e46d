package graft

import java.nio.file.{Files, Path}
import java.nio.file.attribute.PosixFilePermissions

import org.apache.spark.sql.functions._

import graft.image.Ffmpeg

/** The ffmpeg-CLI ingest tier ([[graft.image.Ffmpeg]]): everything
  * around the codec — subprocess invocation, temp-file staging, rawvideo
  * stream parsing, frame geometry, the shared even-sampling contract,
  * executor-side Spark plumbing, and the failure paths — driven through
  * a REAL subprocess: a stub `ffmpeg` script that honors the exact CLI
  * contract (`-i <file> -f rawvideo -pix_fmt rgb24 -vf scale=W:H pipe:1`)
  * and emits a deterministic rawvideo stream derived from the input
  * file's size. Only the codec arithmetic itself is faked (this
  * container ships no ffmpeg build); with a real ffmpeg on PATH the same
  * calls ingest real clips — [[Ffmpeg.available]] is the converter
  * CLI's gate.
  */
class VideoSpec extends SparkSpec {

  /** nFrames = 1 + size % 5; byte j of frame i = (i*7 + j + size) % 256 —
    * the stub's emission formula, asserted byte-for-byte below. */
  private def stubFormula(size: Int, i: Int, j: Int): Int =
    (i * 7 + j + size) % 256

  private lazy val stub: Path = {
    val dir = Files.createTempDirectory("stub-ffmpeg")
    val sh = dir.resolve("ffmpeg")
    val script =
      """#!/bin/bash
        |# stub ffmpeg for VideoSpec: deterministic rawvideo from input size
        |if [ "$1" = "-version" ]; then echo "stub ffmpeg"; exit 0; fi
        |in=""; vf=""; prev=""
        |for a in "$@"; do
        |  [ "$prev" = "-i" ] && in="$a"
        |  [ "$prev" = "-vf" ] && vf="$a"
        |  prev="$a"
        |done
        |if [ ! -f "$in" ]; then echo "no such input: $in" >&2; exit 1; fi
        |w=${vf#scale=}; h=${w#*:}; w=${w%%:*}
        |size=$(stat -c%s "$in")
        |if [ "$size" -eq 0 ]; then echo "empty clip" >&2; exit 1; fi
        |n=$((1 + size % 5)); per=$((w * h * 3))
        |for ((i=0;i<n;i++)); do
        |  for ((j=0;j<per;j++)); do
        |    printf "\\$(printf '%03o' $(( (i*7 + j + size) % 256 )))"
        |  done
        |done
        |""".stripMargin
    Files.write(sh, script.getBytes("UTF-8"))
    Files.setPosixFilePermissions(sh, PosixFilePermissions.fromString("rwxr-xr-x"))
    sh
  }

  test("available: true for the stub, false for a nonexistent binary") {
    assert(Ffmpeg.available(stub.toString))
    assert(!Ffmpeg.available("/definitely/not/ffmpeg"))
  }

  test("decodeFrames parses the rawvideo stream into correctly-sized frames") {
    val bytes = Array.tabulate[Byte](103)(k => (k * 3).toByte) // size 103 -> 4 frames
    val frames = Ffmpeg.decodeFrames(bytes, w = 4, h = 3, binary = stub.toString)
    assert(frames.length == 1 + 103 % 5)
    frames.zipWithIndex.foreach { case (f, i) =>
      assert(f.w == 4 && f.h == 3 && f.c == 3)
      assert(f.px.length == 4 * 3 * 3)
      f.px.zipWithIndex.foreach { case (b, j) =>
        assert((b & 0xff) == stubFormula(103, i, j),
          s"frame $i byte $j: got ${b & 0xff}")
      }
    }
  }

  test("decodeFrames surfaces the subprocess's stderr on failure") {
    val e = intercept[IllegalArgumentException] {
      Ffmpeg.decodeFrames(Array.emptyByteArray, 4, 3, binary = stub.toString)
    }
    assert(e.getMessage.contains("empty clip"), e.getMessage)
  }

  test("evenIndices: the shared sampling contract (first/last in, bounded, ordered)") {
    assert(Ffmpeg.evenIndices(10, 4) == Seq(0, 3, 6, 9))
    assert(Ffmpeg.evenIndices(10, 1) == Seq(0))
    assert(Ffmpeg.evenIndices(3, 8) == Seq(0, 1, 2))  // n > total: all frames
    assert(Ffmpeg.evenIndices(0, 4) == Seq())          // empty clip
    for (total <- Seq(1, 2, 5, 97); n <- Seq(1, 2, 3, 7)) {
      val idx = Ffmpeg.evenIndices(total, n)
      assert(idx.length == math.min(n, total))
      assert(idx.head == 0)
      if (idx.length > 1) assert(idx.last == total - 1)
      assert(idx == idx.sorted && idx.distinct == idx)
    }
  }

  test("sampleFramesCli: one subprocess per clip, executor-side, even indices") {
    import SparkSpec.spark.implicits._
    // two clips of different sizes -> different frame counts (2 and 4)
    val clips = Seq(
      (1L, Array.tabulate[Byte](21)(_.toByte)),   // 21 % 5 = 1 -> 2 frames
      (2L, Array.tabulate[Byte](58)(_.toByte)))   // 58 % 5 = 3 -> 4 frames
      .toDF("clip_id", "bytes")
    val out = clips.select(col("clip_id"), posexplode(
        Ffmpeg.sampleFramesCli(col("bytes"), n = 3, w = 2, h = 2,
          binary = stub.toString)).as(Seq("k", "s")))
      .select(col("clip_id"), col("s._1").as("frame_idx"), col("s._2").as("frame"))
      .collect()
    val byClip = out.groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).toSeq).toMap
    assert(byClip(1L) == Seq(0, 1))       // 2 frames, n=3 -> both
    assert(byClip(2L) == Seq(0, 1, 3))    // evenIndices(4, 3)
    val f = out.head.getStruct(2)
    assert(f.getAs[Int]("w") == 2 && f.getAs[Int]("h") == 2)
  }
}
