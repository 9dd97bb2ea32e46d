package graft.image

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.image.ImageOps.Frame

/** Real video decode at the converter edge via the ffmpeg CLI — the
  * reference's converter-tier pattern (fuel's ILSVRC ingest shells out to
  * batch codec work at conversion time, fuel/converters/ilsvrc2010.py:
  * 204-316) without JNI: one subprocess per clip emits rawvideo RGB24 at
  * a fixed target geometry, parsed into [[ImageOps.Frame]] rows.
  *
  * Division of labor with [[VideoOps]]: VideoOps owns the Spark-side
  * plumbing (binary column in, evenly-spaced sampling, struct rows out)
  * with a swappable kernel and keeps its clearly-marked deterministic
  * fake as the hermetic test double; THIS object is the production
  * kernel. The decode contract is deterministic: fixed scale (w×h),
  * fixed pix_fmt rgb24, frames in stream order — so the sampled indices
  * and bytes are reproducible for a given ffmpeg build.
  *
  * Scale shape: the subprocess runs EXECUTOR-side, one per clip row
  * (converter-edge parallelism = Spark's own; no driver loop), and the
  * clip lands on local disk only transiently (ffmpeg needs a seekable
  * input for mp4-family containers whose moov atom trails the data —
  * piping stdin would fail exactly there). Frame bytes are bounded by
  * the TARGET geometry (w·h·3 per frame), not the source resolution, so
  * executor memory is sized by (w, h, clip length), independent of input
  * files.
  */
object Ffmpeg {

  /** Is `binary` runnable? (Converter CLI gate — fail fast with a clear
    * message instead of per-row subprocess errors.) */
  def available(binary: String = "ffmpeg"): Boolean =
    try {
      val p = new ProcessBuilder(binary, "-version").start()
      p.getInputStream.readAllBytes(); p.getErrorStream.readAllBytes()
      p.waitFor() == 0
    } catch { case _: java.io.IOException => false }

  /** Decode a whole clip to RGB24 frames at `w`×`h` via one ffmpeg
    * subprocess. The clip bytes are staged to a temp file (seekable
    * input — see the scaladoc above), stdout is the concatenated
    * rawvideo stream (`nFrames · w·h·3` bytes), stderr (at `-v error`)
    * is surfaced in the failure message. */
  def decodeFrames(bytes: Array[Byte], w: Int, h: Int,
      binary: String = "ffmpeg", timeoutSec: Long = 300): IndexedSeq[Frame] = {
    require(w > 0 && h > 0, s"target geometry must be positive: ${w}x$h")
    require(timeoutSec > 0, s"decode timeout must be positive: $timeoutSec")
    val tmp = Files.createTempFile("graft-clip", ".bin")
    var proc: Process = null
    try {
      Files.write(tmp, bytes)
      proc = new ProcessBuilder(
        binary, "-v", "error", "-i", tmp.toString,
        "-f", "rawvideo", "-pix_fmt", "rgb24",
        "-vf", s"scale=$w:$h", "pipe:1").start()
      // BOTH pipes drain on their own threads: a partially corrupt clip
      // can emit one '-v error' line per bad packet — past the ~64 KB
      // pipe buffer ffmpeg would block writing stderr while we block
      // reading stdout, deadlocking the executor task. With the reads
      // off-thread, the main thread's only blocking call is the BOUNDED
      // waitFor below, so a demuxer stall on a malformed container can
      // never pin the Spark task past `timeoutSec` — the process is
      // destroyed and the task fails loudly instead.
      val outBuf = new java.io.ByteArrayOutputStream()
      val errBuf = new java.io.ByteArrayOutputStream()
      val outDrainer = new Thread(() => proc.getInputStream.transferTo(outBuf))
      val errDrainer = new Thread(() => proc.getErrorStream.transferTo(errBuf))
      outDrainer.setDaemon(true); errDrainer.setDaemon(true)
      outDrainer.start(); errDrainer.start()
      val finished = proc.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
      if (!finished) proc.destroyForcibly()
      outDrainer.join(10000)
      errDrainer.join(10000)
      val err = errBuf.toString(UTF_8)
      require(finished,
        s"ffmpeg did not finish within ${timeoutSec}s (killed): $err")
      val rc = proc.exitValue()
      require(rc == 0, s"ffmpeg exited $rc: $err")
      val out = outBuf.toByteArray
      val per = w * h * 3
      require(out.length % per == 0,
        s"rawvideo stream length ${out.length} is not a multiple of " +
          s"frame size $per (${w}x${h}x3)")
      (0 until out.length / per).map { i =>
        Frame(h, w, 3, java.util.Arrays.copyOfRange(out, i * per, (i + 1) * per))
      }
    } finally {
      // Failure paths (geometry require, interrupt, I/O error) must not
      // orphan the subprocess executor-side.
      if (proc != null && proc.isAlive) proc.destroyForcibly()
      Files.delete(tmp)
    }
  }

  /** Evenly-spaced `n`-of-`total` frame indices — THE shared sampling
    * contract ([[VideoOps.sampleFrames]] uses the identical formula):
    * first and last frame included whenever n > 1. */
  def evenIndices(total: Int, n: Int): Seq[Int] = {
    require(n > 0, s"frame sample count must be positive: $n")
    val take = math.min(n, total)
    if (take <= 1) Seq(0).filter(_ => total > 0)
    else (0 until take).map(i => (i.toLong * (total - 1) / (take - 1)).toInt)
  }

  /** The Spark-side ingest column: decode ONCE per clip executor-side,
    * sample `n` frames evenly — (frame_idx, frame) pairs, posexplode
    * downstream exactly like [[VideoOps.sampleFrames]]. The whole-clip
    * decode amortizes the subprocess across all sampled frames (a
    * per-frame kernel would re-decode the clip n times). */
  def sampleFramesCli(bytes: Column, n: Int, w: Int, h: Int,
      binary: String = "ffmpeg"): Column = {
    require(n > 0, s"frame sample count must be positive: $n")
    val sample = udf { (b: Array[Byte]) =>
      val frames = decodeFrames(b, w, h, binary)
      evenIndices(frames.length, n).map(i => (i, frames(i)))
    }
    sample(bytes)
  }
}
