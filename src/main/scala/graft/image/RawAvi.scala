package graft.image

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import graft.image.ImageOps.Frame

/** Pure-JVM decoder for UNCOMPRESSED (BI_RGB 24-bit) video in an AVI
  * container — the no-external-binary fallback of the converter-edge
  * codec tier (reference pattern: fuel's converters shell out for codec
  * work, fuel/converters/ilsvrc2010.py:204-316; fuel's test suite skips
  * codec coverage entirely when the binary is absent,
  * fuel/tests/__init__.py:7-44 — this engine instead ships a second,
  * always-on implementation for the one format that needs no codec
  * math, so the container-byte decode path runs green in every CI).
  *
  * Scope is deliberately minimal: RIFF/AVI demux + DIB frame raster
  * convention (bottom-up rows unless biHeight < 0, BGR byte order, rows
  * padded to 4-byte boundaries). Compressed streams (H.264/VP9/…) are
  * out of scope — they need [[Ffmpeg]]; this decoder REJECTS them loudly
  * (biCompression != 0) rather than guessing. Output frames are RGB24
  * top-down at native geometry — byte-identical to what
  * `ffmpeg -pix_fmt rgb24` emits for the same clip at identity scale,
  * which is what lets the two kernels cross-check each other
  * (VideoSpec asserts bit-equality whenever a real ffmpeg is present).
  *
  * Scale shape: one pure function per clip row, executor-side, no
  * subprocess, no temp file; memory is bounded by the clip's own frame
  * bytes. Used by [[graft.Convert]] when [[Ffmpeg.available]] is false.
  */
object RawAvi {

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def fcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Demux + decode every video frame ('NNdb'/'NNdc' chunks of the first
    * 'vids' stream) to RGB24 top-down [[Frame]]s. Fails with a clear
    * message on anything that is not an uncompressed 24-bit AVI. */
  def decodeFrames(bytes: Array[Byte]): IndexedSeq[Frame] = {
    require(bytes.length >= 12 && fcc(bytes, 0) == "RIFF" && fcc(bytes, 8) == "AVI ",
      s"not a RIFF/AVI container (${bytes.length} bytes) — the pure-JVM " +
        "fallback decodes uncompressed AVI only; other containers need ffmpeg")
    val riffEnd = math.min(bytes.length.toLong, 8L + u32(bytes, 4)).toInt
    var w = 0; var h = 0; var topDown = false
    var streamIdx = -1; var vidsStream = -1; var lastWasVids = false
    val frames = IndexedSeq.newBuilder[Frame]
    def walk(from: Int, to: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val id = fcc(bytes, o)
        val sz = u32(bytes, o + 4).toInt
        val body = o + 8
        val end = math.min(body.toLong + sz, to.toLong).toInt
        if (id == "LIST") walk(body + 4, end) // skip the 4-byte list type
        else if (id == "strh") {
          streamIdx += 1
          lastWasVids = fcc(bytes, body) == "vids"
          if (lastWasVids && vidsStream < 0) vidsStream = streamIdx
        } else if (id == "strf" && lastWasVids) {
          // BITMAPINFOHEADER: biWidth @4, biHeight @8 (negative = top-down),
          // biBitCount @14, biCompression @16 (0 = BI_RGB, the only kind
          // this decoder handles).
          w = u32(bytes, body + 4).toInt
          val bh = u32(bytes, body + 8).toInt
          topDown = bh < 0; h = math.abs(bh)
          val bpp = u16(bytes, body + 14)
          val comp = u32(bytes, body + 16)
          require(comp == 0 && bpp == 24,
            s"vids stream is biCompression=$comp biBitCount=$bpp — the " +
              "pure-JVM fallback decodes BI_RGB 24-bit only; use ffmpeg")
          lastWasVids = false
        } else if (vidsStream >= 0 && id.length == 4 &&
            id.startsWith(f"$vidsStream%02d") &&
            (id.endsWith("db") || id.endsWith("dc"))) {
          require(w > 0 && h > 0, "frame chunk before the vids strf header")
          frames += dibToFrame(bytes, body, sz, w, h, topDown)
        }
        o = body + sz + (sz & 1) // chunks are word-aligned
      }
    }
    walk(12, riffEnd)
    require(vidsStream >= 0, "AVI has no 'vids' stream")
    frames.result()
  }

  /** One DIB frame payload → RGB24 top-down: undo the 4-byte row stride,
    * the bottom-up row order (unless `topDown`) and the BGR byte order. */
  private def dibToFrame(b: Array[Byte], off: Int, sz: Int,
      w: Int, h: Int, topDown: Boolean): Frame = {
    val stride = ((w * 3 + 3) / 4) * 4
    require(sz >= stride * h,
      s"frame chunk of $sz bytes < ${stride * h} (${w}x$h, stride $stride)")
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = off + (if (topDown) y else h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val s = srcRow + 3 * x; val d = 3 * (y * w + x)
        px(d) = b(s + 2); px(d + 1) = b(s + 1); px(d + 2) = b(s)
        x += 1
      }
      y += 1
    }
    Frame(h, w, 3, px)
  }

  /** The Spark-side ingest column for the no-ffmpeg path: decode ONCE per
    * clip executor-side, sample `n` frames evenly — (frame_idx, frame)
    * pairs, the same [[Ffmpeg.evenIndices]] sampling contract and the
    * same posexplode shape as [[Ffmpeg.sampleFramesCli]]. Frames keep the
    * clip's NATIVE geometry: this path deliberately ships no scaler — a
    * JVM resampler would silently diverge from ffmpeg's scaler, and the
    * Frame's own (h, w) columns make the geometry explicit downstream. */
  def sampleFramesJvm(bytes: Column, n: Int): Column = {
    require(n > 0, s"frame sample count must be positive: $n")
    val sample = udf { (b: Array[Byte]) =>
      val frames = decodeFrames(b)
      Ffmpeg.evenIndices(frames.length, n).map(i => (i, frames(i)))
    }
    sample(bytes)
  }
}
