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

  /** Demuxed-but-not-decoded clip: geometry + the byte window of every
    * vids frame chunk. Produced by the header-only [[scanChunks]] walk so
    * frame SAMPLING can decode just the sampled frames — the walk reads
    * 8-byte chunk headers (O(frames) header reads), never pixel bytes.
    * This deliberately does NOT use the optional 'idx1' index chunk: idx1
    * may be absent (our own [[encode]] emits none) or truncated, so the
    * chunk walk is the mandatory fallback anyway, and it already costs
    * ~nothing relative to one frame decode. Every frame window is
    * size-validated at scan time, so a truncated clip fails loudly here
    * even when the truncated frame is not among the sampled ones. */
  private case class ClipIndex(w: Int, h: Int, topDown: Boolean,
      chunks: IndexedSeq[(Int, Int)]) // (bodyOffset, bytesAvailable)

  /** Demux + decode every video frame ('NNdb'/'NNdc' chunks of the first
    * 'vids' stream) to RGB24 top-down [[Frame]]s. Fails with a clear
    * message on anything that is not an uncompressed 24-bit AVI. */
  def decodeFrames(bytes: Array[Byte]): IndexedSeq[Frame] = {
    val ix = scanChunks(bytes)
    ix.chunks.map { case (o, avail) =>
      dibToFrame(bytes, o, avail, ix.w, ix.h, ix.topDown) }
  }

  private def scanChunks(bytes: Array[Byte]): ClipIndex = {
    require(bytes.length >= 12 && fcc(bytes, 0) == "RIFF" && fcc(bytes, 8) == "AVI ",
      s"not a RIFF/AVI container (${bytes.length} bytes) — the pure-JVM " +
        "fallback decodes uncompressed AVI only; other containers need ffmpeg")
    val riffEnd = math.min(bytes.length.toLong, 8L + u32(bytes, 4)).toInt
    var w = 0; var h = 0; var topDown = false
    var streamIdx = -1; var vidsStream = -1; var lastWasVids = false
    val frames = IndexedSeq.newBuilder[(Int, Int)]
    def walk(from: Int, to: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val id = fcc(bytes, o)
        // Chunk size is an unsigned 32-bit field: keep it as Long — a
        // declared size above Int.MaxValue in a corrupt file must reject
        // loudly below, not wrap negative and walk the offset backwards.
        val sz = u32(bytes, o + 4)
        val body = o + 8
        val end = math.min(body.toLong + sz, to.toLong).toInt
        if (id == "LIST") walk(body + 4, end) // skip the 4-byte list type
        else if (id == "strh") {
          // end is clamped to the bytes actually present: a file truncated
          // mid-header must fail with this message, not an array trap.
          require(end - body >= 4,
            s"truncated strh header (${end - body} of 4+ bytes present)")
          streamIdx += 1
          lastWasVids = fcc(bytes, body) == "vids"
          if (lastWasVids && vidsStream < 0) vidsStream = streamIdx
        } else if (id == "strf" && lastWasVids) {
          require(end - body >= 20,
            s"truncated strf header (${end - body} of 20+ bytes present)")
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
          // Bound geometry so stride*h arithmetic below can never overflow
          // Int on a corrupt header (16384^2 * 3 < 2^31).
          require(w > 0 && h > 0 && w <= 16384 && h <= 16384,
            s"vids geometry ${w}x$h out of the supported (0, 16384] range")
          lastWasVids = false
        } else if (vidsStream >= 0 && id.length == 4 &&
            id.startsWith(f"$vidsStream%02d") &&
            (id.endsWith("db") || id.endsWith("dc"))) {
          require(w > 0 && h > 0, "frame chunk before the vids strf header")
          // Bound the frame by the bytes ACTUALLY present (end is clamped
          // to the walk window), not the declared size, and validate the
          // window size HERE — so a truncated clip fails loudly at scan
          // time even if the truncated frame is never decoded (sampling).
          val stride = ((w * 3 + 3) / 4) * 4
          require(end - body >= stride * h,
            s"frame chunk has ${end - body} bytes < ${stride * h} " +
              s"(${w}x$h, stride $stride) — truncated or corrupt clip")
          frames += ((body, end - body))
        }
        // Word-aligned chunks; Long arithmetic on a u32 size means the
        // offset always strictly advances (next >= o + 8), and a declared
        // size that overruns the window clamps to `to` and ends the walk.
        val next = body.toLong + sz + (sz & 1L)
        o = if (next > to) to else next.toInt
      }
    }
    walk(12, riffEnd)
    require(vidsStream >= 0, "AVI has no 'vids' stream")
    ClipIndex(w, h, topDown, frames.result())
  }

  /** Sample `n` frames evenly WITHOUT decoding the rest: one header-only
    * [[scanChunks]] pass finds every frame's byte window (validating all
    * of them), then only the [[Ffmpeg.evenIndices]] picks are decoded —
    * O(scan + n·pixels) instead of O(frames·pixels). Same (index, frame)
    * contract as decode-then-sample, spec'd equal to it. */
  def sampleDecodedFrames(bytes: Array[Byte], n: Int): Seq[(Int, Frame)] = {
    val ix = scanChunks(bytes)
    Ffmpeg.evenIndices(ix.chunks.length, n).map { i =>
      val (o, avail) = ix.chunks(i)
      (i, dibToFrame(bytes, o, avail, ix.w, ix.h, ix.topDown))
    }
  }

  /** One DIB frame payload → RGB24 top-down: undo the 4-byte row stride,
    * the bottom-up row order (unless `topDown`) and the BGR byte order.
    * `avail` is the bytes actually present in the buffer for this chunk
    * (declared size clamped to the container window), so a truncated file
    * fails here with a clear message rather than an array bounds trap. */
  private def dibToFrame(b: Array[Byte], off: Int, avail: Int,
      w: Int, h: Int, topDown: Boolean): Frame = {
    val stride = ((w * 3 + 3) / 4) * 4
    require(avail >= stride * h,
      s"frame chunk has $avail bytes < ${stride * h} (${w}x$h, stride $stride) — truncated or corrupt clip")
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

  private def w32(bb: java.io.ByteArrayOutputStream, v: Int): Unit = {
    bb.write(v & 0xff); bb.write((v >> 8) & 0xff)
    bb.write((v >> 16) & 0xff); bb.write((v >> 24) & 0xff)
  }
  private def w16(bb: java.io.ByteArrayOutputStream, v: Int): Unit = {
    bb.write(v & 0xff); bb.write((v >> 8) & 0xff)
  }
  private def wfcc(bb: java.io.ByteArrayOutputStream, s: String): Unit =
    bb.write(s.getBytes("US-ASCII"))

  /** Encode RGB24 frames as an uncompressed (BI_RGB 24-bit, bottom-up
    * BGR, 4-byte row stride) AVI — the sink side of this codec tier:
    * [[decodeFrames]]∘encode is the identity on pixel bytes (spec'd), and
    * the emitted container is decodable by any stock player or ffmpeg.
    * All frames must share one geometry (the AVI stream header declares
    * it once). Pure function, executor-side safe; output size is
    * `nFrames · stride · h` plus fixed headers. */
  def encode(frames: Seq[Frame], fps: Int = 25): Array[Byte] = {
    require(frames.nonEmpty, "encode needs at least one frame")
    require(fps > 0, s"fps must be positive: $fps")
    val w = frames.head.w; val h = frames.head.h
    require(frames.forall(f => f.w == w && f.h == h && f.c == 3),
      "all frames must share one geometry with c=3")
    val stride = ((w * 3 + 3) / 4) * 4
    val frameBytes = stride * h
    val bb = new java.io.ByteArrayOutputStream()
    // strh: fccType vids, handler 'DIB ', rate fps/1, length nFrames
    val strh = new java.io.ByteArrayOutputStream()
    wfcc(strh, "vids"); wfcc(strh, "DIB "); w32(strh, 0); w16(strh, 0); w16(strh, 0)
    w32(strh, 0); w32(strh, 1); w32(strh, fps); w32(strh, 0)
    w32(strh, frames.length); w32(strh, frameBytes); w32(strh, 0xffffffff)
    w32(strh, 0); w16(strh, 0); w16(strh, 0); w16(strh, w); w16(strh, h)
    // strf: BITMAPINFOHEADER, BI_RGB 24-bit, positive height = bottom-up
    val strf = new java.io.ByteArrayOutputStream()
    w32(strf, 40); w32(strf, w); w32(strf, h); w16(strf, 1); w16(strf, 24)
    w32(strf, 0); w32(strf, frameBytes); w32(strf, 0); w32(strf, 0)
    w32(strf, 0); w32(strf, 0)
    // dwMaxBytesPerSec is a u32 advisory field players may ignore; it must
    // not silently wrap for huge frame×fps products — saturate instead.
    val maxBytesPerSec =
      math.min(frameBytes.toLong * fps, 0xffffffffL).toInt
    val avih = new java.io.ByteArrayOutputStream()
    w32(avih, 1000000 / fps); w32(avih, maxBytesPerSec)
    w32(avih, 0); w32(avih, 0); w32(avih, frames.length); w32(avih, 0)
    w32(avih, 1); w32(avih, frameBytes); w32(avih, w); w32(avih, h)
    w32(avih, 0); w32(avih, 0); w32(avih, 0); w32(avih, 0)
    val strlLen = 4 + 8 + strh.size() + 8 + strf.size()
    val hdrlLen = 4 + 8 + avih.size() + 8 + strlLen
    val moviLen = 4 + frames.length * (8 + frameBytes)
    wfcc(bb, "RIFF"); w32(bb, 4 + 8 + hdrlLen + 8 + moviLen); wfcc(bb, "AVI ")
    wfcc(bb, "LIST"); w32(bb, hdrlLen); wfcc(bb, "hdrl")
    wfcc(bb, "avih"); w32(bb, avih.size()); avih.writeTo(bb)
    wfcc(bb, "LIST"); w32(bb, strlLen); wfcc(bb, "strl")
    wfcc(bb, "strh"); w32(bb, strh.size()); strh.writeTo(bb)
    wfcc(bb, "strf"); w32(bb, strf.size()); strf.writeTo(bb)
    wfcc(bb, "LIST"); w32(bb, moviLen); wfcc(bb, "movi")
    frames.foreach { f =>
      wfcc(bb, "00db"); w32(bb, frameBytes)
      var y = h - 1 // bottom-up rows
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val s = 3 * (y * w + x)
          bb.write(f.px(s + 2) & 0xff); bb.write(f.px(s + 1) & 0xff)
          bb.write(f.px(s) & 0xff) // RGB frame -> BGR raster
          x += 1
        }
        var p = w * 3
        while (p < stride) { bb.write(0); p += 1 } // row stride padding
        y -= 1
      }
    }
    bb.toByteArray
  }

  /** The Spark-side ingest column for the no-ffmpeg path: decode ONCE per
    * clip executor-side, sample `n` frames evenly — (frame_idx, frame)
    * pairs, the same [[Ffmpeg.evenIndices]] sampling contract and the
    * same posexplode shape as [[Ffmpeg.sampleFramesCli]]. Frames keep the
    * clip's NATIVE geometry: this path deliberately ships no scaler — a
    * JVM resampler would silently diverge from ffmpeg's scaler, and the
    * Frame's own (h, w) columns make the geometry explicit downstream.
    * Decodes ONLY the sampled frames ([[sampleDecodedFrames]]): the
    * header-only chunk scan finds and validates every frame window, then
    * n pixel decodes run instead of all of them. */
  def sampleFramesJvm(bytes: Column, n: Int): Column = {
    require(n > 0, s"frame sample count must be positive: $n")
    val sample = udf { (b: Array[Byte]) => sampleDecodedFrames(b, n) }
    sample(bytes)
  }
}
