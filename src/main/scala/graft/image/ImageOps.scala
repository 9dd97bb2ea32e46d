package graft.image

import java.awt.geom.AffineTransform
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Stable

/** Image operators (reference: fuel/transformers/image.py:18-368,
  * fuel/transformers/defaults.py:12-42). Images travel as opaque `binary`
  * columns plus typed metadata — the multimodal-column pattern for a
  * 100 TB pipeline: the *plumbing* (schema, partitioning, batch shape) is
  * columnar and distributed; the pixel kernels are executor-side JVM UDFs
  * over `javax.imageio`/AWT (PNG/JPEG decode ships with the JDK — real
  * decode, not a stub). Decoded frames are `struct<h,w,c,px:binary>` with
  * px in HWC uint8 layout (fuel stores CHW; HWC matches BufferedImage and
  * converts at the consumer edge like vlen reshape, hdf5.py:545-552).
  *
  * Randomized ops (crop, rotation) derive per-row seeds from a stable id
  * ([[Stable.hash64]] semantics via splitmix) so results are deterministic
  * under retries and speculation — stricter than the reference's shared
  * RNG (image.py:210-216).
  */
object ImageOps {
  // ImageIO defaults to FILE-backed stream caches: every read/write spills
  // through a temp file on disk. One temp file per row per executor thread
  // is an I/O disaster at scale (and measurably dominates small-image
  // decode). Memory-cached streams instead; runs once per executor JVM at
  // class load.
  ImageIO.setUseCache(false)

  case class Frame(h: Int, w: Int, c: Int, px: Array[Byte])

  // ------------------------------------------------------------- kernels
  // Raster byte-array access, not per-pixel get/setRGB (which routes every
  // pixel through the color model — an order of magnitude slower).
  private def toFrame(img: BufferedImage): Frame = {
    val (h, w) = (img.getHeight, img.getWidth)
    val bgrImg =
      if (img.getType == BufferedImage.TYPE_3BYTE_BGR) img
      else {
        val c = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
        val g = c.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose()
        c
      }
    val bgr = bgrImg.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    val px = new Array[Byte](h * w * 3)
    var i = 0
    while (i < h * w) { // BGR raster -> RGB frame
      px(3 * i) = bgr(3 * i + 2); px(3 * i + 1) = bgr(3 * i + 1); px(3 * i + 2) = bgr(3 * i)
      i += 1
    }
    Frame(h, w, 3, px)
  }

  private def toImage(f: Frame): BufferedImage = {
    val img = new BufferedImage(f.w, f.h, BufferedImage.TYPE_3BYTE_BGR)
    val bgr = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var i = 0
    while (i < f.h * f.w) { // RGB frame -> BGR raster
      bgr(3 * i) = f.px(3 * i + 2); bgr(3 * i + 1) = f.px(3 * i + 1); bgr(3 * i + 2) = f.px(3 * i)
      i += 1
    }
    img
  }

  private def splitmix(seed: Long): Long = Stable.splitmix(seed)

  /** Encode a Frame as PNG bytes (converter/sink helper + test fixtures). */
  def encodePng(f: Frame): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(toImage(f), "png", out)
    out.toByteArray
  }

  // ----------------------------------------------------------------- UDFs
  /** Decode PNG/JPEG bytes → Frame (fuel ImagesFromBytes, image.py:18-102). */
  val imagesFromBytes = udf { (bytes: Array[Byte]) =>
    Option(ImageIO.read(new ByteArrayInputStream(bytes))).map(toFrame)
  }

  /** Upscale below a minimum (h, w), preserving aspect via independent
    * scale like the reference (fuel MinimumImageDimensions, image.py:105-175:
    * each dimension scaled up to its minimum). Bilinear. */
  def minimumImageDimensions(minH: Int, minW: Int) = udf { (f: Frame) =>
    if (f.h >= minH && f.w >= minW) f
    else {
      val nh = math.max(f.h, minH); val nw = math.max(f.w, minW)
      val src = toImage(f)
      val dst = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, nw, nh, null)
      g.dispose()
      toFrame(dst)
    }
  }

  /** Seeded random crop of fixed (h, w) (fuel RandomFixedSizeCrop,
    * image.py:178-271; the Cython window_batch_bchw fast path maps to this
    * executor-parallel columnar kernel). Offsets from a per-row seed. */
  def randomFixedSizeCrop(cropH: Int, cropW: Int, seed: Long) = udf { (f: Frame, id: Long) =>
    require(f.h >= cropH && f.w >= cropW,
      s"image ${f.h}x${f.w} smaller than crop ${cropH}x$cropW")
    val r1 = splitmix(seed ^ id)
    val r2 = splitmix(r1)
    val offY = (math.floorMod(r1, (f.h - cropH + 1).toLong)).toInt
    val offX = (math.floorMod(r2, (f.w - cropW + 1).toLong)).toInt
    val px = new Array[Byte](cropH * cropW * f.c)
    var y = 0
    while (y < cropH) {
      System.arraycopy(f.px, ((y + offY) * f.w + offX) * f.c, px, y * cropW * f.c, cropW * f.c)
      y += 1
    }
    Frame(cropH, cropW, f.c, px)
  }

  /** Seeded uniform rotation in [-maxAngle, maxAngle] degrees
    * (fuel Random2DRotation, image.py:274-368). Output dims unchanged. */
  def random2DRotation(maxAngle: Double, seed: Long) = udf { (f: Frame, id: Long) =>
    val u = (splitmix(seed ^ id) >>> 11).toDouble / (1L << 53).toDouble
    val angle = math.toRadians((2 * u - 1) * maxAngle)
    val src = toImage(f)
    val dst = new BufferedImage(f.w, f.h, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    val t = AffineTransform.getRotateInstance(angle, f.w / 2.0, f.h / 2.0)
    g.drawImage(src, t, null)
    g.dispose()
    toFrame(dst)
  }

  /** uint8 array column → binary (fuel ToBytes, defaults.py:12-37). */
  def toBytes(ints: Column): Column =
    udf { (xs: Seq[Int]) => xs.map(_.toByte).toArray }.apply(ints)

  /** Grayscale 8x8 thumbnail frame from a float vector in [-1,1] — used to
    * materialize image fixtures from the embeddings table in queries.
    * Quantization runs in DOUBLE on purpose: float32 parquet values promote
    * to double exactly, and IEEE double `(v + 1.0) * 127.5` then truncate-
    * toward-zero is bit-identical in any engine — so the pixel bytes are a
    * closed form the DuckDB oracle can recompute (q36's content oracle;
    * a float32 pipeline here could land on the other side of an integer
    * boundary vs the oracle's double arithmetic). */
  val frameFromVector = udf { (vec: Seq[Float]) =>
    val side = math.sqrt(vec.size.toDouble).toInt
    val px = new Array[Byte](side * side * 3)
    var i = 0
    while (i < side * side) {
      val v = math.max(0, math.min(255, ((vec(i).toDouble + 1.0) * 127.5).toInt)).toByte
      px(3 * i) = v; px(3 * i + 1) = v; px(3 * i + 2) = v
      i += 1
    }
    Frame(side, side, 3, px)
  }

  /** Crop of fixed (h, w) at EXPLICIT offsets carried as columns — the
    * deterministic sibling of [[randomFixedSizeCrop]] (same copy kernel,
    * offsets supplied by the caller instead of derived from splitmix).
    * Lets a query derive offsets from [[Stable.seededHash]] — the engine's
    * cross-engine-stable randomness — so the crop window is replayable by
    * an external oracle (q36). */
  def cropAt(cropH: Int, cropW: Int) = udf { (f: Frame, offY: Int, offX: Int) =>
    require(offY >= 0 && offX >= 0 && offY + cropH <= f.h && offX + cropW <= f.w,
      s"crop ${cropH}x$cropW at ($offY,$offX) outside image ${f.h}x${f.w}")
    val px = new Array[Byte](cropH * cropW * f.c)
    var y = 0
    while (y < cropH) {
      System.arraycopy(f.px, ((y + offY) * f.w + offX) * f.c, px, y * cropW * f.c, cropW * f.c)
      y += 1
    }
    Frame(cropH, cropW, f.c, px)
  }

  /** Pixel bytes as unsigned-decimal text ("138 140 255 ...", row-major,
    * channels interleaved) — the canonical serialization the content
    * oracle hashes: `Stable.hash64(pxString)` on the Spark side equals
    * DuckDB's md5 of the same space-joined string, giving the codec round
    * trip a pixel-exact cross-engine check with scalar output (the driver
    * comparator cannot sort array columns). */
  val pxString = udf { (f: Frame) =>
    f.px.iterator.map(b => (b & 0xff).toString).mkString(" ")
  }

  /** Sum of unsigned pixel bytes — the closed-form companion stat to
    * [[pxString]] (a human-diffable scalar when the hash mismatches). */
  val pxSum = udf { (f: Frame) =>
    var s = 0L; var i = 0
    while (i < f.px.length) { s += (f.px(i) & 0xff); i += 1 }
    s
  }

  /** Frame → flat float pixel array in [0, 1] (row-major, channels
    * interleaved): fuel's `uint8_pixels_to_floatX` landing
    * (fuel/transformers/defaults.py:6-13) for DECODED image columns —
    * the tail of a binary-image default chain (decode with
    * [[imagesFromBytes]], then this; see Catalog.registerCifar10). */
  val pxToUnit = udf { (f: Frame) => f.px.map(b => (b & 0xff) / 255.0f) }

  /** PNG-encode UDF (binaryFile→parquet converter jobs + fixtures). */
  val encodePngUdf = udf { (f: Frame) => encodePng(f) }

  /** Perceptual difference hash (dHash, 64-bit) — the image analog of
    * [[graft.dedup.Dedup.simhashColumn]]: near-duplicate images (resaves,
    * mild brightness/contrast shifts, small crops) differ in a few bits,
    * so the existing banded-Hamming machinery
    * ([[graft.dedup.Dedup.simhashNearDup]]) finds image near-dups with
    * no new shuffle pattern. Pipeline: integer grayscale
    * (299·r + 587·g + 114·b — never divided, scale cancels in the
    * compare), 9×8 BOX-AVERAGE downscale with exact integer division
    * (floor cell boundaries i·h div 8 / j·w div 9 — NOT Graphics2D,
    * whose interpolation is implementation-defined), bit (i,j) set iff
    * cell(i,j) > cell(i,j+1) (the horizontal gradient sign). A pure
    * function of the pixel bytes — deterministic under retries and
    * identical on any JVM. Images smaller than 9×8 hash to null (no
    * meaningful gradient grid; filter or upscale first with
    * [[minimumImageDimensions]]). */
  val dHash = udf { (f: Frame) =>
    if (f.h < 8 || f.w < 9) None
    else {
      val cells = Array.ofDim[Long](8, 9)
      var i = 0
      while (i < 8) {
        val r0 = i * f.h / 8; val r1 = (i + 1) * f.h / 8
        var j = 0
        while (j < 9) {
          val c0 = j * f.w / 9; val c1 = (j + 1) * f.w / 9
          var sum = 0L
          var r = r0
          while (r < r1) {
            var c = c0
            while (c < c1) {
              val p = 3 * (r * f.w + c)
              sum += 299L * (f.px(p) & 0xff) + 587L * (f.px(p + 1) & 0xff) +
                114L * (f.px(p + 2) & 0xff)
              c += 1
            }
            r += 1
          }
          cells(i)(j) = sum / ((r1 - r0).toLong * (c1 - c0))
          j += 1
        }
        i += 1
      }
      var bits = 0L
      var k = 0
      while (k < 64) {
        val (i2, j2) = (k / 8, k % 8)
        if (cells(i2)(j2) > cells(i2)(j2 + 1)) bits |= (1L << k)
        k += 1
      }
      Some(bits)
    }
  }
}
