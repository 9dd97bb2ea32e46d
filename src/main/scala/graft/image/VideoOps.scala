package graft.image

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.image.ImageOps.Frame

/** Video as a multimodal column: opaque container bytes + typed metadata,
  * frame-sampled into [[ImageOps.Frame]] rows for the image operator
  * family downstream.
  *
  * The JVM ships image and WAV codecs, not H.264/VP9 — real video decode
  * lives at the converter edge in [[Ffmpeg]] (one ffmpeg-CLI subprocess
  * per clip, the reference's converter-tier pattern). The kernel here is
  * a DETERMINISTIC FAKE kept as the hermetic test double — clearly
  * marked, swappable: [[sampleFrames]] takes the decode kernel as a
  * parameter, and everything Spark-side (binary column in, evenly-spaced
  * sampling, struct<Frame> rows out, executor parallelism, composition
  * with crop/resize) is real and tested against it. Production ingest
  * uses [[Ffmpeg.sampleFramesCli]] (whole-clip decode, same sampling
  * contract via [[Ffmpeg.evenIndices]]).
  */
object VideoOps {

  /** Decode kernel signature: (container bytes, frame index) → Frame. */
  type DecodeKernel = (Array[Byte], Int) => Frame

  /** THE DETERMINISTIC FAKE DECODER: renders frame `i` as an 8x8 gray
    * frame whose pixels hash the container bytes' length/checksum and the
    * frame index. Stands in for a real codec; do not mistake its output
    * for pixels. */
  val fakeDecode: DecodeKernel = (bytes: Array[Byte], i: Int) => {
    var crc = 0L
    bytes.foreach(b => crc = crc * 31 + (b & 0xff))
    val px = Array.tabulate(8 * 8 * 3) { j =>
      ((crc + i.toLong * 131 + j / 3) % 256).toByte
    }
    Frame(8, 8, 3, px)
  }

  /** Evenly-spaced sample of `n` frames from each container: emits
    * (frame_idx, frame) pairs via posexplode — one row per sampled frame,
    * decoded executor-side by `kernel`. `totalFrames` maps container
    * bytes to the clip's frame count (the fake derives it from length). */
  def sampleFrames(bytes: Column, n: Int,
      kernel: DecodeKernel = fakeDecode,
      totalFrames: Array[Byte] => Int = b => math.max(1, b.length / 64)): Column = {
    require(n > 0, s"frame sample count must be positive: $n")
    val sample = udf { (b: Array[Byte]) =>
      // evenly spaced indices 0 .. total-1 (first/last included when
      // n>1) — ONE shared formula with the ffmpeg-CLI ingest path.
      Ffmpeg.evenIndices(totalFrames(b), n).map(i => (i, kernel(b, i)))
    }
    sample(bytes)
  }
}
