package graft.image

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Audio as a multimodal column: opaque WAV bytes + typed metadata,
  * decoded executor-side with the JDK's own codec (`javax.sound.sampled`
  * ships with the JVM — real PCM decode, not a stub; compressed codecs
  * would slot in behind the same Clip schema). Mirrors the reference's
  * YouTubeAudio dataset shape (fuel/datasets/youtube_audio.py:5-32: an
  * hdf5 of vlen int16 PCM per clip).
  *
  * Design matches [[ImageOps]]: decoded clips are
  * `struct<sample_rate:int, channels:int, n:long, pcm:array<float>>`,
  * samples normalized to [-1, 1]; framing/stats are Catalyst built-ins
  * over the array column (slice under posexplode — fully parallel, the
  * same set-oriented rewrite as [[graft.sequences.Sequences]]).
  */
object AudioOps {
  case class Clip(sample_rate: Int, channels: Int, n: Long, pcm: Array[Float])

  /** Decode WAV bytes → Clip (16-bit PCM normalized to [-1,1]; channels
    * interleaved like the wire format). Undecodable bytes → null. */
  val decodeWav = udf { (bytes: Array[Byte]) =>
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16, s"expected 16-bit PCM, got ${fmt.getSampleSizeInBits}")
      val raw = in.readAllBytes()
      val bigEndian = fmt.isBigEndian
      val n = raw.length / 2
      val pcm = new Array[Float](n)
      var i = 0
      while (i < n) {
        val lo = raw(2 * i).toInt
        val hi = raw(2 * i + 1).toInt
        val s = if (bigEndian) (lo << 8) | (hi & 0xff) else (hi << 8) | (lo & 0xff)
        pcm(i) = s.toShort / 32768.0f
        i += 1
      }
      Some(Clip(fmt.getSampleRate.toInt, fmt.getChannels, n.toLong / fmt.getChannels, pcm))
    } catch { case _: Exception => None }
  }

  /** Encode [-1,1] float samples as 16-bit mono little-endian WAV bytes
    * (fixture/converter helper — the sink side of the modality). */
  def encodeWav(samples: Array[Float], rate: Float): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = math.max(-1.0f, math.min(1.0f, samples(i)))
      val v = (s * 32767.0f).toInt
      raw(2 * i) = (v & 0xff).toByte
      raw(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(raw), fmt, samples.length),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Column form of [[encodeWav]] at 8 kHz. */
  val encodeWavUdf = udf { (xs: Seq[Float]) => encodeWav(xs.toArray, 8000f) }

  /** Fixed-length frames with hop (the STFT/feature-extraction input
    * layout): (frame_idx, frame) rows via slice-under-posexplode — no
    * per-row loops, no state; clips shorter than one frame yield none. */
  def frames(pcm: Column, frameLen: Int, hop: Int): Column = {
    require(frameLen > 0 && hop > 0, "frameLen and hop must be positive")
    // floor-div explicitly (Column./ is double division) and guard short
    // clips: sequence(0, -1) would generate a DESCENDING sequence, not an
    // empty one.
    val lastStart = floor((size(pcm) - frameLen).cast("double") / hop).cast("int")
    when(size(pcm) >= frameLen,
        transform(sequence(lit(0), lastStart), i => slice(pcm, i * hop + 1, lit(frameLen))))
      .otherwise(array().cast("array<array<float>>"))
  }

  /** Per-clip loudness proxy: mean absolute sample (sequential fold —
    * deterministic; audio stats are diagnostics, not oracle columns). */
  def meanAbs(pcm: Column): Column =
    aggregate(pcm, lit(0.0), (acc, x) => acc + abs(x.cast("double"))) /
      greatest(size(pcm).cast("double"), lit(1.0))

  /** Deterministic fake embedding for a clip — a stand-in for a real
    * audio encoder (not available in this environment): per-frame energy
    * via the codegen dot product of the frame with itself. */
  def frameEnergies(framesCol: Column): Column =
    transform(framesCol, f => graft.functions.VecExpressions.dot(f, f))

  /** Perceptual audio fingerprint (64-bit) — the audio member of the
    * engine's Hamming near-dup family ([[graft.image.ImageOps.dHash]]
    * for images, SimHash for text): the clip is cut into 65 equal
    * frames, each frame's energy is the EXACT integer Σ s² over the
    * recovered int16 samples (pcm·32768 is exact — [[decodeWav]]
    * divides by a power of two, so the product restores the original
    * integer bit-for-bit; no float accumulates), and bit i is the
    * energy-gradient sign e(i) > e(i+1) — the temporal-envelope shape,
    * invariant under exact power-of-two gain and tolerant of small
    * edits. Feed the hashes to
    * [[graft.dedup.Dedup.simhashNearDup]]'s banded machinery — audio
    * near-dup search with no new shuffle pattern. Clips shorter than
    * 130 samples (2 per frame) hash to null. */
  val audioHash = udf { (c: Clip) =>
    if (c.pcm.length < 130) None
    else {
      val frames = 65
      val e = new Array[Long](frames)
      var i = 0
      while (i < frames) {
        val s0 = (i.toLong * c.pcm.length / frames).toInt
        val s1 = ((i + 1).toLong * c.pcm.length / frames).toInt
        var acc = 0L
        var j = s0
        while (j < s1) {
          val v = math.round(c.pcm(j) * 32768f).toLong
          acc += v * v
          j += 1
        }
        e(i) = acc
        i += 1
      }
      var bits = 0L
      var k = 0
      while (k < 64) { if (e(k) > e(k + 1)) bits |= (1L << k); k += 1 }
      Some(bits)
    }
  }
}
