package graft

import java.io.ByteArrayOutputStream
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.functions._

import graft.image.AudioOps

/** Audio multimodal column: real JDK WAV decode round trip + framing. */
class AudioSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  /** 16-bit mono little-endian WAV of `samples`. */
  private def wavBytes(samples: Array[Short], rate: Float = 8000f): Array[Byte] = {
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      raw(2 * i) = (s & 0xff).toByte; raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(raw), fmt, samples.length),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("WAV decode round trip: rate, length, and sample values survive") {
    val sine = Array.tabulate(800)(i =>
      (math.sin(2 * math.Pi * 440 * i / 8000.0) * 30000).toShort)
    val df = Seq((1L, wavBytes(sine)), (2L, Array[Byte](1, 2, 3))).toDF("id", "wav")
      .select(col("id"), AudioOps.decodeWav(col("wav")).as("clip"))
    val ok = df.filter(col("id") === 1).select("clip.sample_rate", "clip.n", "clip.pcm").head()
    assert(ok.getInt(0) == 8000)
    assert(ok.getLong(1) == 800L)
    val pcm = ok.getSeq[Float](2)
    assert(pcm.length == 800)
    sine.zip(pcm).foreach { case (s, f) =>
      assert(math.abs(s / 32768.0f - f) < 1e-6f, s"sample mismatch: $s vs $f")
    }
    // undecodable bytes -> null, not a crash
    assert(df.filter(col("id") === 2).select("clip").head().isNullAt(0))
  }

  test("framing: slice-under-transform layout, frame count and energies") {
    val sine = Array.tabulate(1000)(i => (math.sin(i / 10.0) * 20000).toShort)
    val df = Seq((1L, wavBytes(sine))).toDF("id", "wav")
      .select(col("id"), AudioOps.decodeWav(col("wav")).getField("pcm").as("pcm"))
      .select(col("id"), AudioOps.frames(col("pcm"), frameLen = 256, hop = 128).as("fr"))
    val r = df.select(size(col("fr")).as("nf"),
      AudioOps.frameEnergies(col("fr")).as("e")).head()
    // starts 0,128,...,744: floor((1000-256)/128)+1 = 6 frames
    assert(r.getInt(0) == 6)
    val energies = r.getSeq[Double](1)
    assert(energies.length == 6)
    assert(energies.forall(e => e > 0.0 && e <= 256.0))

    // loudness proxy: a sine's mean |sample| ~ 2/pi * amplitude
    val loud = Seq(Tuple1(sine.map(_ / 32768.0f).toSeq)).toDF("pcm")
      .select(AudioOps.meanAbs(col("pcm"))).head().getDouble(0)
    assert(math.abs(loud - 2.0 / math.Pi * (20000.0 / 32768.0)) < 0.02, s"meanAbs=$loud")

    // a clip shorter than one frame yields NO frames (not a descending
    // sequence artifact)
    val short = Seq(Seq.fill(100)(0.5f)).toDF("pcm")
      .select(size(AudioOps.frames(col("pcm"), 256, 128)).as("nf")).head()
    assert(short.getInt(0) == 0)
  }

  test("binaryFile ingest: WAV files -> parquet clips (audio converter job)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wav")
    (0 until 3).foreach { i =>
      val tone = Array.tabulate(400 + 100 * i)(j =>
        (math.sin(2 * math.Pi * (220 + 110 * i) * j / 8000.0) * 20000).toShort)
      java.nio.file.Files.write(dir.resolve(s"clip_$i.wav"), wavBytes(tone))
    }
    // one non-audio file: the converter must skip it, not fail
    java.nio.file.Files.write(dir.resolve("clip_bad.wav"), Array[Byte](9, 9, 9))
    val out = java.nio.file.Files.createTempDirectory("graft_clips").toString
    spark.read.format("binaryFile").load(dir.toString + "/*.wav")
      .select(col("path"), AudioOps.decodeWav(col("content")).as("clip"))
      .filter(col("clip").isNotNull)
      .write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == 3)
    assert(back.select("clip.n").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(400L, 500L, 600L))
    assert(back.select("clip.sample_rate").collect().forall(_.getInt(0) == 8000))
  }

  test("video plumbing: evenly-spaced frame sampling composes with image ops") {
    import graft.image.VideoOps
    // 640 bytes -> fake container of 10 frames; sample 4 evenly: 0,3,6,9
    val container = Array.tabulate[Byte](640)(i => (i % 251).toByte)
    val df = Seq((1L, container)).toDF("vid_id", "bytes")
      .select(col("vid_id"),
        posexplode(VideoOps.sampleFrames(col("bytes"), 4)).as(Seq("pos", "f")))
      .select(col("vid_id"), col("f._1").as("frame_idx"), col("f._2").as("frame"))
    val rows = df.select("frame_idx", "frame.h", "frame.w").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 3, 6, 9))
    assert(rows.forall(r => r.getInt(1) == 8 && r.getInt(2) == 8))
    // deterministic: same container -> same sampled pixels
    val crc1 = df.select(crc32(col("frame.px"))).collect().map(_.getLong(0)).toSeq
    val crc2 = df.select(crc32(col("frame.px"))).collect().map(_.getLong(0)).toSeq
    assert(crc1 == crc2)
    // a 1-frame container samples exactly one frame regardless of n
    val one = Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("bytes")
      .select(size(VideoOps.sampleFrames(col("bytes"), 4)).as("n")).head()
    assert(one.getInt(0) == 1)
  }

  test("audioHash: deterministic, reversed envelope is far, tiny clip is null") {
    def clip(samples: Array[Short]) = Seq((1L, wavBytes(samples))).toDF("id", "wav")
      .select(AudioOps.audioHash(AudioOps.decodeWav(col("wav"))).as("h"))
      .head().getLong(0)
    // Rising-envelope sine: frame energies strictly increase, so the
    // hash is all-zero-ish in the > direction; its REVERSE has the
    // opposite gradient signs almost everywhere.
    val rising = Array.tabulate(2600)(i =>
      (math.sin(2 * math.Pi * 440 * i / 8000.0) * (i / 2600.0 * 30000)).toShort)
    val h1 = clip(rising)
    assert(clip(rising) == h1, "not deterministic")
    // The envelope gradient flips almost everywhere under reversal;
    // intra-frame sine ripple keeps some bits — random-level distance
    // (~32) is the floor, near-dup distance (≤ 12) must be far away.
    val h2 = clip(rising.reverse)
    assert(java.lang.Long.bitCount(h1 ^ h2) >= 24,
      s"reverse too close: ${java.lang.Long.bitCount(h1 ^ h2)}")
    // Sub-grid clips hash to null.
    val tiny = Seq((1L, wavBytes(Array.tabulate(64)(_.toShort)))).toDF("id", "wav")
      .select(AudioOps.audioHash(AudioOps.decodeWav(col("wav"))).as("h")).head()
    assert(tiny.isNullAt(0))
  }
}
