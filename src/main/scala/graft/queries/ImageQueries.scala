package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.image.ImageOps
import graft.sources.Tables

/** Multimodal (image + audio) pipelines over binary columns, ALL oracled:
  * q36 verifies decoded image CONTENT pixel-exactly (the real PNG
  * encode/decode runs on the Spark side; the DuckDB oracle recomputes the
  * expected pixels in closed form from the embedding — PNG is lossless, the
  * quantization runs in IEEE double, and the crop offsets derive from
  * [[graft.functions.Stable.seededHash]], so every stage is replayable
  * outside the JVM). q47 oracles the dims of the bilinear-upscale chain
  * (Graphics2D interpolation is implementation-defined, so only its
  * geometry has a closed form); q45 oracles the audio round trip's
  * metadata. Sample-exact PCM and codec-byte internals are additionally
  * covered by ImageSpec/AudioSpec. */
object ImageQueries {
  /** vector -> PNG -> decode -> upscale>=16x16 -> seeded 12x12 crop.
    * Every stage is a columnar projection with executor-side JVM kernels. */
  private def croppedFrames(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val png = emb.select(col("vec_id"),
      ImageOps.encodePngUdf(ImageOps.frameFromVector(col("embedding"))).as("png"))
    val decoded = png.select(col("vec_id"),
      ImageOps.imagesFromBytes(col("png")).as("frame"))
    val grown = decoded.select(col("vec_id"),
      ImageOps.minimumImageDimensions(16, 16)(col("frame")).as("frame"))
    grown.select(col("vec_id"),
      ImageOps.randomFixedSizeCrop(12, 12, seed = 9)(col("frame"), col("vec_id")).as("frame"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pixel-content oracle of the image round trip: vector -> PNG encode
    // (real ImageIO codec) -> decode (real codec) -> seeded 6x6 crop at
    // seededHash-derived offsets -> content hash + byte sum. Every stage
    // after the codec pair is closed-form, and PNG is lossless, so the
    // oracle recomputes the exact pixels from the embedding — a byte-level
    // corruption anywhere in encode/decode/crop breaks the hash.
    "q36_image_pipeline" -> ((s, dir) => {
      import graft.functions.Stable
      val emb = Tables.load(s, dir, "embeddings")
      val side = sqrt(size(col("embedding")).cast("double")).cast("int")
      val choices = (side - lit(5)).cast("bigint")
      val staged = emb.select(col("vec_id"),
        ImageOps.encodePngUdf(ImageOps.frameFromVector(col("embedding"))).as("png"),
        pmod(Stable.seededHash(901, col("vec_id")), choices).cast("int").as("oy"),
        pmod(Stable.seededHash(902, col("vec_id")), choices).cast("int").as("ox"))
      val cropped = staged.select(col("vec_id"),
        ImageOps.cropAt(6, 6)(
          ImageOps.imagesFromBytes(col("png")), col("oy"), col("ox")).as("frame"))
      cropped.select(col("vec_id"),
        col("frame.h").as("h"), col("frame.w").as("w"), col("frame.c").as("c"),
        ImageOps.pxSum(col("frame")).as("px_sum"),
        Stable.hash64(ImageOps.pxString(col("frame"))).as("px_hash"))
    }),

    // Deterministic half of the image pipeline: dims after the 12x12 crop
    // are closed-form, so the real decode+crop path is oracle-verified.
    "q47_image_meta" -> ((s, dir) =>
      croppedFrames(s, dir).select(col("vec_id"),
        col("frame.h").as("h"), col("frame.w").as("w"), col("frame.c").as("c"))),

    // Audio modality round trip on distributed data: float vector -> 16-bit
    // WAV bytes (binary column) -> real JDK codec decode -> clip metadata +
    // frame count. Every output column is closed-form from len(embedding)
    // (mono 8 kHz, frameLen=16 hop=8), so the decode is oracle-verified;
    // sample-exact PCM semantics are covered by AudioSpec.
    "q45_audio_pipeline" -> ((s, dir) => {
      import graft.image.AudioOps
      val emb = Tables.load(s, dir, "embeddings")
      val wav = emb.select(col("vec_id"), AudioOps.encodeWavUdf(col("embedding")).as("wav"))
      val clip = wav.select(col("vec_id"), AudioOps.decodeWav(col("wav")).as("clip"))
      clip.select(col("vec_id"),
        col("clip.sample_rate").as("sample_rate"),
        col("clip.n").as("n_samples"),
        size(AudioOps.frames(col("clip.pcm"), frameLen = 16, hop = 8)).cast("bigint").as("n_frames"))
    }),

    // Video modality round trip, pixel-oracled (the q36 recipe on the
    // third modality): closed-form RGB frames -> REAL AVI container bytes
    // ([[graft.image.RawAvi.encode]]: BI_RGB, bottom-up BGR rows, 4-byte
    // stride) -> RIFF demux + raster decode ([[RawAvi.decodeFrames]], the
    // no-ffmpeg production kernel) -> even 3-of-t frame sampling -> pixel
    // hash. Every stage is integer-exact, so the DuckDB oracle replays
    // the pixel formula AND the sampling indices in closed form — a byte
    // slip anywhere in the container writer, the demuxer, the
    // BGR/bottom-up/stride undo or the sampler breaks the hash.
    // w=5 forces a 1-byte row stride pad through the round trip.
    "q215_video_pipeline" -> ((s, dir) => {
      import graft.functions.Stable
      import graft.image.RawAvi
      val emb = Tables.load(s, dir, "embeddings")
      val clipUdf = udf { (id: Long) =>
        val t = 3 + (id % 3).toInt // 3..5 frames per clip
        RawAvi.encode((0 until t).map { i =>
          ImageOps.Frame(4, 5, 3, Array.tabulate[Byte](4 * 5 * 3) { j =>
            ((id * 31 + i * 17 + j * 7) % 256).toByte
          })
        })
      }
      val clips = emb.select(col("vec_id"), clipUdf(col("vec_id")).as("clip"))
      clips.select(col("vec_id"), posexplode(
          RawAvi.sampleFramesJvm(col("clip"), n = 3)).as(Seq("k", "s")))
        .select(col("vec_id"), col("s._1").as("frame_idx"),
          col("s._2.h").as("h"), col("s._2.w").as("w"), col("s._2.c").as("c"),
          ImageOps.pxSum(col("s._2")).as("px_sum"),
          Stable.hash64(ImageOps.pxString(col("s._2"))).as("px_hash"))
    })
  )

  /** Oracles — q36's recomputes the decoded pixel content in closed form
    * (grayscale quantization in double, seededHash crop offsets, 3-channel
    * replication, md5-hash64 of the canonical decimal-string serialization);
    * q47/q45 verify the codec-independent metadata. */
  val oracles: Map[String, String] = Map(
    "q36_image_pipeline" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    CAST(sqrt(len(embedding)) AS INTEGER) AS side,
        |    [GREATEST(0, LEAST(255, CAST(trunc((CAST(e AS DOUBLE) + 1.0) * 127.5) AS INTEGER))) FOR e IN embedding] AS gv,
        |    CAST(CAST(('0x' || substr(md5(concat_ws(chr(1), '901', CAST(vec_id AS VARCHAR))), 1, 15)) AS BIGINT) % (CAST(sqrt(len(embedding)) AS INTEGER) - 5) AS INTEGER) AS oy,
        |    CAST(CAST(('0x' || substr(md5(concat_ws(chr(1), '902', CAST(vec_id AS VARCHAR))), 1, 15)) AS BIGINT) % (CAST(sqrt(len(embedding)) AS INTEGER) - 5) AS INTEGER) AS ox
        |  FROM embeddings
        |), c AS (
        |  SELECT vec_id,
        |    flatten([[gv[(y + oy) * side + (x + ox) + 1] FOR x IN range(6)] FOR y IN range(6)]) AS cg
        |  FROM q
        |), p AS (
        |  SELECT vec_id, flatten([[v, v, v] FOR v IN cg]) AS rgb FROM c
        |)
        |SELECT vec_id, CAST(6 AS INTEGER) AS h, CAST(6 AS INTEGER) AS w,
        |  CAST(3 AS INTEGER) AS c,
        |  CAST(list_sum(rgb) AS BIGINT) AS px_sum,
        |  CAST(('0x' || substr(md5(array_to_string(rgb, ' ')), 1, 15)) AS BIGINT) AS px_hash
        |FROM p""".stripMargin,
    // Crop dims are pipeline constants (12x12 crop of an upscaled frame);
    // c=3 because the decoder normalizes every image to RGB.
    "q47_image_meta" ->
      """SELECT vec_id, CAST(12 AS INTEGER) AS h, CAST(12 AS INTEGER) AS w,
        |  CAST(3 AS INTEGER) AS c
        |FROM embeddings""".stripMargin,

    // Mono 8 kHz 16-bit encode of the embedding vector: n_samples =
    // len(embedding); frames of length 16 with hop 8 over n samples.
    "q45_audio_pipeline" ->
      """SELECT vec_id, CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(len(embedding) AS BIGINT) AS n_samples,
        |  CAST(CASE WHEN len(embedding) >= 16 THEN (len(embedding) - 16) // 8 + 1
        |       ELSE 0 END AS BIGINT) AS n_frames
        |FROM embeddings""".stripMargin,

    // Video round trip: the pixel formula is integer-exact, the AVI
    // encode/decode pair is identity on pixel bytes, and the even-sample
    // indices for n=3 of t>=3 frames are [0, (t-1)//2, t-1] — all
    // replayable in SQL. px_hash = md5-hash64 of the same space-joined
    // decimal serialization the engine hashes (the q36 convention).
    "q215_video_pipeline" ->
      """WITH f AS (
        |  SELECT vec_id, 3 + vec_id % 3 AS t FROM embeddings
        |), idx AS (
        |  SELECT vec_id, unnest([CAST(0 AS BIGINT), (t-1)//2, t-1]) AS fi FROM f
        |), px AS (
        |  SELECT vec_id, fi,
        |    [ (vec_id*31 + fi*17 + j*7) % 256 FOR j IN range(60) ] AS rgb
        |  FROM idx
        |)
        |SELECT vec_id, CAST(fi AS INTEGER) AS frame_idx,
        |  CAST(4 AS INTEGER) AS h, CAST(5 AS INTEGER) AS w, CAST(3 AS INTEGER) AS c,
        |  CAST(list_sum(rgb) AS BIGINT) AS px_sum,
        |  CAST(('0x' || substr(md5(array_to_string(rgb, ' ')), 1, 15)) AS BIGINT) AS px_hash
        |FROM px""".stripMargin
  )
}
