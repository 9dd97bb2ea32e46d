package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.image.ImageOps
import graft.sources.Tables

/** Multimodal (image + audio) pipelines over binary columns. The codec
  * *bytes* have no SQL oracle (q36's px_crc stays rows-only; pixel-exact
  * semantics are covered by ImageSpec/AudioSpec), but the codec-independent
  * metadata the pipelines emit — dims after a fixed crop, sample counts
  * closed-form from `len(embedding)` — is DuckDB-expressible, so q47/q45
  * are oracled: the oracle verifies the real decode's metadata agrees with
  * the closed form for every row. */
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
    // Codec residue of the full image round trip: the pixel checksum after
    // encode/decode/upscale/crop. Rows-only by nature (no SQL codec).
    "q36_image_pipeline" -> ((s, dir) =>
      croppedFrames(s, dir).select(col("vec_id"), crc32(col("frame.px")).as("px_crc"))),

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
    })
  )

  /** Oracles for the codec-independent columns. q36's px_crc is the only
    * residue left rows-only — raw codec bytes have no SQL analog. */
  val oracles: Map[String, String] = Map(
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
        |FROM embeddings""".stripMargin
  )
}
