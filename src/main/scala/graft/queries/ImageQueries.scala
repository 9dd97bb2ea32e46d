package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.image.ImageOps
import graft.sources.Tables

/** Multimodal (image) pipeline over binary columns. No SQL oracle exists
  * for image codecs, so these are rows-only entries; pixel-exact semantics
  * are covered by ImageSpec. */
object ImageQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full multimodal round trip on distributed data: float vector ->
    // 8x8 grayscale frame -> PNG bytes (binary column) -> ImageIO decode ->
    // upscale to >=16x16 -> seeded 12x12 crop -> dims + pixel checksum.
    // Every stage is a columnar projection with executor-side JVM kernels.
    "q36_image_pipeline" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val png = emb.select(col("vec_id"),
        ImageOps.encodePngUdf(ImageOps.frameFromVector(col("embedding"))).as("png"))
      val decoded = png.select(col("vec_id"),
        ImageOps.imagesFromBytes(col("png")).as("frame"))
      val grown = decoded.select(col("vec_id"),
        ImageOps.minimumImageDimensions(16, 16)(col("frame")).as("frame"))
      val cropped = grown.select(col("vec_id"),
        ImageOps.randomFixedSizeCrop(12, 12, seed = 9)(col("frame"), col("vec_id")).as("frame"))
      cropped.select(col("vec_id"),
        col("frame.h").as("h"), col("frame.w").as("w"), col("frame.c").as("c"),
        crc32(col("frame.px")).as("px_crc"))
    }),

    // Audio modality round trip on distributed data: float vector -> 16-bit
    // WAV bytes (binary column) -> real JDK codec decode -> fixed-length
    // frames + per-frame energies. Rows-only (no SQL oracle for a codec);
    // sample-exact semantics are covered by AudioSpec.
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
}
