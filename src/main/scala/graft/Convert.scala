package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.image.ImageOps

/** Ingest-job CLI — the `fuel-convert` analog (reference:
  * fuel/bin/fuel_convert.py:24, fuel/converters/base.py:13-47: one-time
  * raw-input → storage-format ETL). Two converters:
  *
  *   images: PNG/JPEG files → parquet of decoded frames
  *           `runMain graft.Convert images <inGlob> <outDir>`
  *   text:   line files → parquet of (file, line_no, line)
  *           `runMain graft.Convert text <inGlob> <outDir>`
  *   audio:  WAV files → parquet of decoded clips (the YouTubeAudio
  *           converter analog, fuel/converters/youtube_audio.py)
  *           `runMain graft.Convert audio <inGlob> <outDir>`
  *   video:  clips → parquet of evenly-sampled 64×64 RGB24 frames via
  *           one executor-side ffmpeg-CLI subprocess per clip
  *           ([[graft.image.Ffmpeg]] — the converter-edge codec tier);
  *           fails fast with a clear message when ffmpeg is absent
  *           `runMain graft.Convert video <inGlob> <outDir>`
  *
  * All are distributed jobs (binaryFile/text scans + columnar projection),
  * not driver-side loops — the Spark-native shape of the reference's
  * producer/consumer converter pipelines (ilsvrc2010.py:204-316).
  */
object Convert {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: Convert <images|text|audio|video> <inGlob> <outDir>")
    val Array(kind, inGlob, outDir) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    kind match {
      case "images" =>
        spark.read.format("binaryFile").load(inGlob)
          .select(col("path"), ImageOps.imagesFromBytes(col("content")).as("frame"))
          .filter(col("frame").isNotNull) // skip undecodable files, keep going
          .write.mode("overwrite").parquet(outDir)
      case "text" =>
        graft.sources.TextFileSource.lines(spark, Seq(inGlob))
          .write.mode("overwrite").parquet(outDir)
      case "audio" =>
        spark.read.format("binaryFile").load(inGlob)
          .select(col("path"), graft.image.AudioOps.decodeWav(col("content")).as("clip"))
          .filter(col("clip").isNotNull) // skip undecodable files, keep going
          .write.mode("overwrite").parquet(outDir)
      case "video" =>
        val binary = sys.env.getOrElse("SPARK_GRAFT_FFMPEG", "ffmpeg")
        require(graft.image.Ffmpeg.available(binary),
          s"video ingest needs the ffmpeg CLI ('$binary' not runnable — " +
            "install ffmpeg or point SPARK_GRAFT_FFMPEG at it)")
        spark.read.format("binaryFile").load(inGlob)
          .select(col("path"), posexplode(
            graft.image.Ffmpeg.sampleFramesCli(col("content"),
              n = 8, w = 64, h = 64, binary))
            .as(Seq("k", "sampled")))
          .select(col("path"), col("sampled._1").as("frame_idx"),
            col("sampled._2").as("frame"))
          .write.mode("overwrite").parquet(outDir)
      case other =>
        throw new IllegalArgumentException(s"unknown converter '$other' (images|text|audio|video)")
    }
    val n = spark.read.parquet(outDir).count()
    println(s"""{"converted": $n, "kind": "$kind", "out": "$outDir"}""")
    spark.stop()
  }
}
