package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Stable

/** Seeded synthetic generators (reference: fuel/datasets/toy.py:11-143).
  * Built on `spark.range(n)` + md5-derived uniforms — fully distributed,
  * deterministic per (seed, index) under retries and repartitioning
  * (a stricter contract than the reference's driver-side RandomState).
  * Gaussian noise via Box-Muller on two seeded uniforms.
  */
object Synthetic {
  private val TwoPi = 2.0 * math.Pi

  private def u(seed: Long, stream: Int) =
    Stable.uniform01(seed + stream * 1000003L, col("id"))

  /** Box-Muller standard normal from two seeded uniform streams. */
  private def gaussian(seed: Long, stream: Int) =
    sqrt(lit(-2.0) * log(u(seed, stream) + lit(1e-300))) *
      cos(lit(TwoPi) * u(seed, stream + 1))

  /** Spiral arms on the 2-D plane (toy.py:11-75): sources (features x/y,
    * position, label). */
  def spiral(spark: SparkSession, numExamples: Long, classes: Int = 1,
      cycles: Double = 1.0, noise: Double = 0.0, seed: Long = 1): DataFrame = {
    val pos = u(seed, 0) * cycles
    val label = floor(u(seed, 1) * classes).cast("int")
    val radius = (lit(2.0) * pos + 1) / lit(3.0)
    val phase = label.cast("double") * lit(TwoPi / classes)
    spark.range(numExamples)
      .select(
        col("id").as("__idx"),
        (radius * sin(lit(TwoPi) * pos + phase) + lit(noise) * gaussian(seed, 10))
          .cast("float").as("x"),
        (radius * cos(lit(TwoPi) * pos + phase) + lit(noise) * gaussian(seed, 12))
          .cast("float").as("y"),
        pos.as("position"), label.as("label"))
  }

  /** 3-D Swiss roll (toy.py:78-143): sources (features x/y/z, position). */
  def swissRoll(spark: SparkSession, numExamples: Long, noise: Double = 0.0,
      seed: Long = 1): DataFrame = {
    val cycles = 1.5
    val pos = u(seed, 0)
    val phi = lit(cycles * math.Pi) * (lit(1.0) + lit(2.0) * pos)
    val radius = (lit(1.0) + lit(2.0) * pos) / lit(3.0)
    val z = Stable.uniformRange(seed + 1000003L, -1.0, 1.0, col("id"))
    spark.range(numExamples)
      .select(
        col("id").as("__idx"),
        (radius * cos(phi) + lit(noise) * gaussian(seed, 10)).cast("float").as("x"),
        (radius * sin(phi) + lit(noise) * gaussian(seed, 12)).cast("float").as("y"),
        (z + lit(noise) * gaussian(seed, 14)).cast("float").as("z"),
        pos.cast("float").as("position"), z.cast("float").as("z_position"))
  }
}
