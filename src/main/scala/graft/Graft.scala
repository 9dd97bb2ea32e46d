package graft

import org.apache.spark.sql.SparkSession

/** Session factory with scale-aware defaults.
  *
  * The engine is designed for a large multi-executor cluster but tested on
  * `local[32]`. Everything scale-relevant is expressed through the plan
  * (partitioning columns, broadcast hints, AQE) rather than hard-coded
  * parallelism, so the same code runs unchanged on a 1000-executor cluster.
  */
object Graft {
  /** Default shuffle parallelism for local runs; on a real cluster this is
    * overridden by AQE coalescing (`spark.sql.adaptive.coalescePartitions`). */
  val LocalShufflePartitions = 32

  def session(master: String = "local[32]", appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", LocalShufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // config cascade (fuel config_parser analog: code > conf > default):
    // spark.graft.floatX = float32|float64 selects the engine float width.
    spark.conf.getOption("spark.graft.floatX").foreach(setFloatX)
    spark
  }

  /** fuel's `floatX` config (reference: fuel/config_parser.py:49-52,211):
    * the engine-wide float width used by `ForceFloatX`/`Cast("floatX")`.
    * Settable in code or via the `spark.graft.floatX` conf. */
  @volatile var floatX: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.FloatType

  def setFloatX(name: String): Unit = floatX = name match {
    case "float32" => org.apache.spark.sql.types.FloatType
    case "float64" => org.apache.spark.sql.types.DoubleType
    case other => throw new IllegalArgumentException(
      s"spark.graft.floatX must be float32 or float64, got $other")
  }
}
