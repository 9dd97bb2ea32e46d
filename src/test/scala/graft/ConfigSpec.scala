package graft

import java.nio.file.{Files, Paths}

/** The four-layer config cascade ([[Graft.configValue]] — fuel's
  * config_parser re-expressed): conf > env > rc file > default, per key.
  * The env layer is process-global and so exercised implicitly (an unset
  * `GRAFT_*` var falls through); the other three layers are pinned here.
  */
class ConfigSpec extends SparkSpec {

  test("config cascade: conf > rc > default, resolved per key") {
    val rc = Files.createTempFile("graftrc", ".properties")
    Files.write(rc, "floatX=float64\nmaxBlock=123\n".getBytes("UTF-8"))
    val props = Graft.loadRc(rc)
    // rc layer read (java-properties key=value lines)
    assert(Graft.configValue(spark, "maxBlock", None, props).contains("123"))
    // default fills an absent key; absent everywhere = None
    assert(Graft.configValue(spark, "nope", Some("d"), props).contains("d"))
    assert(Graft.configValue(spark, "nope", None, props).isEmpty)
    // the conf layer (in-code) wins over the rc layer for ITS key only
    spark.conf.set("spark.graft.floatX", "float32")
    try {
      assert(Graft.configValue(spark, "floatX", None, props).contains("float32"))
      assert(Graft.configValue(spark, "maxBlock", None, props).contains("123"))
    } finally spark.conf.unset("spark.graft.floatX")
    // with the conf unset the rc layer shows through again
    assert(Graft.configValue(spark, "floatX", None, props).contains("float64"))
    // a missing rc file is an empty layer, not an error (fuel skips a
    // missing ~/.fuelrc identically)
    assert(Graft.loadRc(Paths.get("/definitely/not/graftrc")).isEmpty)
  }
}
