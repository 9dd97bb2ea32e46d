import java.nio.file.{Files, Paths}

/** Single-query correctness-gate replica: dump the named queries (args;
  * all queries when none given) at sf0.01 to /tmp/qtest plus their oracle
  * SQL, then compare with `python3 tools/check_oracle.py /root/testdata/sf0.01
  * /tmp/qtest`. Same artifact shape as graft.Verify, scoped to the queries
  * under iteration so the loop is seconds, not minutes. */
object QTest {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
        .coalesce(1).write.mode("overwrite").parquet(s"/tmp/qtest/$n")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    val json = names.flatMap(n => graft.SparkEntry.oracleSql.get(n).map(sql => s"${q(n)}: ${q(sql)}"))
      .mkString("{", ",", "}")
    Files.writeString(Paths.get("/tmp/qtest/oracle_sql.json"), json)
    spark.stop()
  }
}
