package graft

import org.apache.spark.sql.functions._

import graft.functions.TokenStats

/** The fused gate-counts expression must be COUNT-EQUAL to the
  * interpreted HOF forms it replaced ([[graft.text.TextOps.langId]] /
  * `qualityColumns` originals) — per set, per row, over real corpus
  * data and the edge cases (empty array, empty token, NULL token,
  * non-ASCII token). */
class TokenStatsSpec extends SparkSpec {

  private val wordSets: Array[Array[String]] = Array(
    Array("the", "a", "of", "and", "to"),
    Array("el", "la", "de", "y", "que"),
    Array("a", "and", "de", "el", "la", "of", "que", "the", "to", "y"))

  /** The original HOF formulation, kept here as the reference. */
  private def hofCounts(toks: org.apache.spark.sql.Column) = {
    val setCounts = wordSets.toSeq.map { words =>
      size(filter(toks, t => words.map(w => t === lit(w)).reduce(_ || _))).cast("bigint")
    }
    val nonAlpha = size(filter(toks, t => t.rlike("[^a-z]"))).cast("bigint")
    array(setCounts :+ nonAlpha: _*)
  }

  test("fused counts equal the HOF filter counts on the documents corpus") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(graft.text.TextOps.tokens(col("text")).as("ts"))
    val mismatches = docs
      .select(TokenStats(col("ts"), wordSets).as("fused"), hofCounts(col("ts")).as("hof"))
      .filter(col("fused") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("edge cases: empty array, empty token, NULL token, non-ASCII, case") {
    import SparkSpec.spark.implicits._
    val rows = Seq(
      Seq[String](),                       // empty array -> all zero
      Seq(""),                             // empty token: no set hit, no non-alpha byte
      Seq("the", "THE", "thé", "la", "x"), // case-sensitive; é is non-alpha
      Seq("y", "9", "de de"),              // digit + multiword string (no hit)
      Seq(null, "and")                     // NULL token never counts
    ).toDF("ts")
    val got = rows
      .select(TokenStats(col("ts"), wordSets).as("fused"), hofCounts(col("ts")).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"fused=${r.get(0)} hof=${r.get(1)}")
    }
    // spot-check absolute values of the interesting row
    val third = got(2)
    assert(third.getSeq[Long](0) == Seq(1L, 1L, 2L, 2L)) // the; la; the+la; THE,thé
  }

  test("interpreted eval path agrees with codegen (expression used inside a HOF lambda)") {
    import SparkSpec.spark.implicits._
    // transform's lambda body runs interpreted — exercises nullSafeEval
    val df = Seq(Seq("the", "la", "42")).toDF("ts")
    val viaLambda = df.select(
      element_at(transform(array(col("ts")), a => TokenStats(a, wordSets)), 1).as("c"))
      .head().getSeq[Long](0)
    assert(viaLambda == Seq(1L, 1L, 2L, 1L))
  }
}
