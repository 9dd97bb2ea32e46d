package graft.sequences

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence sliders (reference: fuel/transformers/sequences.py:4-123).
  *
  * fuel's Window pulls one sentence at a time and slides by 1, never
  * spanning sentences (a sentence too short for one window is skipped —
  * sequences.py:79-82). The set-oriented rewrite: per sentence, the valid
  * start indices are `i0 .. len - span` where
  *   `ti0  = source_window * (1 - overlapping) + offset`  (target start rel. to i)
  *   `i0   = max(0, -ti0)`                                 (negative offsets)
  *   `span = max(source_window, ti0 + target_window)`
  * Each start yields (source = s[i, i+sw), target = s[i+ti0, i+ti0+tw)) —
  * one `posexplode` over a `sequence` column, fully parallel per sentence.
  */
object Sequences {

  /** All (window_idx, source, target) rows for one sequence column.
    * Sentences with no valid window produce no rows, like the reference. */
  def windows(df: DataFrame, idCol: String, seqCol: String,
      offset: Int, sourceWindow: Int, targetWindow: Int, overlapping: Boolean): DataFrame = {
    val ti0 = sourceWindow * (if (overlapping) 0 else 1) + offset
    val i0 = math.max(0, -ti0)
    val span = math.max(sourceWindow, ti0 + targetWindow)
    val s = col(seqCol)
    val n = size(s)
    df.filter(n >= i0 + span)
      .select(col(idCol), s.as("__seq"),
        posexplode(sequence(lit(i0), n - span)).as(Seq("window_idx", "i")))
      .select(col(idCol), col("window_idx").cast("bigint").as("window_idx"),
        slice(col("__seq"), col("i") + 1, lit(sourceWindow)).as("source"),
        slice(col("__seq"), col("i") + lit(ti0) + 1, lit(targetWindow)).as("target"))
  }

  /** N-grams + next-token target (fuel NGrams = Window(0, n, 1, false) with
    * scalar target, sequences.py:89-123). */
  def ngrams(df: DataFrame, idCol: String, seqCol: String, n: Int): DataFrame =
    windows(df, idCol, seqCol, offset = 0, sourceWindow = n, targetWindow = 1,
        overlapping = false)
      .select(col(idCol), col("window_idx"),
        col("source").as("ngram"), element_at(col("target"), 1).as("target"))
}
