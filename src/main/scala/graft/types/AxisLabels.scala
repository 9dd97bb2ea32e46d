package graft.types

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{Metadata, MetadataBuilder}

/** Axis labels as column metadata — fuel's schema-as-metadata
  * (reference: fuel/datasets/base.py:26-28 `axis_labels`,
  * fuel/transformers/__init__.py:19-67 ExpectsAxisLabels). A source may
  * declare the meaning of its tensor axes, e.g. ("channel","height","width");
  * structural transformers rewrite them (Flatten → ("feature"), Batch
  * prepends "batch" — __init__.py:599-603). Stored on the StructField's
  * Metadata, so labels survive projection, parquet round trips, and joins.
  */
object AxisLabels {
  val Key = "graft.axis_labels"

  /** Attach axis labels to a column. */
  def set(df: DataFrame, column: String, labels: Seq[String]): DataFrame = {
    val meta = new MetadataBuilder()
      .withMetadata(df.schema(column).metadata)
      .putStringArray(Key, labels.toArray)
      .build()
    df.withColumn(column, col(column).as(column, meta))
  }

  /** Read a column's axis labels, if declared. */
  def get(df: DataFrame, column: String): Option[Seq[String]] = {
    val m = df.schema(column).metadata
    if (m.contains(Key)) Some(m.getStringArray(Key).toSeq) else None
  }

  /** Rewrite labels the way a structural transformer requires: e.g.
    * Flatten(c) → `rewrite(df, c, _ => Seq("feature"))`, Batch →
    * `rewrite(df, c, "batch" +: _)`. No-op for unlabeled columns (fuel
    * also skips sources without labels). */
  def rewrite(df: DataFrame, column: String, f: Seq[String] => Seq[String]): DataFrame =
    get(df, column) match {
      case Some(labels) => set(df, column, f(labels))
      case None => df
    }

  /** fuel's verification hook (ExpectsAxisLabels.verify): assert a source
    * carries the expected labels; unlabeled columns warn, like the
    * reference's warn-on-None behavior. */
  def verify(df: DataFrame, column: String, expected: Seq[String]): Unit =
    get(df, column) match {
      case Some(actual) =>
        require(actual == expected,
          s"axis labels for '$column': expected $expected, got $actual")
      case None =>
        System.err.println(
          s"[graft] warning: '$column' carries no axis labels; expected $expected")
    }
}
