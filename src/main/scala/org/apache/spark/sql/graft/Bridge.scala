package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StructType

/** Thin bridge to `private[sql]` internals, kept to three calls:
  * Column<->Expression conversion (exposing custom Catalyst expressions
  * like graft.functions.Hash64Expr through the public Column API) and
  * InternalRow-level DataFrame (re)construction (letting
  * graft.sources.Indexed zip a stable index without the external-Row
  * boxing round trip). No other internals are touched. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The physical plan's InternalRow RDD (after AQE finalization). Rows
    * may be reused per-partition — consumers must follow SparkPlan's
    * copy-if-buffering contract. */
  def internalRdd(df: DataFrame): RDD[InternalRow] =
    df.queryExecution.toRdd

  /** Wrap an InternalRow RDD back into a DataFrame. */
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
