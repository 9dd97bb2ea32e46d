package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Graft

/** Batch-structural transformers (reference: fuel/transformers/__init__.py:
  * 566-811): conversions between example-rows and batch-rows, padding with
  * masks, and positional merge. All built from Catalyst array functions —
  * one shuffle for Batch (the groupBy), zero for Padding/Unpack (pure
  * projections over batch rows).
  */

/** Examples → one row per minibatch with array-valued sources, ordered by
  * `__pos` (fuel Batch, __init__.py:566-626). Requires scheme columns
  * (`__batch_id`, `__pos`).
  *
  * `strictness`: 0 = keep a short trailing batch, 1 = drop short batches,
  * 2 = raise if any batch is short (checked with one count job).
  */
final case class Batch(batchSize: Int, strictness: Int = 0) extends Transform {
  def apply(df: DataFrame): DataFrame = {
    require(df.columns.contains("__batch_id") && df.columns.contains("__pos"),
      "Batch requires scheme columns __batch_id/__pos; compile a scheme first")
    val dataCols = Transform.dataColumns(df)
    // Sort each batch's rows by position via struct ordering (first field
    // __pos dominates), then unzip the fields — deterministic order without
    // a per-batch window.
    val packed = array_sort(collect_list(struct((col("__pos") +: dataCols.map(col)): _*)))
    val g = df.groupBy("__batch_id")
      .agg(packed.as("__packed"), count(lit(1)).as("__n"))
    val unzipped = dataCols.foldLeft(g) { (d, c) =>
      d.withColumn(c, col("__packed").getField(c))
    }
    val sized = strictness match {
      case 0 => unzipped
      case 1 => unzipped.filter(col("__n") === batchSize)
      case 2 =>
        val short = unzipped.filter(col("__n") =!= batchSize).count()
        if (short > 0) throw new IllegalArgumentException(
          s"Batch(strictness=2): $short batch(es) short of $batchSize")
        unzipped
      case other => throw new IllegalArgumentException(s"invalid strictness $other")
    }
    val out = sized.select((col("__batch_id") +: dataCols.map(col)): _*)
    // axis labels gain a leading "batch" axis (fuel Batch, __init__.py:599-603);
    // read from the INPUT schema — aggregation drops column metadata.
    dataCols.foldLeft(out) { (d, c) =>
      graft.types.AxisLabels.get(df, c) match {
        case Some(ls) => graft.types.AxisLabels.set(d, c, "batch" +: ls)
        case None => d
      }
    }
  }
}

/** Minibatch rows → example rows; the inverse of [[Batch]]
  * (fuel Unpack, __init__.py:629-664). */
final case class Unpack() extends Transform {
  def apply(df: DataFrame): DataFrame = {
    val dataCols = Transform.dataColumns(df).filter(c =>
      df.schema(c).dataType.isInstanceOf[ArrayType])
    require(dataCols.nonEmpty, "Unpack requires array-valued sources")
    val hasBatch = df.columns.contains("__batch_id")
    val zipped = arrays_zip(dataCols.map(col): _*)
    val base = if (hasBatch) df.select(col("__batch_id"), posexplode(zipped).as(Seq("__i", "__e")))
               else df.select(posexplode(zipped).as(Seq("__i", "__e")))
    val cols = (if (hasBatch) Seq(col("__batch_id"), col("__i")) else Seq(col("__i"))) ++
      dataCols.map(c => col(s"__e.$c").as(c))
    base.select(cols: _*)
  }
}

/** Zero-pad variable-length sequences to the batch max length and emit a
  * `<src>_mask` companion (fuel Padding, __init__.py:667-744). Operates on
  * batch rows ([[Batch]] output): each mask source is `array<array<T>>` —
  * a batch of sequences with numeric elements.
  *
  * Pure projection: `max` over the row's own sequences, `concat` +
  * `array_repeat` for pad and mask — no shuffle, no UDF, whole-stage
  * codegen throughout.
  */
final case class Padding(maskSources: Seq[String], maskDtype: Option[DataType] = None) extends Transform {
  def apply(df: DataFrame): DataFrame = {
    val mdt = maskDtype.getOrElse(Graft.floatX)
    maskSources.foldLeft(df) { (d, s) =>
      val dt = d.schema(s).dataType
      val elem = dt match {
        case ArrayType(ArrayType(e, _), _) => e
        case other => throw new IllegalArgumentException(
          s"Padding: source '$s' must be array<array<...>>, got $other")
      }
      // Zero padding element of any rank, built recursively: at each array
      // level the rest-dim is probed from the first sequence element found
      // anywhere in the batch (robust to an empty first sequence; fuel
      // requires all rest-dims equal, __init__.py:728-736). Scalar leaves
      // are plain zero; still a pure codegen projection at every rank.
      def zeroOf(dt: DataType, probe: Column): Column = dt match {
        case ArrayType(inner, _) =>
          array_repeat(zeroOf(inner, element_at(probe, 1)), coalesce(size(probe), lit(0)))
        case leaf => lit(0).cast(leaf)
      }
      val zero: Column = zeroOf(elem, element_at(flatten(col(s)), 1))
      val maxLen = array_max(transform(col(s), x => size(x)))
      val padded = transform(col(s), x =>
        concat(x, array_repeat(zero, maxLen - size(x))))
      val mask = transform(col(s), x =>
        concat(array_repeat(lit(1).cast(mdt), size(x)),
               array_repeat(lit(0).cast(mdt), maxLen - size(x))))
      // mask must bind to the ORIGINAL lengths, so add it before replacing s
      d.withColumn(s + "_mask", mask).withColumn(s, padded)
    }
  }
}

/** Positional zip of several indexed streams into one multi-source stream
  * (fuel Merge, __init__.py:747-811): an equi-join on the stable `__idx` —
  * Merge semantics without any cartesian risk. Source names must not
  * collide (fuel raises on duplicate sources too). */
object Merge {
  def apply(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.size >= 2, "Merge needs at least two streams")
    dfs.foreach(d => require(d.columns.contains("__idx"), "Merge requires __idx on every stream"))
    val dataNames = dfs.flatMap(d => d.columns.filterNot(_ == "__idx"))
    require(dataNames.distinct.size == dataNames.size,
      s"Merge: duplicate source names across streams: ${dataNames.diff(dataNames.distinct).distinct}")
    dfs.reduce((a, b) => a.join(b, "__idx"))
  }
}
