package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col, lit}

/** fuel's Subset algebra over an indexed stream (reference:
  * fuel/utils/__init__.py:30-397; exercised by tests/test_utils.py). A
  * Subset describes which rows of a dataset belong to a split: either a
  * contiguous slice `[start, stop)` or a sorted-unique index list
  * (canonicalized exactly like `_beautify_list`,
  * fuel/utils/__init__.py:387-396 — duplicates dropped, contiguous lists
  * collapsed to slices).
  *
  * The algebra — union ([[+]]), composition ([[Subset.subsetOf]]), request
  * translation ([[translate]]) — runs on the driver exactly as in the
  * reference: split definitions are bounded *metadata* (fuel stores them in
  * an HDF5 attribute, hdf5.py:234-300), never data-sized. Only [[apply]]
  * touches the cluster, compiling the final subset into ONE distributed
  * selection: a range filter for slices, an IN filter for small lists (both
  * prune at the scan when the index is a stored column), or a broadcast
  * semi-join on `__idx` for large lists — never a driver-side loop over
  * rows.
  */
final class Subset private (
    /** Left = slice `[start, stop)`; Right = beautified index list. */
    val repr: Either[(Long, Long), Vector[Long]],
    val originalNumExamples: Long) {

  /** Whether this subset is list-based (fuel `is_list`). */
  def isList: Boolean = repr.isRight

  /** Rows this subset spans (fuel `num_examples`). */
  def numExamples: Long = repr match {
    case Left((start, stop)) => stop - start
    case Right(indices)      => indices.size.toLong
  }

  def isEmpty: Boolean = numExamples == 0

  /** The subset as an explicit index list (fuel `get_list_representation`). */
  def listRepresentation: Vector[Long] = repr match {
    case Left((start, stop)) => Vector.range(start, stop)
    case Right(indices)      => indices
  }

  /** Merge two subsets of the same dataset (fuel `__add__`,
    * fuel/utils/__init__.py:59-107): empty is neutral; overlapping or
    * adjacent slices merge into one slice; everything else concatenates
    * list representations and re-canonicalizes. */
  def +(other: Subset): Subset = {
    require(originalNumExamples == other.originalNumExamples,
      "trying to add two Subset instances with different numbers of original " +
        "examples, they can't possibly belong to the same dataset")
    if (isEmpty) other
    else if (other.isEmpty) this
    else (repr, other.repr) match {
      case (Left((s1, e1)), Left((s2, e2))) if !(e1 < s2 || s1 > e2) =>
        new Subset(Left((math.min(s1, s2), math.max(e1, e2))), originalNumExamples)
      case _ =>
        Subset.list(listRepresentation ++ other.listRepresentation, originalNumExamples)
    }
  }

  /** Translate a slice request `[start, stop)` made within this subset into
    * absolute dataset indices (fuel `__getitem__`). */
  def translate(start: Long, stop: Long): Either[(Long, Long), Vector[Long]] = {
    require(start >= 0 && stop >= 0, "slice-based requests cannot have negative start or stop")
    require(stop <= numExamples,
      "slice-based requests cannot have a stop value greater than the number of examples the subset spans")
    require(start < numExamples,
      "slice-based requests cannot have a start value greater than or equal to the number of examples the subset spans")
    require(start < stop, "slice-based requests cannot have start >= stop")
    repr match {
      case Left((s, _))   => Left((s + start, s + stop))
      case Right(indices) => Right(indices.slice(start.toInt, stop.toInt))
    }
  }

  /** Translate a list request made within this subset into absolute dataset
    * indices, preserving request order (fuel `__getitem__`). */
  def translate(request: Seq[Long]): Vector[Long] = {
    require(request.nonEmpty, "list-based requests cannot be empty")
    require(request.forall(_ >= 0), "list-based requests cannot contain negative indices")
    require(request.max < numExamples,
      "list-based requests cannot contain indices greater than or equal to the number of examples the subset spans")
    repr match {
      case Left((s, _))   => request.iterator.map(s + _).toVector
      case Right(indices) => request.iterator.map(i => indices(i.toInt)).toVector
    }
  }

  /** Apply the subset to an indexed DataFrame — the one cluster-side step.
    * Slices and lists up to `isinThreshold` become scan-prunable predicates
    * on `idxName`; larger lists become a broadcast semi-join (the list is
    * still driver-held split metadata; a data-sized selection belongs in a
    * join against a stored table, not in a Subset). */
  def apply(df: DataFrame, idxName: String = Indexed.Idx,
            isinThreshold: Int = 1024): DataFrame = repr match {
    case _ if isEmpty        => df.filter(lit(false))
    case Left((start, stop)) => df.filter(col(idxName) >= start && col(idxName) < stop)
    case Right(indices) if indices.size <= isinThreshold =>
      df.filter(col(idxName).isin(indices: _*))
    case Right(indices) =>
      val spark = df.sparkSession
      import spark.implicits._
      val keys = spark.createDataset(indices).toDF(idxName)
      // a USING join moves the key column first; restore the input schema
      df.join(broadcast(keys), Seq(idxName), "left_semi")
        .select(df.columns.map(col).toIndexedSeq: _*)
  }
}

object Subset {
  /** Slice-based subset `[start, stop)` (step is always 1, as in fuel —
    * step > 1 raises there and has no constructor here). */
  def slice(start: Long, stop: Long, originalNumExamples: Long): Subset = {
    require(start >= 0 && stop >= 0,
      "Subset instances cannot be defined by a slice with negative start or stop")
    require(stop <= originalNumExamples,
      "Subset instances cannot be defined by a slice whose stop value is greater than the original number of examples")
    require(start < originalNumExamples,
      "Subset instances cannot be defined by a slice whose start value is greater than or equal to the original number of examples")
    require(start <= stop,
      "Subset instances cannot be defined by a slice whose start value is greater than its stop value")
    new Subset(Left((start, stop)), originalNumExamples)
  }

  /** List-based subset; canonicalized like fuel's `_beautify_list`:
    * sorted-unique, contiguous non-empty lists collapse to a slice. */
  def list(indices: Seq[Long], originalNumExamples: Long): Subset = {
    require(indices.forall(_ >= 0),
      "Subset instances cannot be defined by a list containing negative indices")
    require(indices.forall(_ < originalNumExamples),
      "Subset instances cannot be defined by a list containing indices greater than or equal to the original number of examples")
    val beautified = indices.distinct.sorted.toVector
    val contiguous = beautified.nonEmpty &&
      beautified.last - beautified.head + 1 == beautified.size
    if (contiguous) new Subset(Left((beautified.head, beautified.last + 1)), originalNumExamples)
    else new Subset(Right(beautified), originalNumExamples)
  }

  /** The neutral element of the algebra (fuel `empty_subset`). */
  def empty(originalNumExamples: Long): Subset =
    new Subset(Right(Vector.empty), originalNumExamples)

  /** A subset of a subset via slice-request translation (fuel `subset_of`). */
  def subsetOf(subset: Subset, start: Long, stop: Long): Subset =
    subset.translate(start, stop) match {
      case Left((s, e))   => slice(s, e, subset.originalNumExamples)
      case Right(indices) => list(indices, subset.originalNumExamples)
    }

  /** A subset of a subset via list-request translation (fuel `subset_of`). */
  def subsetOf(subset: Subset, request: Seq[Long]): Subset =
    list(subset.translate(request), subset.originalNumExamples)
}
