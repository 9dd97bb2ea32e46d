package graft

import org.apache.spark.sql.functions._

import graft.sources.{Indexed, Subset, Tables}

/** List-form Subset algebra, mirroring the reference's tests/test_utils.py
  * (TestSubset): canonicalization, num_examples, union in all four
  * list/slice combinations, request translation, sanity-check errors —
  * plus the cluster-side application paths (isin and broadcast semi-join)
  * fuel has no analog for. */
class SubsetSpec extends SparkSpec {

  // ------------------------------------------------- construction + beautify
  test("lists are unique and sorted; contiguous lists become slices") {
    // fuel test_lists_are_unique_and_sorted / test_contiguous_lists_...
    val scattered = Subset.list(Seq(5L, 1L, 3L, 1L, 9L), 20L)
    assert(scattered.isList)
    assert(scattered.listRepresentation == Vector(1L, 3L, 5L, 9L))
    val contiguous = Subset.list(Seq(4L, 2L, 3L, 2L, 5L), 20L)
    assert(!contiguous.isList) // canonicalized to slice(2, 6)
    assert(contiguous.repr == Left((2L, 6L)))
  }

  test("num_examples and empties") {
    assert(Subset.list(Seq(1L, 5L, 7L), 10L).numExamples == 3)
    assert(Subset.slice(2L, 6L, 10L).numExamples == 4)
    assert(Subset.empty(10L).isEmpty)
    assert(Subset.slice(3L, 3L, 10L).isEmpty)
  }

  test("constructor sanity checks mirror fuel's ValueErrors") {
    intercept[IllegalArgumentException] { Subset.list(Seq(-1L), 10L) }
    intercept[IllegalArgumentException] { Subset.list(Seq(10L), 10L) }
    intercept[IllegalArgumentException] { Subset.slice(-1L, 5L, 10L) }
    intercept[IllegalArgumentException] { Subset.slice(0L, 11L, 10L) }
    intercept[IllegalArgumentException] { Subset.slice(10L, 10L, 10L) } // start >= n
    intercept[IllegalArgumentException] { Subset.slice(6L, 2L, 10L) }
  }

  // ------------------------------------------------------------------ union
  test("union: empty is neutral; list+list concatenates") {
    val a = Subset.list(Seq(1L, 5L), 10L)
    assert((Subset.empty(10L) + a).listRepresentation == a.listRepresentation)
    assert((a + Subset.empty(10L)).listRepresentation == a.listRepresentation)
    val b = Subset.list(Seq(3L, 5L, 8L), 10L)
    assert((a + b).listRepresentation == Vector(1L, 3L, 5L, 8L))
  }

  test("union: overlapping and adjacent slices merge; disjoint fall back to list") {
    // fuel test_add_overlapping_single_step_slice_slice
    assert((Subset.slice(2L, 6L, 20L) + Subset.slice(4L, 9L, 20L)).repr == Left((2L, 9L)))
    // adjacent (stop == start) also merges under fuel's overlap test
    assert((Subset.slice(2L, 6L, 20L) + Subset.slice(6L, 9L, 20L)).repr == Left((2L, 9L)))
    // fuel test_adding_slice_slice_falls_back_to_list
    val disjoint = Subset.slice(2L, 4L, 20L) + Subset.slice(10L, 12L, 20L)
    assert(disjoint.isList)
    assert(disjoint.listRepresentation == Vector(2L, 3L, 10L, 11L))
  }

  test("union: mixed list/slice converts to list; incompatible sizes raise") {
    // fuel test_add_list_slice / test_add_slice_list
    val mixed = Subset.list(Seq(15L, 1L), 20L) + Subset.slice(5L, 8L, 20L)
    assert(mixed.listRepresentation == Vector(1L, 5L, 6L, 7L, 15L))
    intercept[IllegalArgumentException] {
      Subset.slice(0L, 5L, 10L) + Subset.slice(0L, 5L, 20L)
    }
  }

  // ------------------------------------------------------------ translation
  test("request translation in all four list/slice combinations") {
    // fuel test_{list,slice}_subset_{list,slice}_request
    val lst = Subset.list(Seq(2L, 5L, 7L, 11L), 20L)
    assert(lst.translate(Seq(3L, 0L)) == Vector(11L, 2L)) // order-preserving
    assert(lst.translate(1L, 3L) == Right(Vector(5L, 7L)))
    val slc = Subset.slice(10L, 18L, 20L)
    assert(slc.translate(Seq(3L, 0L)) == Vector(13L, 10L))
    assert(slc.translate(1L, 3L) == Left((11L, 13L)))
  }

  test("composition (subset_of) and request sanity checks") {
    val base = Subset.list(Seq(2L, 5L, 7L, 11L, 13L), 20L)
    val sub = Subset.subsetOf(base, 1L, 4L) // positions 1..3 -> {5, 7, 11}
    assert(sub.listRepresentation == Vector(5L, 7L, 11L))
    assert(Subset.subsetOf(sub, Seq(2L, 0L)).listRepresentation == Vector(5L, 11L))
    intercept[IllegalArgumentException] { base.translate(Seq.empty[Long]) }
    intercept[IllegalArgumentException] { base.translate(Seq(5L)) }  // >= numExamples
    intercept[IllegalArgumentException] { base.translate(2L, 2L) }   // start >= stop
    intercept[IllegalArgumentException] { base.translate(0L, 6L) }   // stop > numExamples
    intercept[IllegalArgumentException] { Subset.empty(10L).translate(0L, 1L) }
  }

  // ------------------------------------------- cluster-side application
  private def indexedSupplier =
    Indexed.withIdx(Tables.load(spark, sf, "supplier").select("s_suppkey"),
      Seq(col("s_suppkey"))) // 10 rows at sf0.001

  test("apply: slice, small list (isin), and empty selections") {
    val df = indexedSupplier
    assert(Subset.slice(2L, 6L, 10L)(df).orderBy("__idx")
      .select("__idx").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L, 5L))
    assert(Subset.list(Seq(8L, 1L, 4L), 10L)(df).orderBy("__idx")
      .select("__idx").collect().map(_.getLong(0)).toSeq == Seq(1L, 4L, 8L))
    assert(Subset.empty(10L)(df).count() == 0)
  }

  test("assignSplitStratified: exact per-stratum counts, tiny strata covered, determinism") {
    import SparkSpec.spark.implicits._
    val w = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    // 40-doc stratum at 80/10/10 -> exactly 32/4/4; a 3-doc stratum
    // still lands floor(2.4)=2 train, floor(2.7)-2=0 valid, 1 test.
    val rows = ((1L to 40L).map(i => ("big", i)) ++ Seq(("tiny", 100L), ("tiny", 101L), ("tiny", 102L)))
      .toDF("src", "doc_id")
    val out = graft.sources.SplitSource
      .assignSplitStratified(rows, "src", $"doc_id", seed = 19, weights = w)
    val counts = out.groupBy("src", "split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts(("big", "train")) == 32 && counts(("big", "valid")) == 4 &&
      counts(("big", "test")) == 4, s"got $counts")
    assert(counts(("tiny", "train")) == 2 && counts(("tiny", "test")) == 1 &&
      !counts.contains(("tiny", "valid")))
    // determinism under repartitioning
    val re = graft.sources.SplitSource
      .assignSplitStratified(rows.repartition(7), "src", $"doc_id", seed = 19, weights = w)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(re == out.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet)
  }

  test("assignSplitFromSubsets: indices-ref splits land in partitioned storage") {
    import graft.sources.SplitSource
    val df = indexedSupplier // 10 rows, __idx 0..9
    val splits = Seq(
      "train" -> Subset.slice(0L, 6L, 10L),
      "valid" -> Subset.list(Seq(9L, 7L), 10L))
    val assigned = SplitSource.assignSplitFromSubsets(df, splits)
    val byName = assigned.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName == Map("train" -> 6L, "valid" -> 2L, "rest" -> 2L))
    // overlap resolves to the first match, deterministically
    val overlapped = SplitSource.assignSplitFromSubsets(df, Seq(
      "a" -> Subset.slice(0L, 5L, 10L), "b" -> Subset.slice(3L, 8L, 10L)))
    assert(overlapped.filter(col("__idx") === 4).select("split").head().getString(0) == "a")
    // round trip: written partitioned, read back split-pruned
    val out = java.nio.file.Files.createTempDirectory("graft_split").toString
    SplitSource.write(assigned, out)
    val back = SplitSource.read(spark, out, "valid")
    assert(back.count() == 2)
    assert(back.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(split"))
    // ORC carries the same partition-discovery contract: identical
    // round trip, identical pruning, same rows as the parquet store
    val orcOut = java.nio.file.Files.createTempDirectory("graft_split_orc").toString
    SplitSource.write(assigned, orcOut, format = "orc")
    val orcBack = SplitSource.read(spark, orcOut, "valid", format = "orc")
    assert(orcBack.count() == 2)
    assert(orcBack.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(split"))
    assert(orcBack.select("__idx").collect().map(_.getLong(0)).sorted.toSeq ==
      back.select("__idx").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("apply: large-list path is a broadcast semi-join, same rows as isin") {
    val df = indexedSupplier
    val sub = Subset.list(Seq(9L, 0L, 3L, 5L), 10L)
    val viaJoin = sub(df, isinThreshold = 0) // force the join path
    assert(viaJoin.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(viaJoin.orderBy("__idx").select("__idx").collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 3L, 5L, 9L))
    assert(viaJoin.columns.toSeq == df.columns.toSeq) // semi-join keeps the schema
  }
}
