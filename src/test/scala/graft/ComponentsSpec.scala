package graft

import org.apache.spark.sql.functions._

import graft.dedup.Components

/** Connected components (alternating large-star/small-star) over
  * near-dup pair graphs. The path-graph cases are the load-bearing
  * ones: pairwise dedup never sees A~C in a chain A~B~C, components
  * must. */
class ComponentsSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a path graph collapses to one cluster labeled by its minimum") {
    // 5~3~9~1~7: no pair shares an edge with the min except 1 itself.
    val m = cc(Seq((5L, 3L), (3L, 9L), (9L, 1L), (1L, 7L)))
    assert(m == Map(1L -> 1L, 3L -> 1L, 5L -> 1L, 7L -> 1L, 9L -> 1L))
  }

  test("disjoint components keep distinct labels; edge order and orientation are irrelevant") {
    val m = cc(Seq((2L, 4L), (4L, 6L), (11L, 10L), (20L, 21L), (21L, 20L)))
    assert(m == Map(2L -> 2L, 4L -> 2L, 6L -> 2L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("a 64-node path converges (diameter >> O(log n) round budget)") {
    // The property min-label propagation lacks: 63 propagation hops,
    // but the alternating algorithm's default 25-round budget holds
    // with a wide margin.
    val edges = (0L until 63L).map(i => (i, i + 1))
    val m = cc(edges)
    assert(m.size == 64 && m.values.forall(_ == 0L))
  }

  test("self-loops and duplicate edges are ignored") {
    val m = cc(Seq((3L, 3L), (3L, 5L), (5L, 3L), (3L, 5L)))
    assert(m == Map(3L -> 3L, 5L -> 3L))
  }

  test("clusterSizes: one row per member carrying its component size") {
    val out = Components.clusterSizes(
        Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id1", "id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (7L, 7L, 2L), (8L, 7L, 2L)))
  }

  test("keepCanonical: one survivor per family, singletons untouched") {
    // Corpus 1..8; families {1,2,3} (path) and {5,7}; 4,6,8 untouched.
    val corpus = (1L to 8L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 7L)).toDF("id1", "id2")
    val out = Components.keepCanonical(corpus, "doc_id", edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 1L, 3L), (4L, 4L, 1L), (5L, 5L, 2L),
      (6L, 6L, 1L), (8L, 8L, 1L)))
  }

  test("labels are invariant under input repartitioning") {
    val edges = Seq((5L, 3L), (3L, 9L), (9L, 1L), (1L, 7L), (20L, 40L))
      .toDF("id1", "id2")
    val a = Components.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val b = Components.connectedComponents(edges.repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(a == b)
  }

  test("keepBest: highest quality survives per family, ties to smaller id, singletons kept") {
    // Family {1,2,3} (chain 1-2, 2-3): doc 2 is the longest → survives
    // (min-id would keep 1 — the case this rule exists to fix).
    // Family {10,11}: equal quality → tie to 10. Doc 50: singleton.
    val corpus = Seq((1L, 5L), (2L, 9L), (3L, 7L), (10L, 4L), (11L, 4L),
      (50L, 2L)).toDF("doc_id", "q")
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val got = Components.keepBest(corpus, "doc_id", "q", edges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map(2L -> (1L, 3L, 9L), 10L -> (10L, 2L, 4L),
      50L -> (50L, 1L, 2L)), s"got $got")
  }
}
