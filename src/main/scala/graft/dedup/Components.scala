package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the missing tier
  * between PAIRWISE near-dup removal and what published curation
  * pipelines actually ship: MinHash/LSH emits verified pairs, but a
  * template family is a CLUSTER (progressive drift chains A~B~C where
  * A and C never collide in any band), and "keep one doc per cluster"
  * needs the transitive closure. Pairwise drop-the-larger keeps every
  * node that is never the larger end of a verified pair — correct for
  * isolated pairs, under-informed for families: it can keep two docs of
  * the same family that merely lack a direct edge, and it cannot report
  * family sizes at all (the per-cluster statistics dedup reports are
  * built from).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014).
  * Each round is two groupBy+join passes over the EDGE list (ids only,
  * never documents), and the round count is O(log n) INDEPENDENT of
  * component diameter. That property is the 100 TB design choice: the
  * obvious min-label propagation converges in diameter rounds, and the
  * adversarial input — a boilerplate template drifting one field per
  * release — is precisely a long path. At 100 TB the edge list is the
  * verified near-dup pair set: orders of magnitude smaller than the
  * corpus, so even tens of iterations touch only sketch-sized frames.
  *
  * Each round `localCheckpoint`s its edge frame and releases the
  * previous one: iterative algorithms DOUBLE their logical plan every
  * round, so a bare persist leaves planning (and AQE re-planning) with
  * an exponentially growing tree — truncating lineage is as much a part
  * of the algorithm as the star steps. On a real cluster prefer
  * `sparkContext.setCheckpointDir` + `checkpoint()` for the same
  * truncation with fault tolerance; local checkpoints die with an
  * executor, which a single-JVM deployment cannot observe. Convergence
  * is detected by an edge-set fixed point (anti-join probe + count —
  * both bounded by the edge frame). Non-convergence within `maxRounds`
  * raises with the diagnosis rather than returning a partial labeling.
  *
  * Reference analog: fuel has no graph tier (its dedup story ends at
  * hash equality); this extends SURVEY §2's dedup family the way
  * published LLM pipelines (SlimPajama, FineWeb) extend MinHash.
  *
  * @return one row per node of the edge graph: (doc_id, cluster_id)
  *         where cluster_id = the component's minimum node id (the
  *         canonical survivor under keep-min policy).
  */
object Components {

  def connectedComponents(edges: DataFrame, aCol: String = "id1",
      bCol: String = "id2", maxRounds: Int = 25): DataFrame = {
    // Orient (big, small), drop self-loops, dedup: the invariant u > v
    // holds for every edge frame below (both star steps emit (x, m)
    // with x > m), so "small end" always means "smaller id".
    var e = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct().localCheckpoint()
    var eCount = e.count()

    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      // Large-star: over the undirected adjacency, connect every
      // neighbor v > u to m = min(Γ(u) ∪ {u}). Emitted edges keep the
      // (big, small) orientation because v > u >= m.
      val adj = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val lsMin = adj.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val ls = adj.join(lsMin, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))

      // Small-star: group the oriented edges by their big end u
      // (neighbors all < u), m = min; connect u and every other small
      // neighbor to m.
      val ssMin = ls.groupBy("u").agg(min("v").as("m"))
      val next = ls.join(ssMin, Seq("u"))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(ssMin.select(col("u"), col("m").as("v")))
        .distinct().localCheckpoint()

      // Fixed point: next ⊆ e and |next| = |e| ⟺ next = e. Both probes
      // are edge-frame-bounded (the anti-join stops at the first
      // witness).
      val nextCount = next.count()
      done = nextCount == eCount &&
        next.join(e, Seq("u", "v"), "left_anti").isEmpty
      e.unpersist()
      e = next
      eCount = nextCount
      round += 1
    }
    require(done, s"connectedComponents: no fixed point after $maxRounds " +
      "alternating rounds — the algorithm converges in O(log n) rounds, so " +
      "either maxRounds is sized far below log2(nodes) or the edge input is " +
      "pathological (raise maxRounds; each round is two edge-frame passes)")

    // Converged edge set is a star forest: every non-root points
    // directly at its component minimum. Roots label themselves.
    val labels = e.select(col("u").as("doc_id"), col("v").as("cluster_id"))
      .union(e.select(col("v").as("doc_id"), col("v").as("cluster_id")).distinct())
    labels
  }

  /** [[connectedComponents]] plus per-cluster size — the frame dedup
    * reports are built from (family sizes, dedup ratios per family).
    * The size pass shuffles only the LABEL frame, which is bounded by
    * the near-dup graph (nodes that appear in >= 1 verified pair), not
    * the corpus. */
  def clusterSizes(edges: DataFrame, aCol: String = "id1",
      bCol: String = "id2", maxRounds: Int = 25): DataFrame = {
    val labels = connectedComponents(edges, aCol, bCol, maxRounds)
    val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("cluster_id"))
      .select("doc_id", "cluster_id", "cluster_size")
  }

  /** The dedup ACTION the cluster tier exists for: keep exactly ONE doc
    * per near-dup family — the member with the minimum id (the
    * `cluster_id` label itself under [[connectedComponents]]' min-label
    * convention) — and every doc that appears in no verified pair.
    * Output: one row per SURVIVOR, (idCol, cluster_id, cluster_size),
    * where an untouched doc is its own singleton family. Pairwise
    * drop-the-larger (q28's consumer shape) under-drops drift chains —
    * A~B~C keeps A and C when A,C never collide in a band; the closure
    * keeps only A (see the object scaladoc).
    *
    * Scale shape: the label frame is bounded by the near-dup GRAPH
    * (docs in ≥ 1 verified pair — sketch-sized, orders of magnitude
    * under the corpus), so the corpus-side left join is
    * broadcast-shaped; AQE picks broadcast when the label frame fits
    * and falls back to a shuffle join keyed on the id when a
    * pathological corpus makes the graph corpus-sized — both correct,
    * neither all-pairs. */
  def keepCanonical(corpus: DataFrame, idCol: String, edges: DataFrame,
      aCol: String = "id1", bCol: String = "id2",
      maxRounds: Int = 25): DataFrame = {
    val labeled = clusterSizes(edges, aCol, bCol, maxRounds)
      .withColumnRenamed("doc_id", idCol)
    corpus.select(col(idCol)).join(labeled, Seq(idCol), "left")
      .filter(col("cluster_id").isNull || col("cluster_id") === col(idCol))
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"))
  }

  /** [[keepCanonical]] with a QUALITY rule instead of the min-id
    * convention — what the published pipelines actually do with a
    * duplicate cluster (keep the longest / highest-scoring member, not
    * an arbitrary one): the survivor of each closure family is its
    * argmax of `qualityCol` (ties to the smaller id). The min-id
    * convention silently discards the best copy whenever the best copy
    * is not the oldest — this variant is the fix. Output: one row per
    * survivor, (idCol, cluster_id, cluster_size, qualityCol).
    *
    * Scale shape: [[keepCanonical]]'s — the label frame is graph-
    * bounded and broadcast-shaped against the corpus; the argmax is a
    * struct-min agg over the labeled frame (map-side combined, never a
    * per-cluster window), and the survivor join is keyed by the
    * cluster id over two already-collapsed frames. */
  def keepBest(corpus: DataFrame, idCol: String, qualityCol: String,
      edges: DataFrame, aCol: String = "id1", bCol: String = "id2",
      maxRounds: Int = 25): DataFrame = {
    val labeled = clusterSizes(edges, aCol, bCol, maxRounds)
      .withColumnRenamed("doc_id", idCol)
    val tagged = corpus
      .select(col(idCol), col(qualityCol).cast("bigint").as(qualityCol))
      .join(labeled, Seq(idCol), "left")
      .select(col(idCol), col(qualityCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"))
    val best = tagged.groupBy("cluster_id")
      .agg(min(struct((-col(qualityCol)).as("__nq"), col(idCol).as("__id")))
        .getField("__id").as("__keep"))
    tagged.join(best, Seq("cluster_id"))
      .filter(col(idCol) === col("__keep"))
      .select(col(idCol), col("cluster_id"), col("cluster_size"), col(qualityCol))
  }
}
