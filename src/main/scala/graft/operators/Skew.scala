package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for shuffle joins — the third leg of the
  * engine's skew story. The first two are structural: rewrite the
  * operator so the skewed key only ever moves pre-aggregated rows
  * ([[graft.dedup.Dedup.exact]]'s agg-form), or avoid the shuffle
  * entirely (broadcast, bucketed stores). When neither applies — a
  * genuinely large dim side AND a skewed fact key — the classic fix is
  * SALTING: split each fact key into `salt` sub-keys and replicate the
  * dim row once per sub-key, so a hot key's rows land on `salt`
  * reducers instead of one. AQE's runtime skew-join
  * (`spark.sql.adaptive.skewJoin`, on by default in [[graft.Graft]]
  * sessions) already splits oversized SORT-MERGE partitions after the
  * fact; the explicit form here is for when the skew is KNOWN up front
  * and the plan should never build the hot partition in the first
  * place (and for join shapes AQE's splitter does not cover).
  *
  * Production guidance, measured: the engine's own pipelines need NO
  * explicit salting — every hot-key join is either structurally immune
  * (agg-form exact dedup, the (group, hash)-keyed cap join-back,
  * broadcast anti-joins) or SMJ-shaped and covered by AQE's splitter,
  * which PlanSpec verifies by executing
  * [[graft.operators.Events.conversionLags]] (the raw-event-stream x
  * per-user join — the one production site with a known flooding key)
  * over a 90%-hot user and asserting `skew=true` on the executed plan.
  * Reach for [[saltedJoin]] when a join is NOT sort-merge (broadcast
  * disabled + hash join), when the hot partition must never be BUILT
  * (straggler-sensitive SLAs), or when AQE is off.
  */
object Skew {

  /** Salted equi-join: `facts ⋈ dim ON factKey = dimKey`, with the
    * shuffle keyed by (key, salt) instead of the key alone. The salt is
    * DERIVED, not random — `pmod(hash64(saltBy), salt)` over a
    * row-unique fact column — so retries and both sides of a
    * speculative task compute identical placements (a `rand()` salt
    * breaks exactly-once shuffle semantics under retry). The dim side
    * explodes once per salt value (|dim|·salt rows — choose `salt` ~
    * the per-key reducer fan-out you need, not the cluster size; 8–64
    * covers a 1000-executor deployment), so the join is semantics-
    * preserving for inner/left joins: every (fact, dim) key match meets
    * exactly once, on the fact row's own salt lane.
    *
    * Scale shape: one exchange per side keyed (key, salt) — the hot
    * key's rows spread across `salt` partitions by construction; no
    * partition exceeds ~|hottest key|/salt + uniform share. Output:
    * the fact columns plus the dim's non-key columns (the usual
    * equi-join projection), salt column dropped. */
  def saltedJoin(facts: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltBy: Column, salt: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(salt >= 1, s"saltedJoin: salt must be >= 1, got $salt")
    require(joinType == "inner" || joinType == "left" ||
      joinType == "left_outer",
      s"saltedJoin: only inner/left joins are salt-preserving as " +
        s"implemented, got '$joinType'")
    // The working column is internal: an input already carrying __salt
    // (e.g. the output of a previous saltedJoin that failed to drop it,
    // or a user column with the reserved name) would make the lane
    // condition ambiguous and silently corrupt the join keys.
    require(!facts.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin: inputs must not already carry a __salt column " +
        "(reserved as the internal salt lane)")
    // hash64 is null-preserving: an uncoalesced NULL saltBy would make
    // __salt NULL, the lane condition never match, and a real key match
    // silently vanish (inner) or null out (left) — the coalesce keeps
    // the documented semantics-preserving contract for ANY saltBy.
    val f = facts.withColumn("__salt",
      pmod(coalesce(graft.functions.Stable.hash64(saltBy), lit(0L)),
        lit(salt.toLong)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    f.join(d, f("__salt") === d("__salt") &&
        f(factKey) === d(dimKey), joinType)
      .drop(d(dimKey)).drop(f("__salt")).drop(d("__salt"))
  }
}
