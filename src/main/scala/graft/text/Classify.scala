package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Hash64Expr, HashScoreExpr, Stable}
import org.apache.spark.unsafe.types.UTF8String

/** Classifier-based quality gating — the "train a quality classifier,
  * score the whole corpus, keep the high scorers plus a stochastic
  * rescue tail" stage of the published LM pipelines (GPT-3's
  * logistic-regression quality filter with Pareto-sampled admission;
  * CCNet's fastText scoring; reference analog: fuel's Filter transformer,
  * fuel/transformers/__init__.py — a predicate over a stream, here a
  * model score over the corpus).
  *
  * The scorer is the feature-hashing linear model
  * ([[graft.functions.HashScoreExpr]]): score = Σ_tokens
  * weights[hash64(token) mod dim]. Production use packs a TRAINED
  * model's weights into the fixed-point array (scale floats by 10^6 and
  * round — the exact-arithmetic-at-the-edges rule: an integer sum is
  * order-independent and bit-exact cross-engine, a float dot product is
  * neither); q72 drives it with [[seededWeights]] so the whole path is
  * oracle-verifiable. Scoring and gating are PURE PROJECTIONS — no
  * shuffle anywhere; the gate composes with the language/token-floor/
  * repetition gates as one codegen'd filter chain. */
object Classify {

  /** Deterministic fixed-point weight fill, reproducible by an external
    * engine: weights(i) = (hash64(tag + i) mod 2001) - 1000 — integer
    * micro-weights in [-1000, 1000] (DuckDB:
    * `(hash64(concat(tag, i)) % 2001) - 1000`). Stand-in for a trained
    * model in oracles and specs; ALSO the seeded random-projection
    * baseline (hashing-trick features with random weights) a classifier
    * gate is calibrated against. */
  def seededWeights(dim: Int, tag: String): Array[Long] =
    Array.tabulate(dim) { i =>
      Hash64Expr.hash(UTF8String.fromString(s"$tag$i")) % 2001 - 1000
    }

  /** TRAIN the quality classifier in-engine — the half of the published
    * recipe [[seededWeights]] stands in for: multinomial Naive Bayes
    * log-odds from two labeled seed corpora (the GPT-3/CCNet setup:
    * positives = a curated reference like Wikipedia, negatives = raw
    * crawl), with the log quantized to integer BITS (ilog2 — the
    * [[graft.text.TextOps.tfidfTopTerms]]/[[Perplexity]] rule: libm
    * never enters, every weight is an exact cross-engine integer):
    *
    *   w(t) = [ilog2(cpos(t)+1) − ilog2(cneg(t)+1)]
    *        + [ilog2(Tneg+V) − ilog2(Tpos+V)]
    *
    * — the add-one-smoothed class log-likelihood ratio, the second
    * bracket the (token-independent) normalizer that keeps scores
    * comparable when the seed corpora differ in size. Output: (token,
    * weight) — the model AS A TABLE, inspectable and joinable (the
    * most-positive / most-negative tokens are one ORDER BY away).
    *
    * Scale shape: one map-side-combined token-keyed count agg per seed
    * corpus, a vocab-keyed full-outer join of the two ALREADY-collapsed
    * count frames, and the three corpus scalars (V, Tpos, Tneg) ride in
    * as one broadcast one-row frame aggregated from the joined vocab
    * frame itself — the seed corpora are each scanned exactly once. */
  def trainNaiveBayes(pos: DataFrame, neg: DataFrame,
      toksCol: String): DataFrame = {
    val ilog2 = (c: org.apache.spark.sql.Column) =>
      (length(bin(c)) - 1).cast("bigint")
    val cp = pos.select(explode(col(toksCol)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("__cp"))
    val cn = neg.select(explode(col(toksCol)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("__cn"))
    val vocab = cp.join(cn, Seq("token"), "full_outer")
      .select(col("token"), coalesce(col("__cp"), lit(0L)).as("__cp"),
        coalesce(col("__cn"), lit(0L)).as("__cn"))
    val tot = vocab.agg(count(lit(1)).as("__v"),
      coalesce(sum(col("__cp")), lit(0L)).as("__tp"),
      coalesce(sum(col("__cn")), lit(0L)).as("__tn"))
    vocab.crossJoin(broadcast(tot))
      .select(col("token"),
        (ilog2(col("__cp") + 1) - ilog2(col("__cn") + 1)
          + ilog2(col("__tn") + col("__v"))
          - ilog2(col("__tp") + col("__v"))).as("weight"))
  }

  /** Pack a trained (token, weight) table into the fixed-point array
    * [[graft.functions.HashScoreExpr]] scores with — colliding tokens
    * SUM (the hashing trick's documented semantics, Weinberger et al.
    * 2009), empty buckets are 0. The collect is bounded by `dim` rows
    * (the [[graft.ann.Ann]] sampleCentroids rule: a model's parameter
    * vector is driver-sized by design; the vocab itself never leaves
    * the cluster — the bucket agg collapses it map-side). */
  def packWeights(weights: DataFrame, dim: Int,
      tokenCol: String = "token", wCol: String = "weight"): Array[Long] = {
    require(dim > 0, s"packWeights: dim must be positive, got $dim")
    val arr = Array.fill(dim)(0L)
    weights
      .groupBy(pmod(Stable.hash64(col(tokenCol)), lit(dim.toLong)).as("__b"))
      .agg(sum(col(wCol)).as("__w"))
      .collect().foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Score every doc: adds `score_sum` (exact integer dot product),
    * `n_tokens`, and `mean_score` (int/int double division at the output
    * edge — the only float, and an exactly-reproducible one; null for a
    * zero-token doc, which has no mean — and ANSI mode would rightly
    * throw on the 0/0). */
  def score(docs: DataFrame, toksCol: String, weights: Array[Long]): DataFrame =
    docs
      .withColumn("score_sum", HashScoreExpr.hashScore(col(toksCol), weights))
      .withColumn("n_tokens", size(col(toksCol)).cast("bigint"))
      .withColumn("mean_score",
        when(col("n_tokens") > 0,
          col("score_sum").cast("double") / col("n_tokens").cast("double")))

  /** The gate: keep docs whose mean token score clears `minMeanMicros`
    * (micro-units: mean_score > minMeanMicros / 10^6, compared in exact
    * integer cross-multiplied form — `score_sum * 10^6 > minMeanMicros *
    * n_tokens` — so the cut is bit-stable cross-engine), plus a seeded
    * Bernoulli RESCUE of the rejects at `rescueFraction` (the published
    * trick that keeps the training distribution from collapsing onto the
    * classifier's notion of quality; [[graft.sources.SplitSource.sample]]'s
    * integer-threshold determinism, keyed by (seed, idCol)). Zero-token
    * docs drop (no score to gate on). Pure filter — pushes to the scan. */
  def gate(docs: DataFrame, idCol: String, toksCol: String, weights: Array[Long],
      minMeanMicros: Long, rescueFraction: Double = 0.0,
      seed: Long = 42): DataFrame = {
    require(rescueFraction >= 0 && rescueFraction <= 1,
      s"rescueFraction must be in [0,1]: $rescueFraction")
    val scoreSum = HashScoreExpr.hashScore(col(toksCol), weights)
    val n = size(col(toksCol)).cast("bigint")
    val rescueThreshold = math.round(rescueFraction * graft.sources.SplitSource.Buckets)
    docs.filter(n > 0 &&
      (scoreSum * lit(1000000L) > lit(minMeanMicros) * n ||
        pmod(Stable.seededHash(seed, col(idCol)),
          lit(graft.sources.SplitSource.Buckets.toLong)) < lit(rescueThreshold)))
  }

  /** Quality-WEIGHTED sampling — the soft alternative to [[gate]]'s
    * hard cut (the DCLM/FineWeb-Edu move: sample by classifier score
    * instead of thresholding, so the kept distribution degrades
    * gracefully instead of cliff-ing at the boundary): a doc with mean
    * micro-score s keeps with probability clamp((s − lo)/(hi − lo), 0, 1)
    * — never below `loMicros`, always at or above `hiMicros`, linear
    * ramp between.
    *
    * Determinism without division: keep iff
    * `hash·den < num·10^6` with num = score_sum·10^6 − lo·n and
    * den = (hi − lo)·n — the Bernoulli threshold CROSS-MULTIPLIED away
    * (the [[graft.ann.Ann.contaminatedSemantic]] trick), every factor
    * cast to DECIMAL(38,0) BEFORE multiplying (the products pass 2^63
    * at realistic doc lengths; a silent long wrap would flip keeps) —
    * HUGEINT in the oracle, bit-identical. The clamp falls out of the
    * compare: num ≤ 0 never keeps, num ≥ den always does. Pure filter
    * — pushes to the scan, no shuffle. */
  def sampleByQuality(docs: DataFrame, idCol: String, toksCol: String,
      weights: Array[Long], loMicros: Long, hiMicros: Long,
      seed: Long = 42): DataFrame = {
    require(hiMicros > loMicros,
      s"sampleByQuality: need loMicros < hiMicros, got [$loMicros, $hiMicros]")
    val dec = "decimal(38,0)"
    val scoreSum = HashScoreExpr.hashScore(col(toksCol), weights)
    val n = size(col(toksCol)).cast("bigint")
    val hash = pmod(Stable.seededHash(seed, col(idCol)), lit(1000000L))
    val num = (scoreSum * lit(1000000L)).cast(dec) - (lit(loMicros) * n).cast(dec)
    val den = (lit(hiMicros - loMicros) * n).cast(dec)
    docs.filter(n > 0 &&
      hash.cast(dec) * den < num * lit(1000000L).cast(dec))
  }
}
