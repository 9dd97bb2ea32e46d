package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Stable

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): pick the `k` raw-corpus documents whose hashed
  * n-gram profile looks most like a small TARGET corpus. Features are
  * bag-of-hashed-ngrams (unigrams + bigrams folded into `buckets`
  * buckets); both the target model p and the raw model q are bucket
  * count tables, and each document's log importance weight is
  *
  *   log w(x) = Σ_gram (log p_b(gram) - log q_b(gram))
  *
  * Cross-engine exactness is the same constraint [[Perplexity]]
  * solves the same way: real log-probs are IEEE doubles whose
  * distributed sum is order-dependent, so probabilities are QUANTIZED
  * to integer bit costs (`ilog2(x) = length(bin(x)) - 1`, identical in
  * Spark and DuckDB) with add-one smoothing:
  *
  *   lw(x) = Σ_gram [ ilog2(ct_b + 1) - ilog2(cr_b + 1) ]
  *         + n_grams * [ ilog2(Tr) - ilog2(Tt) ]
  *
  * (ct/cr = bucket counts in target/raw, Tt/Tr = model totals — the
  * total terms are per-occurrence constants, folded into the per-bucket
  * λ table). The paper resamples with Gumbel noise on log w; Gumbel
  * needs `-log(-log(u))` — a libm call whose low bits differ across
  * engines — so selection here is the deterministic variant: top-k by
  * (lw DESC, seeded-hash tie-break, id). The seeded hash gives ties the
  * same "random" resolution on every engine and under every retry.
  *
  * Scale shape: both models are bounded by `buckets` BY CONSTRUCTION
  * (a groupBy on the bucket id), so model shuffles move ≤ `buckets`
  * rows after map-side combine and the λ table always broadcasts. The
  * corpus side is one pure-projection gram explode + a broadcast join
  * + one doc-keyed map-side-combined agg — the corpus token stream
  * never shuffles — and top-k is a TakeOrdered, never a global sort.
  *
  * Reference analog: fuel has no data-selection tier; this extends the
  * SURVEY §2 text-analysis family the way [[Perplexity]] does for
  * CCNet's LM tier.
  */
object Dsir {

  private def ilog2(c: Column): Column = (length(bin(c)) - 1).cast("bigint")

  /** Hashed unigram + bigram bucket ids as ONE pure projection:
    * `pmod(hash64(token), buckets)` for every token plus
    * `pmod(hash64(tok_i || ' ' || tok_{i+1}), buckets)` for every
    * adjacent pair (tokens are whitespace-split, so the space join is
    * injective). The bigram arm is guarded — Spark's `sequence(1, 0)`
    * DESCENDS rather than returning empty. */
  def gramBuckets(toks: Column, buckets: Int): Column = {
    val uni = transform(toks, t => pmod(Stable.hash64(t), lit(buckets.toLong)))
    val bi = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1), i =>
        pmod(Stable.hash64(concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1))), lit(buckets.toLong))))
      .otherwise(array().cast("array<bigint>"))
    concat(uni, bi)
  }

  /** One (id, bucket) row per gram occurrence. */
  private def gramRows(docs: DataFrame, idCol: String, toksCol: String,
      buckets: Int): DataFrame =
    docs.select(col(idCol),
        explode_outer(gramBuckets(col(toksCol), buckets)).as("__b"))
      .filter(col("__b").isNotNull)

  /** The hashed bag-of-ngrams model: (__b, __c) bucket counts over a
    * frame — ≤ `buckets` rows by construction. */
  def model(docs: DataFrame, toksCol: String, buckets: Int,
      idCol: String = "doc_id"): DataFrame =
    gramRows(docs, idCol, toksCol, buckets)
      .groupBy("__b").agg(count(lit(1)).as("__c"))

  /** Score every `raw` document: the input frame minus `toksCol`, plus
    * (n_grams, lw) — the quantized integer log importance weight
    * (higher = more target-like). Zero-gram docs score (0, 0). */
  def importance(raw: DataFrame, target: DataFrame, idCol: String = "doc_id",
      toksCol: String = "ts", buckets: Int = 4096): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val spark = raw.sparkSession
    // Both models are ≤ `buckets` rows; persist so the totals action
    // below doesn't recompute the corpus-wide gram aggregation.
    val tm = model(target, toksCol, buckets, idCol).persist()
    val rm = model(raw, toksCol, buckets, idCol).persist()
    val tTot = tm.agg(coalesce(sum("__c"), lit(0L))).head().getLong(0)
    val rTot = rm.agg(coalesce(sum("__c"), lit(0L))).head().getLong(0)
    require(tTot > 0, "Dsir.importance: target corpus has no grams — " +
      "an empty target model would score every raw doc identically")
    require(rTot > 0, "Dsir.importance: raw corpus has no grams")
    val const = (63 - java.lang.Long.numberOfLeadingZeros(rTot)) -
      (63 - java.lang.Long.numberOfLeadingZeros(tTot))
    // Full λ table over all buckets: every corpus gram joins inner, so
    // there is no missing-bucket edge case to coalesce per-row.
    val lam = spark.range(buckets).toDF("__b")
      .join(tm.withColumnRenamed("__c", "__ct"), Seq("__b"), "left")
      .join(rm.withColumnRenamed("__c", "__cr"), Seq("__b"), "left")
      .select(col("__b"),
        (ilog2(coalesce(col("__ct"), lit(0L)) + 1) -
         ilog2(coalesce(col("__cr"), lit(0L)) + 1) +
         lit(const.toLong)).as("__lam"))
    val scores = gramRows(raw, idCol, toksCol, buckets)
      .join(broadcast(lam), Seq("__b"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"), sum(col("__lam")).as("lw"))
    raw.drop(toksCol)
      .join(scores, Seq(idCol), "left")
      .withColumn("n_grams", coalesce(col("n_grams"), lit(0L)))
      .withColumn("lw", coalesce(col("lw"), lit(0L)))
  }

  /** DSIR selection: the `k` most target-like raw documents by
    * (lw DESC, seeded tie-break, id) — a TakeOrdered, not a sort. */
  def select(raw: DataFrame, target: DataFrame, k: Int,
      idCol: String = "doc_id", toksCol: String = "ts",
      buckets: Int = 4096, seed: Long = 1L): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    importance(raw, target, idCol, toksCol, buckets)
      .orderBy(col("lw").desc, Stable.seededHash(seed, col(idCol)), col(idCol))
      .limit(k)
  }
}
