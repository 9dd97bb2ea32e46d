package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.text.TextOps
import graft.sources.Tables

/** ROUND-15 SCRATCH A/B HARNESS — NOT COMMITTED, deleted before close.
  *
  * Interleaved same-JVM variant timing (the r14 box-noise protocol): the
  * box's per-core speed swings ~3x under hypervisor-level load, so
  * back-to-back process-level A/Bs are unreliable; alternating variants
  * inside one JVM hits both with the same contention.
  *
  * Usage: runMain graft.ScratchR15 <mode> [sfDir] [rounds]
  */
object ScratchR15 {
  private def runFull(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(f: => DataFrame): Double = {
    val t0 = System.nanoTime(); runFull(f); (System.nanoTime() - t0) / 1e9
  }

  // ---- variant implementations -------------------------------------

  /** dedupSpans ONE-PASS window form: count/min over a window keyed by
    * the gram hash replaces the dict agg + occurrence re-scan + join. */
  def dedupSpansWin(df: DataFrame, idCol: String, toksCol: String, k: Int = 20,
      out: String = "clean_text", posCap: Int = 1 << 21,
      sep: String = " "): DataFrame = {
    val base = df.select(col(idCol), col(toksCol).as("__ts"))
    val occ = base.filter(size(col("__ts")) > 0)
      .select(col(idCol),
        when(size(col("__ts")) >= lit(posCap), raise_error(concat(
            lit(s"dedupSpans: doc exceeds posCap=$posCap tokens (id "),
            col(idCol).cast("string"),
            lit(s"); raise posCap"))))
          .otherwise(col("__ts")).as("__ts"))
      .withColumn("__grams", TextOps.ngramHashes(col("__ts"), k))
      .select(col(idCol), posexplode(col("__grams")).as(Seq("__p", "__h")))
      .withColumn("__ok", col(idCol).cast("long") * posCap + col("__p"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__h")
    val cuts = occ
      .withColumn("__c", count(lit(1)).over(w))
      .withColumn("__own", min(col("__ok")).over(w))
      .filter(col("__c") > 1 && col("__ok") =!= col("__own"))
      .select(col(idCol), col("__p"))
    val empty = array().cast("array<struct<s:int,e:int>>")
    val islands = cuts.groupBy(idCol)
      .agg(sort_array(collect_list(col("__p"))).as("__ps"))
      .select(col(idCol),
        aggregate(col("__ps"), empty, (acc, p) =>
          when(size(acc) > 0 && p <= element_at(acc, -1)("e"),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(struct(element_at(acc, -1)("s").as("s"), (p + lit(k)).as("e")))))
          .otherwise(concat(acc,
            array(struct(p.as("s"), (p + lit(k)).as("e")))))).as("__spans"))
    base.join(islands, Seq(idCol), "left")
      .select(col(idCol), col("__ts"), coalesce(col("__spans"), empty).as("__sp"))
      .select(col(idCol),
        concat_ws(sep, filter(col("__ts"), (_, i) =>
          !exists(col("__sp"), sp => i >= sp("s") && i < sp("e")))).as(out),
        size(col("__ts")).cast("bigint").as("n_tokens"),
        aggregate(col("__sp"), lit(0),
          (a, sp) => a + least(sp("e"), size(col("__ts"))) - sp("s"))
          .cast("bigint").as("n_removed"),
        size(col("__sp")).cast("bigint").as("n_spans"))
  }

  /** dedupSpans PERSIST form: two-pass shape kept, occurrence digest
    * stream persisted so grams hash once. */
  def dedupSpansPersist(df: DataFrame, idCol: String, toksCol: String, k: Int = 20,
      out: String = "clean_text", posCap: Int = 1 << 21,
      sep: String = " "): DataFrame = {
    val base = df.select(col(idCol), col(toksCol).as("__ts"))
    val occ = base.filter(size(col("__ts")) > 0)
      .select(col(idCol),
        when(size(col("__ts")) >= lit(posCap), raise_error(concat(
            lit(s"dedupSpans: doc exceeds posCap=$posCap tokens (id "),
            col(idCol).cast("string"),
            lit(s"); raise posCap"))))
          .otherwise(col("__ts")).as("__ts"))
      .withColumn("__grams", TextOps.ngramHashes(col("__ts"), k))
      .select(col(idCol), posexplode(col("__grams")).as(Seq("__p", "__h")))
      .withColumn("__ok", col(idCol).cast("long") * posCap + col("__p"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dict = occ.groupBy("__h")
      .agg(count(lit(1)).as("__c"), min(col("__ok")).as("__own"))
      .filter(col("__c") > 1)
      .select("__h", "__own")
    val cuts = occ.join(dict, Seq("__h"))
      .filter(col("__ok") =!= col("__own"))
      .select(col(idCol), col("__p"))
    val empty = array().cast("array<struct<s:int,e:int>>")
    val islands = cuts.groupBy(idCol)
      .agg(sort_array(collect_list(col("__p"))).as("__ps"))
      .select(col(idCol),
        aggregate(col("__ps"), empty, (acc, p) =>
          when(size(acc) > 0 && p <= element_at(acc, -1)("e"),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(struct(element_at(acc, -1)("s").as("s"), (p + lit(k)).as("e")))))
          .otherwise(concat(acc,
            array(struct(p.as("s"), (p + lit(k)).as("e")))))).as("__spans"))
    base.join(islands, Seq(idCol), "left")
      .select(col(idCol), col("__ts"), coalesce(col("__spans"), empty).as("__sp"))
      .select(col(idCol),
        concat_ws(sep, filter(col("__ts"), (_, i) =>
          !exists(col("__sp"), sp => i >= sp("s") && i < sp("e")))).as(out),
        size(col("__ts")).cast("bigint").as("n_tokens"),
        aggregate(col("__sp"), lit(0),
          (a, sp) => a + least(sp("e"), size(col("__ts"))) - sp("s"))
          .cast("bigint").as("n_removed"),
        size(col("__sp")).cast("bigint").as("n_spans"))
  }

  /** OLD (pre-r14) pageRank: per-iteration nodes⟕contribs join form. */
  def pageRankOld(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5, dampNum: Long = 85, dampDen: Long = 100,
      scale: Long = 1000000000000L): DataFrame = {
    val e = edges.select(col(srcCol).cast("bigint").as("src"),
      col(dstCol).cast("bigint").as("dst"))
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("__deg"))
    val ewd = e.join(outdeg, Seq("src"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.agg(count(lit(1)).as("__n"))
    val base = s"${scale * (dampDen - dampNum)} div ($dampDen * __n)"
    var ranks = nodes.crossJoin(broadcast(n))
      .selectExpr("node", s"$scale div __n AS rank")
    for (_ <- 1 to iters) {
      val contribs = ewd.join(ranks, ewd("src") === ranks("node"))
        .selectExpr("dst AS node", "rank div __deg AS __c")
        .groupBy("node").agg(sum(col("__c")).as("__in"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(n))
        .selectExpr("node",
          s"($base) + ($dampNum * coalesce(__in, 0L)) div $dampDen AS rank")
    }
    ranks
  }

  /** q131/q143's synthetic link graph (copy of TextQueries' private). */
  private def linkGraph(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
    val n = docs.agg(count(lit(1)).as("__nd"))
    docs.crossJoin(broadcast(n))
      .select(col("doc_id").as("src"),
        explode(sequence(lit(0L), col("doc_id") % 3)).as("j"), col("__nd"))
      .select(col("src"),
        pmod(graft.functions.Stable.seededHash(19, col("src"), col("j")),
          col("__nd")).as("dst"))
  }

  private def docsTs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(col("doc_id"), col("text"),
      TextOps.tokens(col("text")).as("ts"))

  // ---- PRF shared-scalars variant ----------------------------------

  private def ilog2(c: Column): Column = (length(bin(c)) - 1).cast("bigint")

  private def bm25QueriesDf(spark: SparkSession,
      queries: Seq[(Long, Seq[String])]): (DataFrame, Seq[String]) = {
    import spark.implicits._
    (queries.flatMap { case (qid, ts) => ts.distinct.map(tm => (qid, tm)) }
      .toDF("query_id", "term"),
      queries.flatMap(_._2).distinct)
  }

  private def bm25ScoreLocal(tf: DataFrame, scalars: DataFrame, qterms: DataFrame,
      idCol: String, k: Int, scale: Long): DataFrame = {
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    val scalars1 = scalars.agg(max(col("__n")).as("__n"), max(col("__t")).as("__t"))
    tf.join(dfreq, Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(scalars1))
      .withColumn("__adl", expr("__t div __n"))
      .withColumn("__idf", ilog2(col("__n")) - ilog2(col("__df")))
      .withColumn("__sc", expr(
        s"(__idf * 22 * tf * __adl * $scale) div (10 * tf * __adl + 3 * __adl + 9 * __dl)"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("__sc")).as("__s"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopK.topK(k)(
        col("__s").cast("double"), col(idCol).cast("bigint")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), (col("pos") + 1).cast("bigint").as("rank"),
        col("e._2").as(idCol), col("e._1").cast("bigint").as("score_q"))
  }

  private def bm25TopKShared(docs: DataFrame, scalars: DataFrame,
      idCol: String, toksCol: String, queries: Seq[(Long, Seq[String])],
      k: Int, scale: Long): DataFrame = {
    val (qterms, termSet) = bm25QueriesDf(docs.sparkSession, queries)
    val tf = docs
      .select(col(idCol), size(col(toksCol)).cast("bigint").as("__dl"),
        explode(col(toksCol)).as("term"))
      .filter(col("term").isin(termSet: _*))
      .groupBy(col(idCol), col("__dl"), col("term")).agg(count(lit(1)).as("tf"))
    bm25ScoreLocal(tf, scalars, qterms, idCol, k, scale)
  }

  /** OLD (pre-r15) PRF: corpus scalars recomputed by every stage. */
  def prfOld(docs: DataFrame, idCol: String, toksCol: String,
      queries: Seq[(Long, Seq[String])], k: Int = 10, fbDocs: Int = 3,
      fbTerms: Int = 2, scale: Long = 10000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def scalarsOf() = docs.agg(
      coalesce(sum(when(size(col(toksCol)) > 0, 1L).otherwise(0L)), lit(0L)).as("__n"),
      coalesce(sum(size(col(toksCol)).cast("bigint")), lit(0L)).as("__t"))
    val round1 = bm25TopKShared(docs, scalarsOf(), idCol, toksCol, queries, fbDocs, scale)
    val fbPairs = round1.select(col("query_id"), col(idCol).as("__fbid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val fbIds = fbPairs.map(_._2).distinct.toSeq
    val fbDf = fbPairs.toSeq.toDF("query_id", "__fbid")
    val tfFb = docs.select(col(idCol), explode(col(toksCol)).as("term"))
      .filter(col(idCol).isin(fbIds: _*))
      .join(broadcast(fbDf), col(idCol) === col("__fbid"))
      .groupBy(col("query_id"), col("term")).agg(count(lit(1)).as("__tf"))
    val dfAll = docs.select(col(idCol), explode(col(toksCol)).as("term"))
      .distinct()
      .groupBy("term").agg(count(lit(1)).as("__df"))
    val n = docs.agg(coalesce(sum(when(size(col(toksCol)) > 0, 1L)
      .otherwise(0L)), lit(0L)).as("__n"))
    val orig = queries.flatMap { case (q, ts) => ts.distinct.map(t => (q, t)) }
      .toDF("query_id", "term").withColumn("__orig", lit(1))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("__sc").desc, col("term").asc)
    val expansion = tfFb.join(dfAll, Seq("term"))
      .crossJoin(broadcast(n))
      .join(broadcast(orig), Seq("query_id", "term"), "left")
      .filter(col("__orig").isNull)
      .withColumn("__sc", col("__tf") * (ilog2(col("__n")) - ilog2(col("__df"))))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= fbTerms)
      .select("query_id", "term")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expByQ = expansion.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val expanded = queries.map { case (q, ts) =>
      q -> (ts ++ expByQ.getOrElse(q, Nil)).distinct }
    bm25TopKShared(docs, scalarsOf(), idCol, toksCol, expanded, k, scale)
  }

  /** kCore with checkpoint every SECOND peeling round. */
  def kCoreCk2(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 8): DataFrame = {
    var und = edges.filter(col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct().localCheckpoint()
    var round = 0
    var done = false
    var last = und
    while (!done) {
      val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("d"))
      val weak = deg.filter(col("d") < k).select("node").localCheckpoint()
      if (weak.isEmpty) done = true
      else {
        round += 1
        if (round > maxRounds) throw new IllegalStateException("no fixed point")
        var next = und
          .join(weak.select(col("node").as("a")), Seq("a"), "left_anti")
          .join(weak.select(col("node").as("b")), Seq("b"), "left_anti")
        if (round % 2 == 0) {
          next = next.localCheckpoint()
          last.unpersist(); last = next
        }
        und = next
      }
    }
    und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("core_degree"))
  }

  /** distinctiveTerms with the (group, term) count frame and the per-term
    * totals persisted (each has 3 plan consumers). */
  def distinctiveTermsCached(docs: DataFrame, groupCol: String, toksCol: String,
      k: Int = 3): DataFrame = {
    val ilog2 = (c: Column) => (length(bin(c)) - 1).cast("bigint")
    val cg = docs.select(col(groupCol).as("__g"), explode(col(toksCol)).as("term"))
      .groupBy("__g", "term").agg(count(lit(1)).as("__cg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ct = cg.groupBy("term").agg(sum(col("__cg")).as("__ct"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tg = cg.groupBy("__g").agg(sum(col("__cg")).as("__tg"))
    val tot = ct.agg(count(lit(1)).as("__v"),
      coalesce(sum(col("__ct")), lit(0L)).as("__tt"))
    val scored = cg.join(ct, Seq("term"))
      .join(broadcast(tg), Seq("__g"))
      .crossJoin(broadcast(tot))
      .select(col("__g"), col("term"),
        (ilog2(col("__cg") + 1) - ilog2(col("__ct") - col("__cg") + 1)
          + ilog2(col("__tt") - col("__tg") + col("__v"))
          - ilog2(col("__tg") + col("__v"))).as("w"))
    val termRank = graft.sources.PrefixSum.withPrefixSum(
        ct.withColumn("__one", lit(1L)), Seq(col("term").asc),
        "__one", "__trb")
      .select(col("term"), (col("__trb") + 1L).as("__tr"))
    scored.join(termRank, Seq("term"))
      .groupBy(col("__g"))
      .agg(graft.functions.TopK.topK(k)(
        col("w").cast("double"), col("__tr")).as("__top"))
      .select(col("__g"), posexplode(col("__top")).as(Seq("__p", "__e")))
      .select(col("__g"), (col("__p") + 1).cast("bigint").as("rank"),
        col("__e").getField("_2").as("__tr"),
        col("__e").getField("_1").cast("bigint").as("w"))
      .join(termRank, Seq("__tr"))
      .select(col("__g").as(groupCol), col("rank"), col("term"), col("w"))
  }

  // ---- main ---------------------------------------------------------

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def calib(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 200000000L, 1, 8)
        .selectExpr("xxhash64(id) & 255 AS h")
        .agg(sum("h")).collect()
      (System.nanoTime() - t0) / 1e9
    }

    val variants: Seq[(String, () => DataFrame)] = mode match {
      case "spans" => Seq(
        "two_pass" -> (() => TextOps.dedupSpans(
          Tables.load(spark, sfDir, "documents")
            .select(col("doc_id"), TextOps.tokens(col("text")).as("ts")),
          "doc_id", "ts", k = 20)),
        "window" -> (() => dedupSpansWin(
          Tables.load(spark, sfDir, "documents")
            .select(col("doc_id"), TextOps.tokens(col("text")).as("ts")),
          "doc_id", "ts", k = 20)),
        "persist" -> (() => dedupSpansPersist(
          Tables.load(spark, sfDir, "documents")
            .select(col("doc_id"), TextOps.tokens(col("text")).as("ts")),
          "doc_id", "ts", k = 20)))
      case "pr" => Seq(
        "old_join" -> (() => {
          val ranks = pageRankOld(linkGraph(spark, sfDir), "src", "dst",
            iters = 5).persist()
          graft.operators.Graphs.rankWeightedSample(ranks, "node", "rank", seed = 23)
        }),
        "union_zero" -> (() => {
          val ranks = graft.operators.Graphs.pageRank(linkGraph(spark, sfDir),
            "src", "dst", iters = 5).persist()
          graft.operators.Graphs.rankWeightedSample(ranks, "node", "rank", seed = 23)
        }))
      case "enc" => Seq(
        "persist" -> (() => SparkEntry.queries("q230_ivfpq_recall")(spark, sfDir)),
        "lazy" -> (() => {
          val emb = Tables.load(spark, sfDir, "embeddings")
          val qs = emb.filter(col("vec_id") < 50)
          val ex = graft.ann.Ann.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 5)
          val (encL, cents, cbs) = graft.ann.Ann.ivfPqEncode(emb, "vec_id",
            "embedding", seed = 42, nCentroids = 16, m = 4, ksub = 16, iters = 1)
          def tier(nProbe: Int) =
            graft.ann.Ann.pqProbe(encL, cents, cbs, qs, "vec_id", "embedding",
              k = 5, nProbe = nProbe, oversample = 20, rerankCorpus = Some(emb),
              broadcastProbe = true)
          graft.ann.Ann.recallReport(ex, Seq(
            "ivfpq_p2" -> tier(2), "ivfpq_p4" -> tier(4), "ivfpq_p8" -> tier(8)))
        }))
      case "prf" => Seq(
        "old_3pass" -> (() => prfOld(docsTs(spark, sfDir), "doc_id", "ts",
          Seq(1L -> Seq("hash", "join", "table"),
            2L -> Seq("window", "stream", "batch"),
            3L -> Seq("spark", "nosuchterm")), k = 10, fbDocs = 3, fbTerms = 2)),
        "shared" -> (() => TextOps.bm25PseudoFeedback(docsTs(spark, sfDir),
          "doc_id", "ts",
          Seq(1L -> Seq("hash", "join", "table"),
            2L -> Seq("window", "stream", "batch"),
            3L -> Seq("spark", "nosuchterm")), k = 10, fbDocs = 3, fbTerms = 2)))
      case "kcore" => Seq(
        "ck_every" -> (() => graft.operators.Graphs.kCore(
          linkGraph(spark, sfDir), "src", "dst", k = 2)),
        "ck_two" -> (() => kCoreCk2(
          linkGraph(spark, sfDir), "src", "dst", k = 2)))
      case "floor" => Seq(
        "aqe_on" -> (() => {
          spark.conf.set("spark.sql.adaptive.enabled", "true")
          SparkEntry.queries("q7_setops")(spark, sfDir)
        }),
        "aqe_off" -> (() => {
          spark.conf.set("spark.sql.adaptive.enabled", "false")
          SparkEntry.queries("q7_setops")(spark, sfDir)
        }))
      case "dt" => Seq(
        "uncached" -> (() => TextOps.distinctiveTerms(
          Tables.load(spark, sfDir, "documents").select(col("source"),
            TextOps.tokens(col("text")).as("ts")), "source", "ts", k = 3)),
        "cached" -> (() => distinctiveTermsCached(
          Tables.load(spark, sfDir, "documents").select(col("source"),
            TextOps.tokens(col("text")).as("ts")), "source", "ts", k = 3)))
      case "floor2" => Seq.empty
      case other => sys.error(s"unknown mode $other")
    }

    if (mode == "floor2") {
      // Phase breakdown for representative sub-second queries: construct
      // (DataFrame build incl. any eager actions), plan (executedPlan
      // forced), execute (noop write). Two passes; second is warm.
      val qs = sys.env.get("SCRATCH_QS").map(_.split(',').toSeq).getOrElse(
        Seq("q7_setops", "q6_window_rank", "q1_agg", "q12_having",
          "q146_id_gaps", "q64_mix_domains", "q81_mix_temperature"))
      for (pass <- 1 to 3; qn <- qs) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(qn)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        runFull(df)
        val t3 = System.nanoTime()
        println(f"SCRATCH floor2 pass=$pass $qn construct=${(t1-t0)/1e9}%.3f plan=${(t2-t1)/1e9}%.3f exec=${(t3-t2)/1e9}%.3f")
      }
      spark.stop(); return
    }
    // warm-up once per variant
    variants.foreach { case (n, f) =>
      spark.catalog.clearCache()
      val s = time(f())
      System.err.println(f"SCRATCH warmup $n $s%.3f")
    }
    val acc = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (r <- 1 to rounds) {
      val c = calib()
      variants.foreach { case (n, f) =>
        spark.catalog.clearCache()
        val s = time(f())
        acc(n) = acc(n) :+ s
        println(f"SCRATCH round=$r calib=$c%.3f $n $s%.3f")
      }
    }
    variants.foreach { case (n, _) =>
      val xs = acc(n)
      println(f"SCRATCH SUMMARY $n min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f all=${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    if (mode == "floor") spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
