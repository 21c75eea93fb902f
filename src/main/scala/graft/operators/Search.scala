package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Top-k cosine search — the reference's flagship query
  * (Q1: src/core/qdrant_client.py:311-405) and its derivatives: filtered
  * search (Q3/Q5/Q6), batched multi-query search, multi-vector score fusion
  * (Q8: src/core/advanced_indexing.py:280-348), and the face `verify` /
  * `detect` semantics spec'd in api_spec.md:452-528 (Q11).
  *
  * Determinism invariant (oracle parity, SURVEY.md §7.4): scores are rounded
  * to 6 decimals ONCE right after the dot product; every threshold filter,
  * ordering, ranking and limit operates on the rounded score with `id` as the
  * unique tiebreak. This makes top-k boundaries identical across engines
  * regardless of ulp-level float accumulation differences.
  *
  * Physical shape (exact path): payload predicates are plain filters that
  * Catalyst pushes into the parquet scan; the tiny query side is broadcast so
  * scoring is a map-only stage (no shuffle); `orderBy(desc).limit(k)` plans as
  * `TakeOrderedAndProject` — per-partition top-k then a single driver merge,
  * which is the aggregation tree one wants on a 1000-executor scan. Batched
  * queries score all (query × candidate) pairs map-side and take per-query
  * top-k with one hash-partition shuffle on `query_id`.
  */
object Search {

  /** Rounded cosine score of a normalized candidate vs normalized query. */
  private def score(emb: Column, qemb: Column): Column =
    round(VectorOps.dot(emb, qemb), 6)

  /** Single-query exact top-k cosine search over a collection with normalized
    * `embedding`. `queryDf` must have one row with a normalized `qemb` column.
    * Pre-filters (payload predicates) are applied BEFORE scoring — the
    * analogue of Qdrant's filtered HNSW traversal
    * (src/core/qdrant_client.py:354-374). */
  def knn(
      points: DataFrame,
      queryDf: DataFrame,
      k: Int,
      threshold: Double,
      preFilter: Option[Column] = None,
      projectExtra: Seq[String] = Nil): DataFrame = {
    val filtered = preFilter.map(points.filter).getOrElse(points)
    filtered
      .crossJoin(broadcast(queryDf.select(col("qemb"))))
      .withColumn("score", score(col("embedding"), col("qemb")))
      .filter(col("score") >= threshold)
      .orderBy(desc("score"), asc("id"))
      .limit(k)
      .select((Seq("id", "score", "user_id") ++ projectExtra).map(col): _*)
  }

  /** Per-request serving form of [[knn]]: the single query vector inlined
    * as a LITERAL into the scoring expression — no query-side frame (no
    * per-request reflection encoder), no broadcast exchange, ONE
    * single-stage job per request. Identical results to [[knn]] (same
    * scoring expression, 6dp rounding, score-desc/id-asc tie-break, same
    * pre-filter placement); the literal only changes plan VALUES, not
    * shape, so whole-stage codegen cache-hits across requests
    * (literals land in the references array, not the generated source).
    * Measured ~2× the one-job-per-query throughput of the broadcast form
    * (PLANS_r12 — per-request root-cause); the remaining bound is the
    * single-threaded DAGScheduler dispatch ceiling (~340 bare jobs/s on
    * this box), which no one-job-per-query tier can exceed — the reason
    * the batched/replica tiers exist. */
  def knnDirect(
      points: DataFrame,
      qemb: Seq[Double],
      k: Int,
      threshold: Double,
      preFilter: Option[Column] = None): DataFrame = {
    val filtered = preFilter.map(points.filter).getOrElse(points)
    filtered
      .withColumn("score", score(col("embedding"), typedLit(qemb)))
      .filter(col("score") >= threshold)
      .orderBy(desc("score"), asc("id"))
      .limit(k)
      .select("id", "score", "user_id")
  }

  /** PREPARED-STATEMENT form of [[knnDirect]] (VERDICT r12 #6): the
    * physical plan is built and planned ONCE around a mutable
    * [[graft.plans.QueryVectorSlot]]; each request sets the slot and
    * re-executes the SAME `SparkPlan` object — no per-request analysis,
    * optimization, planning or codegen lookup, just one job. Semantics
    * are identical to [[knnDirect]] (same scoring expression, 6dp
    * rounding, threshold placement, score-desc/id-asc tie-break,
    * TakeOrderedAndProject physical shape) — PreparedKnnSpec pins
    * result equality against [[knnDirect]] across slot reuse.
    *
    * NOT thread-safe per statement (the slot is a single mutable cell;
    * a concurrent set() between another thread's set() and submit would
    * cross queries): serving callers keep one statement per worker
    * thread, which also gives each thread its own plan object. The
    * remaining per-request cost is the DAGScheduler dispatch floor —
    * the measured JVM-wide one-job-per-query ceiling. */
  final class PreparedKnn(points: DataFrame, k: Int, threshold: Double) {
    private val slot = new graft.plans.QueryVectorSlot
    private val df = points
      .withColumn("score",
        score(col("embedding"), graft.plans.Prepared.queryVector(slot)))
      .filter(col("score") >= threshold)
      .orderBy(desc("score"), asc("id"))
      .limit(k)
      .select("id", "score", "user_id")
    // force the one-time Catalyst pass at construction; the direct plan
    // has no exchanges, so AQE never wraps it and the physical plan is
    // final here
    private val plan = {
      val qe = df.queryExecution
      qe.executedPlan
    }
    /** One request: (id, score, user_id) rows in (score desc, id asc)
      * order — the same rows `knnDirect(...).collect()` returns. */
    def search(q: Array[Double]): Array[(Long, Double, Int)] = {
      slot.set(q)
      plan.executeCollect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getInt(2)))
    }
  }

  /** Batched exact top-k: one row per (query_id, hit), per-query rank <= k.
    * `queries` has columns (query_id, qemb[normalized]). The query side is
    * broadcast; the per-query top-k is a single shuffle on query_id. */
  def knnBatch(
      points: DataFrame,
      queries: DataFrame,
      k: Int,
      threshold: Double): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("id"))
    points
      .crossJoin(broadcast(queries.select(col("query_id"), col("qemb"))))
      .withColumn("score", score(col("embedding"), col("qemb")))
      .filter(col("score") >= threshold)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id"), col("score"), col("rank"), col("user_id"))
  }

  /** Multi-vector fusion search (Q8: src/core/advanced_indexing.py:280-348):
    * N weighted queries, each searched top-(2k); per-hit score *= weight;
    * fuse per point id by (sum of weighted scores, vote count); final order
    * by (fused score desc, votes desc), limit k.
    * One broadcast scoring stage + one hash aggregate on `id`. */
  def multiVectorFusion(
      points: DataFrame,
      queries: DataFrame, // (query_id, qemb, weight)
      k: Int,
      threshold: Double): DataFrame = {
    val perQueryK = k * 2 // reference oversamples each branch at limit=k*2 (:305)
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("id"))
    points
      .crossJoin(broadcast(queries.select(col("query_id"), col("qemb"), col("weight"))))
      .withColumn("score", score(col("embedding"), col("qemb")))
      .filter(col("score") >= threshold)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= perQueryK)
      .groupBy(col("id"))
      .agg(
        round(sum(col("score") * col("weight")), 6).as("fused_score"),
        count("*").cast("long").as("votes"))
      .orderBy(desc("fused_score"), desc("votes"), asc("id"))
      .limit(k)
  }

  /** Face `verify` (api_spec.md:739-762): top-1 search restricted to one
    * user; verified iff best score >= threshold. Returns a single row
    * (user_id, best_score, verified). */
  def verify(
      points: DataFrame,
      queryDf: DataFrame,
      userId: Column,
      threshold: Double): DataFrame = {
    points.filter(col("user_id") === userId)
      .crossJoin(broadcast(queryDf.select(col("qemb"))))
      .withColumn("score", score(col("embedding"), col("qemb")))
      .groupBy(col("user_id"))
      .agg(max(col("score")).as("best_score"))
      .withColumn("verified", (col("best_score") >= threshold).cast("int"))
  }

  /** Face `detect`/identify (api_spec.md:764-801): top-k search, candidates
    * grouped per user, users ranked by their best hit. */
  def detect(
      points: DataFrame,
      queryDf: DataFrame,
      k: Int,
      threshold: Double): DataFrame = {
    points
      .crossJoin(broadcast(queryDf.select(col("qemb"))))
      .withColumn("score", score(col("embedding"), col("qemb")))
      .filter(col("score") >= threshold)
      .groupBy(col("user_id"))
      .agg(max(col("score")).as("best_score"),
        count("*").cast("long").as("n_hits"))
      .orderBy(desc("best_score"), asc("user_id"))
      .limit(k)
  }

  /** Reciprocal-rank fusion of multiple query branches: each branch ranks
    * its top `perQueryK`, fused score = Σ 1/(rrfK + rank) per point — the
    * standard rank-based alternative to score-weighted fusion (less
    * sensitive to score calibration across branches). */
  def rrfFusion(
      points: DataFrame,
      queries: DataFrame, // (query_id, qemb)
      k: Int,
      perQueryK: Int = 20,
      rrfK: Int = 60): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("id"))
    points
      .crossJoin(broadcast(queries.select(col("query_id"), col("qemb"))))
      .withColumn("score", score(col("embedding"), col("qemb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= perQueryK)
      .groupBy(col("id"))
      .agg(round(sum(lit(1.0d) / (lit(rrfK.toDouble) + col("rank"))), 6).as("rrf_score"),
        count("*").cast("long").as("branches"))
      .orderBy(desc("rrf_score"), desc("branches"), asc("id"))
      .limit(k)
  }

  /** Rank-level fusion of heterogeneous PRE-RANKED branches — the hybrid
    * text+vector pattern of the public vector-DB query APIs (lexical BM25
    * branch and embedding branch each produce (id, rank); RRF makes their
    * scores commensurable where raw score scales are not). Each input
    * carries (id, rank in 1..branchK). Determinism: the fused sum is an
    * ORDERED fold — per-branch ranks are collected into a branch-index-
    * sorted array and reduced left-to-right (a hash-aggregate SUM of
    * doubles associates nondeterministically once there are ≥3 branches;
    * for 2 branches the fold computes the identical IEEE value, so hashes
    * are unchanged). The array is ≤branches.size entries: bounded. Rounded
    * 6dp, ties by branch count then id. */
  def rrfCombine(branches: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(branches.nonEmpty, "rrfCombine needs at least one branch")
    val tagged = branches.zipWithIndex.map { case (b, i) =>
      b.select(col("id"), col("rank").cast("long").as("rank"),
        lit(i).as("bix"))
    }.reduce(_ unionAll _)
    tagged.groupBy("id")
      .agg(
        round(aggregate(
          expr("transform(array_sort(collect_list(struct(bix, rank))), s -> s.rank)"),
          lit(0.0d),
          (acc, r) => acc + lit(1.0d) / (lit(rrfK.toDouble) + r)), 6)
          .as("rrf_score"),
        count("*").cast("long").as("branches"))
      .orderBy(desc("rrf_score"), desc("branches"), asc("id"))
      .limit(k)
  }

  /** Distance matrix (the public vector-DB "search matrix" API): pairwise
    * cosine among a BOUNDED deterministic sample of the (optionally
    * filtered) collection — lowest `sampleLimit` ids, the reproducible
    * stand-in for the API's random sample — returning each sampled point's
    * `matK` nearest sampled neighbors. The pairwise product is bounded by
    * the API contract (sampleLimit² pairs, broadcast one side), never
    * corpus-shaped; corpus-wide all-pairs is [[graft.operators.Ann.knnJoin]]'s
    * job. */
  def searchMatrix(
      points: DataFrame,
      sampleLimit: Int,
      matK: Int,
      preFilter: Option[Column] = None): DataFrame = {
    val sample = preFilter.map(points.filter).getOrElse(points)
      .orderBy(asc("id")).limit(sampleLimit)
      .select(col("id"), col("embedding"))
    val a = sample.select(col("id").as("id_a"), col("embedding").as("ea"))
    val b = sample.select(col("id").as("id_b"), col("embedding").as("eb"))
    val w = Window.partitionBy("id_a").orderBy(desc("score"), asc("id_b"))
    a.crossJoin(broadcast(b))
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("score", score(col("ea"), col("eb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= matK)
      .select(col("id_a"), col("id_b"), col("score"), col("rank"))
      .orderBy(col("id_a"), col("rank"))
  }

  /** Hybrid search: cosine relevance blended with a structured payload
    * boost — score = α·cos + (1-α)·boost where boost = 1 if the payload
    * predicate holds. The vector-DB "filtered boost" pattern (soft filter
    * instead of the hard Q3 pre-filter). */
  def hybrid(
      points: DataFrame,
      queryDf: DataFrame,
      boostPred: Column,
      alpha: Double,
      k: Int): DataFrame =
    points
      .crossJoin(broadcast(queryDf.select(col("qemb"))))
      .withColumn("cos", score(col("embedding"), col("qemb")))
      .withColumn("boost", when(boostPred, 1.0d).otherwise(0.0d))
      .withColumn("hybrid_score",
        round(col("cos") * alpha + col("boost") * (lit(1.0d) - alpha), 6))
      .orderBy(desc("hybrid_score"), asc("id"))
      .limit(k)
      .select(col("id"), col("hybrid_score"), col("cos"), col("user_id"))

  /** Recommendation search: the query vector is built FROM the collection —
    * normalize(mean(positive examples) − mean(negative examples)) — and the
    * seed points are excluded from the results (the vector-DB "recommend"
    * API pattern; the reference exposes only raw-vector search, so the
    * combination rule here is the engine's own documented contract).
    *
    * Determinism: per-dimension means are rounded to 6 decimals before the
    * difference, and the assembled vector is normalized with the same
    * left-to-right kernel as ingest, so both engines score an identical
    * query vector.
    *
    * Physical shape: the seed scan is a pushed IN-filter; the per-dim mean
    * is a posexplode + 2-level hash agg on at most `dim` keys; the resulting
    * ONE-row query frame is broadcast into the same map-only scoring stage
    * as knn. Seeds scale as O(dim), never with collection size. */
  def recommend(
      points: DataFrame,
      positiveIds: Seq[Long],
      negativeIds: Seq[Long],
      k: Int,
      threshold: Double): DataFrame = {
    require(positiveIds.nonEmpty, "recommend requires at least one positive id")
    def dimMeans(ids: Seq[Long], name: String): DataFrame =
      points.filter(col("id").isin(ids: _*))
        .select(posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("dim")
        .agg(round(avg("v"), 6).as(name))
    val pos = dimMeans(positiveIds, "pm")
    val combined =
      if (negativeIds.isEmpty) pos.withColumn("rv", col("pm"))
      else pos.join(dimMeans(negativeIds, "nm"), Seq("dim"))
        .withColumn("rv", col("pm") - col("nm"))
    // fail fast (instead of scoring everything ~0 against a degenerate
    // vector) when the positive seed ids match no points: the assembled
    // pair list is empty and the query errors out.
    val qdf = combined
      .agg(sort_array(collect_list(struct(col("dim"), col("rv")))).as("pairs"))
      .select(
        when(size(col("pairs")) < 1,
          raise_error(lit("recommend: positive seed ids matched no points")))
          .otherwise(graft.plans.VectorExpressions.normalizeL2(
            expr("transform(pairs, s -> s.rv)"))).as("qemb"))
    val seeds = positiveIds ++ negativeIds
    points
      .filter(!col("id").isin(seeds: _*))
      .crossJoin(broadcast(qdf))
      .withColumn("score", score(col("embedding"), col("qemb")))
      .filter(col("score") >= threshold)
      .orderBy(desc("score"), asc("id"))
      .limit(k)
      .select(col("id"), col("score"), col("user_id"))
  }

  /** The BEST_SCORE recommend strategy — the second of the two public
    * recommend strategies (average_vector is [[recommend]]): every
    * candidate is scored against every example individually; a point
    * closer to its best positive than to its best negative keeps the best
    * positive score, otherwise it is pushed below every such point by the
    * negated best negative score. No combined query vector exists, so
    * multi-modal positive sets (two clusters of "good") are not averaged
    * into a meaningless midpoint.
    *
    * Physical shape: the example vectors are index-metadata-sized (a tiny
    * broadcast crossJoin of one assembled row); best-pos/best-neg are
    * statically unrolled `greatest(...)` chains over codegen dots — one
    * map-only projection, then the usual TakeOrderedAndProject. */
  def recommendBestScore(
      points: DataFrame,
      positiveIds: Seq[Long],
      negativeIds: Seq[Long],
      k: Int): DataFrame = {
    require(positiveIds.nonEmpty, "recommend requires at least one positive id")
    def vcol(id: Long, n: String): DataFrame =
      points.filter(col("id") === id).select(col("embedding").as(n))
    val ex = (positiveIds.zipWithIndex.map { case (id, i) => vcol(id, s"p$i") }
      ++ negativeIds.zipWithIndex.map { case (id, i) => vcol(id, s"n$i") })
      .reduce(_ crossJoin _)
    val bestPos = positiveIds.indices
      .map(i => score(col("embedding"), col(s"p$i")))
      .reduce((a, b) => greatest(a, b))
    val bestNeg =
      if (negativeIds.isEmpty) lit(-1.0d)
      else negativeIds.indices
        .map(i => score(col("embedding"), col(s"n$i")))
        .reduce((a, b) => greatest(a, b))
    val seeds = positiveIds ++ negativeIds
    points
      .filter(!col("id").isin(seeds: _*))
      .crossJoin(broadcast(ex))
      .withColumn("bp", bestPos)
      .withColumn("bn", bestNeg)
      .withColumn("score",
        when(col("bp") > col("bn"), col("bp")).otherwise(-col("bn")))
      .orderBy(desc("score"), asc("id"))
      .limit(k)
      .select(col("id"), col("score"), col("user_id"))
  }

  /** Grouped search (the vector-DB "search groups" pattern): the best
    * `groupSize` hits per group, for the `k` groups with the highest best
    * hit. Two-stage shape that avoids any global sort: (1) per-group top-n
    * via a window on the group key (one hash shuffle); (2) the top-k GROUPS
    * via groupBy(max(score)) + TakeOrderedAndProject — group count, not row
    * count, bounds stage 2 — then a broadcast semi-join keeps their rows. */
  def knnGroups(
      points: DataFrame,
      queryDf: DataFrame,
      groupCol: String,
      groupSize: Int,
      k: Int,
      threshold: Double): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(desc("score"), asc("id"))
    val scored = points
      .crossJoin(broadcast(queryDf.select(col("qemb"))))
      .withColumn("score", score(col("embedding"), col("qemb")))
      .filter(col("score") >= threshold)
      .withColumn("rank_in_group", row_number().over(w).cast("long"))
      .filter(col("rank_in_group") <= groupSize)
    val topGroups = scored
      .groupBy(col(groupCol))
      .agg(max("score").as("best_score"))
      .orderBy(desc("best_score"), asc(groupCol))
      .limit(k)
      .withColumn("group_rank",
        row_number().over(
          Window.orderBy(desc("best_score"), asc(groupCol))).cast("long"))
    scored
      .join(broadcast(topGroups), Seq(groupCol))
      .select(col("group_rank"), col(groupCol), col("best_score"),
        col("rank_in_group"), col("id"), col("score"))
      .orderBy(col("group_rank"), col("rank_in_group"))
  }

  /** Two-phase rescore mirroring quantized-search oversampling 3.0
    * (src/core/qdrant_client.py:342-348): a cheap score prunes to
    * k*oversample candidates, then exact rescoring picks the final k.
    * `scored` must carry (id, score, cheap_score, user_id). */
  def twoPhaseTopK(
      scored: DataFrame,
      k: Int,
      oversample: Double = 3.0): DataFrame = {
    val fetchK = math.max(k, (k * oversample).toInt)
    scored
      .orderBy(desc("cheap_score"), asc("id")).limit(fetchK)
      .orderBy(desc("score"), asc("id")).limit(k)
      .select(col("id"), col("score"), col("user_id"))
  }

  /** Contrastive-pair mining — the retrieval-training-data primitive
    * (anchor, positive, negative) triplets: for each anchor (ids <
    * `nAnchors`), positive = its exact nearest non-self neighbor with
    * cosine >= `posThreshold`; negative = a DETERMINISTIC pseudo-random
    * point among those with cosine < `negThreshold` (argmin of the salted
    * per-(anchor, candidate) hash — reproducible across runs/engines,
    * unlike rand()-based negative sampling, and auditable after the
    * fact). Anchors with no qualifying positive drop out; every surviving
    * anchor gets exactly one (positive, negative) pair.
    *
    * Scale shape: one broadcast of the anchor set, scoring map-side, two
    * windows on the anchor key (bounded by nAnchors·|corpus| candidate
    * rows — at 100 TB swap the exact positive stage for [[Ann.knnJoin]]'s
    * cell-candidate generation and keep the same mining semantics; the
    * hash-argmin negative needs no change, sampling is cheap). */
  def contrastivePairs(
      points: DataFrame, nAnchors: Int,
      posThreshold: Double, negThreshold: Double,
      salt: String): DataFrame = {
    val anchors = points.filter(col("id") < nAnchors)
      .select(col("id").as("qid"), col("embedding").as("qemb"))
    val cand = points.select(col("id"), col("embedding"))
      .join(broadcast(anchors), col("id") =!= col("qid"))
      .withColumn("score", score(col("embedding"), col("qemb")))
    val wPos = Window.partitionBy("qid").orderBy(desc("score"), asc("id"))
    val pos = cand.filter(col("score") >= posThreshold)
      .withColumn("rn", row_number().over(wPos)).filter(col("rn") === 1)
      .select(col("qid"), col("id").as("pos_id"), col("score").as("pos_score"))
    val wNeg = Window.partitionBy("qid").orderBy(asc("h"), asc("id"))
    val neg = cand.filter(col("score") < negThreshold)
      .withColumn("h", graft.functions.TextOps.hash60(
        concat(lit(salt + "_"), col("qid").cast("string"),
          lit("_"), col("id").cast("string"))))
      .withColumn("rn", row_number().over(wNeg)).filter(col("rn") === 1)
      .select(col("qid"), col("id").as("neg_id"), col("score").as("neg_score"))
    pos.join(neg, Seq("qid"))
      .select(col("qid"), col("pos_id"), col("pos_score"),
        col("neg_id"), col("neg_score"))
      .orderBy("qid")
  }

  /** ANN-scale contrastive mining — the documented 100 TB swap of
    * [[contrastivePairs]] made concrete. Two changes, same
    * (anchor, positive, negative) contract:
    *  - the POSITIVE stage scores only IVF cell candidates (each anchor
    *    probes its `nprobe` nearest cells, candidates are those cells'
    *    points — the [[Ann.knnJoin]] candidate shape), so its window
    *    input is nprobe·N/C per anchor instead of N;
    *  - the NEGATIVE stage draws from a hash-sampled slice of the
    *    candidate grid (`pmod(h, negSampleInv) = 0`, where `h` is the
    *    SAME salted hash the argmin orders by): negatives don't need to
    *    be nearest anything, only reproducible, so a 1/negSampleInv
    *    sample preserves the contract while cutting the window input by
    *    that factor.
    * Anchors whose probed cells hold no qualifying positive drop out —
    * the ANN trade, bounded by the probe analysis like any IVF search. */
  def contrastivePairsAnn(
      points: DataFrame, centroids: DataFrame, nAnchors: Int,
      posThreshold: Double, negThreshold: Double, salt: String,
      nprobe: Int = 2, negSampleInv: Long = 4L): DataFrame = {
    val rows = centroids.select(col("cid"), col("ce")).orderBy("cid").collect()
    val cids = rows.map(_.getLong(0)).toSeq
    val cents = rows.map(_.getSeq[Double](1)).toSeq
    val assigned = Ann.ivfAssign(points, cids, cents)
      .select(col("cid"), col("id"), col("embedding"))
    val anchors = points.filter(col("id") < nAnchors)
      .select(col("id").as("qid"), col("embedding").as("qemb"))
    val probes = anchors.withColumn("cid", explode(
      graft.plans.VectorExpressions.topCentroids(col("qemb"), cids, cents, nprobe)))
    val posCand = assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .withColumn("score", score(col("embedding"), col("qemb")))
    val wPos = Window.partitionBy("qid").orderBy(desc("score"), asc("id"))
    val pos = posCand.filter(col("score") >= posThreshold)
      .withColumn("rn", row_number().over(wPos)).filter(col("rn") === 1)
      .select(col("qid"), col("id").as("pos_id"), col("score").as("pos_score"))
    val wNeg = Window.partitionBy("qid").orderBy(asc("h"), asc("id"))
    val neg = points.select(col("id"), col("embedding"))
      .join(broadcast(anchors), col("id") =!= col("qid"))
      .withColumn("h", graft.functions.TextOps.hash60(
        concat(lit(salt + "_"), col("qid").cast("string"),
          lit("_"), col("id").cast("string"))))
      .filter(pmod(col("h"), lit(negSampleInv)) === 0)
      .withColumn("score", score(col("embedding"), col("qemb")))
      .filter(col("score") < negThreshold)
      .withColumn("rn", row_number().over(wNeg)).filter(col("rn") === 1)
      .select(col("qid"), col("id").as("neg_id"), col("score").as("neg_score"))
    pos.join(neg, Seq("qid"))
      .select(col("qid"), col("pos_id"), col("pos_score"),
        col("neg_id"), col("neg_score"))
      .orderBy("qid")
  }

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein '98, public):
    * diversify a top-`candK` candidate set by greedily picking
    * argmax λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s), k times. The
    * vector-DB answer to "my top-10 are ten near-duplicates".
    *
    * MMR is sequential BY DEFINITION (each pick changes the next
    * objective), so the engine shape is: distributed exact top-candK
    * (TakeOrderedAndProject over the full collection — the scalable part),
    * then the O(k·candK) greedy loop as ONE executor task over the bounded
    * candidate partition (API contract: candK ≤ a few hundred). No driver
    * collect; the loop's input never scales with the corpus.
    *
    * Determinism: rel and pairwise sims are 6dp-rounded on computation
    * (same BigDecimal HALF_UP as the `round` expression); each step's
    * objective is `λ·rel − (1−λ)·maxSim` rounded 6dp with id tiebreak —
    * reproducible by the oracle's recursive CTE. */
  def mmrRerank(
      points: DataFrame,
      queryDf: DataFrame,
      k: Int,
      candK: Int = 20,
      lambdaRel: Double = 0.7): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    def r6(x: Double): Double = graft.plans.Num.round6(x)
    val cand = points
      .crossJoin(broadcast(queryDf.select(col("qemb"))))
      .withColumn("rel", score(col("embedding"), col("qemb")))
      .orderBy(desc("rel"), asc("id")).limit(candK)
      .select(col("id"), col("rel"), col("embedding"))
      .as[(Long, Double, Seq[Double])]
    val picked = cand.coalesce(1).mapPartitions { rows =>
      val cs = rows.toArray.sortBy(_._1) // id-ascending scan order
      val emb = cs.map(_._3.toArray)
      def sim(i: Int, j: Int): Double = {
        var s = 0.0d; var d = 0
        while (d < emb(i).length) { s += emb(i)(d) * emb(j)(d); d += 1 }
        r6(s)
      }
      val n = cs.length
      val taken = new Array[Boolean](n)
      val out = Seq.newBuilder[(Long, Long, Double)]
      var step = 1
      while (step <= math.min(k, n)) {
        var best = -1; var bestScore = Double.NegativeInfinity
        var i = 0
        while (i < n) {
          if (!taken(i)) {
            val objective =
              if (step == 1) cs(i)._2
              else {
                var pen = Double.NegativeInfinity
                var j = 0
                while (j < n) {
                  if (taken(j)) { val s = sim(i, j); if (s > pen) pen = s }
                  j += 1
                }
                r6(lambdaRel * cs(i)._2 - (1.0d - lambdaRel) * pen)
              }
            // ids ascend within cs, so strict > keeps the lowest id on ties
            if (objective > bestScore) { best = i; bestScore = objective }
          }
          i += 1
        }
        taken(best) = true
        out += ((step.toLong, cs(best)._1, bestScore))
        step += 1
      }
      out.result().iterator
    }
    picked.toDF("step", "id", "mmr_score").orderBy("step")
  }

  /** Top-k by EUCLIDEAN distance over RAW (un-normalized) vectors. The
    * reference's collection is cosine-only, but the vector-DB distance
    * surface it configures (Qdrant `Distance`, src/core/qdrant_client.py:105)
    * publicly offers Euclid and Dot as peers — this is the Euclid member.
    *
    * Cross-engine determinism: the distance is computed via the three-dot
    * identity ‖a−b‖² = (a·a + b·b) − 2·a·b — each dot is the same
    * left-to-right kernel both engines already share, and the three doubles
    * combine in one fixed shape, so the 6dp-rounded distance is identical
    * across engines (a zip-subtract-square fold would associate additions
    * differently than any SQL formulation).
    *
    * Physical shape: identical to [[knn]] — broadcast query, map-only
    * scoring, TakeOrderedAndProject (ascending). */
  def nearestEuclid(
      raw: DataFrame,
      queryDf: DataFrame,
      k: Int,
      projectExtra: Seq[String] = Nil): DataFrame = {
    val d2 = (VectorOps.normSq(col("embedding")) + VectorOps.normSq(col("qemb"))) -
      lit(2.0d) * VectorOps.dot(col("embedding"), col("qemb"))
    raw
      .crossJoin(broadcast(queryDf.select(col("qemb"))))
      .withColumn("dist", round(sqrt(greatest(d2, lit(0.0d))), 6))
      .orderBy(asc("dist"), asc("id"))
      .limit(k)
      .select((Seq("id", "dist") ++ projectExtra).map(col): _*)
  }

  /** Top-k by INNER PRODUCT over RAW (un-normalized) vectors — the Dot
    * member of the public distance surface (MIPS). On raw vectors this is
    * NOT cosine: magnitude matters, which is exactly what the metric is
    * for (e.g. popularity-scaled item embeddings). Same physical shape as
    * [[knn]]. */
  def maxInnerProduct(
      raw: DataFrame,
      queryDf: DataFrame,
      k: Int,
      projectExtra: Seq[String] = Nil): DataFrame =
    raw
      .crossJoin(broadcast(queryDf.select(col("qemb"))))
      .withColumn("score", score(col("embedding"), col("qemb")))
      .orderBy(desc("score"), asc("id"))
      .limit(k)
      .select((Seq("id", "score") ++ projectExtra).map(col): _*)

  /** Discovery search (the public vector-DB "discover" API shape): rank by
    * how many (positive, negative) context pairs a point satisfies —
    * sim(v, posᵢ) > sim(v, negᵢ) — then by similarity to the target, then
    * id. `ctxRow` is ONE row with `qemb` (target), `pos` and `neg`
    * (aligned arrays of `nPairs` context vectors); seed points are
    * excluded by the caller's preFilter.
    *
    * The pair loop is unrolled statically (nPairs is index metadata), so
    * the whole score is one flat codegen projection over a broadcast
    * context row — map-only, like every other search. */
  def discover(
      points: DataFrame,
      ctxRow: DataFrame,
      nPairs: Int,
      k: Int,
      preFilter: Option[Column] = None): DataFrame = {
    val filtered = preFilter.map(points.filter).getOrElse(points)
    val ctxScore = (0 until nPairs).map { i =>
      when(score(col("embedding"), col("pos")(i)) >
        score(col("embedding"), col("neg")(i)), 1).otherwise(0)
    }.reduce(_ + _)
    filtered
      .crossJoin(broadcast(ctxRow))
      .withColumn("ctx_score", ctxScore.cast("int"))
      .withColumn("target_score", score(col("embedding"), col("qemb")))
      .orderBy(desc("ctx_score"), desc("target_score"), asc("id"))
      .limit(k)
      .select(col("id"), col("ctx_score"), col("target_score"), col("user_id"))
  }

  /** Matryoshka two-phase search (Kusupati et al. 2022, public): phase 1
    * ranks on the dot product of the first `prefixDims` dimensions — with
    * MRL-trained embeddings the prefix is itself a valid low-d embedding —
    * keeps k·oversample candidates, phase 2 rescores with the full vector.
    *
    * At 100 TB the prefix belongs in its OWN materialized column (like the
    * indexed store's `sig`/`pq` codes) so the phase-1 scan reads
    * prefixDims/dim of the float bytes; on the fly, as here, the win is
    * compute only. The fixture's embeddings are not MRL-trained, so prefix
    * ordering is a lossy proxy — recall is governed by `oversample`
    * exactly as in the quantized paths (measured in the bench recall
    * report). */
  def matryoshkaSearch(
      points: DataFrame,
      queryDf: DataFrame,
      k: Int,
      prefixDims: Int,
      oversample: Double = 8.0): DataFrame = {
    val fetchK = math.max(k, (k * oversample).toInt)
    points
      .select(col("id"), col("embedding"), col("user_id"))
      .crossJoin(broadcast(queryDf.select(col("qemb"))))
      .withColumn("cheap_score",
        round(VectorOps.dot(slice(col("embedding"), 1, prefixDims),
          slice(col("qemb"), 1, prefixDims)), 6))
      .orderBy(desc("cheap_score"), asc("id")).limit(fetchK)
      .withColumn("score", score(col("embedding"), col("qemb")))
      .orderBy(desc("score"), asc("id"))
      .limit(k)
      .select(col("id"), col("score"), col("user_id"))
  }
}
