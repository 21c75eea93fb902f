package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.operators.{Collection, Search}

/** Behavioral specs mirroring the reference's de-facto acceptance tests
  * (scripts/simple_test.py:121-205 self-match + filtered search;
  * scripts/performance_test.py:379-394 perturbed-vector recall). */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Collection.load(spark, sf001).cache()

  test("self-match: a stored vector queried by itself ranks 1 with score 1") {
    val q = points.filter($"id" === 7).select($"embedding".as("qemb"))
    val top = Search.knn(points, q, k = 5, threshold = 0.1)
      .select("id", "score").as[(Long, Double)].collect()
    assert(top.head._1 == 7L)
    assert(math.abs(top.head._2 - 1.0) < 1e-5)
    assert(top.map(_._2).sliding(2).forall(p => p.head >= p.last), "descending scores")
  }

  test("advanced payload filters: every hit satisfies all range/IN predicates") {
    val ext = Collection.loadWithPayload(spark, sf001)
    val q = ext.filter($"id" === 0).select($"embedding".as("qemb"))
    val hits = Search.knn(ext, q, k = 10, threshold = 0.0,
      preFilter = Some($"confidence_score" >= 0.5 && $"face_quality" >= 40 &&
        $"enrollment_group".isin("grp_0", "grp_2", "grp_3") && $"ts" >= 10.0),
      projectExtra = Seq("confidence_score", "face_quality", "enrollment_group"))
      .select("confidence_score", "face_quality", "enrollment_group")
      .as[(Double, Int, String)].collect()
    assert(hits.nonEmpty)
    assert(hits.forall { case (c, f, g) =>
      c >= 0.5 && f >= 40 && Set("grp_0", "grp_2", "grp_3")(g) })
  }

  test("filtered search returns only the requested user's points") {
    val q = points.filter($"id" === 0).select($"embedding".as("qemb"))
    val users = Search.knn(points, q, k = 50, threshold = -1.0,
        preFilter = Some($"user_id" === 3))
      .select("user_id").distinct().as[Int].collect()
    assert(users.toSeq == Seq(3))
  }

  test("perturbed query at similarity ~0.9 recovers its base vector (recall)") {
    // q = normalize(0.9*base + 0.1*other) — base must come back on top at
    // threshold 0.5 (the reference's similar-search scenario)
    val base = points.filter($"id" === 11).select($"embedding".as("b"))
    val other = points.filter($"id" === 200).select($"embedding".as("o"))
    val q = base.crossJoin(other)
      .select(VectorOps.normalize(
        zip_with($"b", $"o", (x, y) => x * 0.9d + y * 0.1d)).as("qemb"))
    val top = Search.knn(points, q, k = 3, threshold = 0.5)
      .select("id", "score").as[(Long, Double)].collect()
    assert(top.head._1 == 11L)
    assert(top.head._2 > 0.9)
  }

  test("threshold monotonicity: higher threshold returns a subset") {
    val q = points.filter($"id" === 0).select($"embedding".as("qemb"))
    val lo = Search.knn(points, q, 50, 0.1).select("id").as[Long].collect().toSet
    val hi = Search.knn(points, q, 50, 0.3).select("id").as[Long].collect().toSet
    assert(hi.subsetOf(lo))
  }

  test("batch knn returns per-query ranked blocks with rank 1 = self") {
    val qs = points.filter($"id" < 4)
      .select($"id".as("query_id"), $"embedding".as("qemb"))
    val r = Search.knnBatch(points, qs, k = 3, threshold = 0.1)
      .filter($"rank" === 1)
      .select("query_id", "id").as[(Long, Long)].collect()
    assert(r.length == 4 && r.forall(p => p._1 == p._2), s"self not rank1: ${r.toSeq}")
  }

  test("verify accepts the right user and rejects at impossible threshold") {
    val q = points.filter($"id" === 5).select($"embedding".as("qemb"))
    val u5 = points.filter($"id" === 5).select("user_id").as[Int].head()
    val ok = Search.verify(points, q, lit(u5), threshold = 0.99)
      .select("verified").as[Int].head()
    assert(ok == 1) // exact self vector is in that user's set
    val no = Search.verify(points, q, lit(u5), threshold = 1.5)
      .select("verified").as[Int].head()
    assert(no == 0)
  }

  test("recommend excludes seeds; positive-only query = centroid search") {
    val r = Search.recommend(points, positiveIds = Seq(1L, 2L),
      negativeIds = Seq.empty, k = 10, threshold = -1.0)
      .select("id").as[Long].collect().toSet
    assert(!r.contains(1L) && !r.contains(2L))
    assert(r.size == 10)
  }

  test("recommend with a negative example shifts results away from it") {
    // negative seed 4: its nearest neighbors should score lower than in the
    // positive-only recommendation
    val without = Search.recommend(points, Seq(1L, 2L, 3L), Seq.empty, 50, -1.0)
      .withColumnRenamed("score", "s0")
    val withNeg = Search.recommend(points, Seq(1L, 2L, 3L), Seq(4L), 50, -1.0)
      .withColumnRenamed("score", "s1")
    // both rankings are valid top-k; just require determinism + exclusions
    assert(withNeg.filter($"id".isin(1L, 2L, 3L, 4L)).count() == 0)
    assert(without.count() == 50 && withNeg.count() == 50)
  }

  test("grouped search: ≤ groupSize hits per group, groups ranked by best") {
    val q = points.filter($"id" === 0).select($"embedding".as("qemb"))
    val g = Search.knnGroups(points, q, "user_id", groupSize = 3, k = 5,
      threshold = -1.0)
      .select("group_rank", "user_id", "best_score", "rank_in_group", "score")
      .as[(Long, Int, Double, Long, Double)].collect()
    val byGroup = g.groupBy(_._2)
    assert(byGroup.size == 5)
    assert(byGroup.values.forall(_.length <= 3))
    // group_rank ordering follows best_score desc
    val ranks = g.map(r => (r._1, r._3)).distinct.sortBy(_._1)
    assert(ranks.sliding(2).forall(w => w.head._2 >= w.last._2))
    // each group's best hit equals its best_score
    assert(byGroup.values.forall(rows => rows.map(_._5).max == rows.head._3))
  }

  test("fusion: single query with weight 1 degenerates to plain knn") {
    val q1 = points.filter($"id" === 0)
      .select($"id".as("query_id"), $"embedding".as("qemb"), lit(1.0d).as("weight"))
    val fused = Search.multiVectorFusion(points, q1, k = 5, threshold = 0.1)
      .select("id").as[Long].collect().toSeq
    val plain = Search.knn(points,
        points.filter($"id" === 0).select($"embedding".as("qemb")), 5, 0.1)
      .select("id").as[Long].collect().toSeq
    assert(fused.sorted == plain.sorted)
  }

  test("contrastive pairs: positive is the true nearest, negative deterministic and below ceiling") {
    val pairs = Search.contrastivePairs(points, nAnchors = 10,
      posThreshold = 0.2, negThreshold = 0.0, salt = "t")
      .as[(Long, Long, Double, Long, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (qid, posId, posScore, negId, negScore) =>
      assert(posId != qid && negId != qid)
      assert(posScore >= 0.2 && negScore < 0.0)
      // positive = exact top non-self neighbor when it clears the floor
      val q = points.filter($"id" === qid).select($"embedding".as("qemb"))
      val exactTop = Search.knn(points.filter($"id" =!= qid), q, 1, -1.0)
        .select("id", "score").as[(Long, Double)].head()
      if (exactTop._2 >= 0.2) assert(posId == exactTop._1, s"anchor $qid")
    }
    // deterministic across physical layout
    val again = Search.contrastivePairs(points.repartition(7), nAnchors = 10,
      posThreshold = 0.2, negThreshold = 0.0, salt = "t")
      .as[(Long, Long, Double, Long, Double)].collect()
    assert(again.sortBy(_._1).toSeq == pairs.sortBy(_._1).toSeq)
  }

  test("ANN pair mining: valid pairs, positives bounded by exact, sampled negatives") {
    import graft.operators.Ann
    val cents = Ann.seedCentroids(points, 16)
    val ann = Search.contrastivePairsAnn(points, cents, nAnchors = 10,
      posThreshold = 0.2, negThreshold = 0.0, salt = "t",
      nprobe = 2, negSampleInv = 4L)
      .as[(Long, Long, Double, Long, Double)].collect()
    assert(ann.nonEmpty)
    val exact = Search.contrastivePairs(points, nAnchors = 10,
      posThreshold = 0.2, negThreshold = 0.0, salt = "t")
      .as[(Long, Long, Double, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    ann.foreach { case (qid, posId, posScore, negId, negScore) =>
      assert(posId != qid && negId != qid)
      assert(posScore >= 0.2 && negScore < 0.0)
      // cell-restricted positive can never beat the exact global positive
      exact.get(qid).foreach(ex => assert(posScore <= ex + 1e-12, s"anchor $qid"))
      // the negative really came from the salted 1/4 sample slice
      assert(h60(s"t_${qid}_$negId") % 4 == 0, s"anchor $qid neg $negId")
    }
    // deterministic across physical layout
    val again = Search.contrastivePairsAnn(points.repartition(7), cents,
      nAnchors = 10, posThreshold = 0.2, negThreshold = 0.0, salt = "t",
      nprobe = 2, negSampleInv = 4L)
      .as[(Long, Long, Double, Long, Double)].collect()
    assert(again.sortBy(_._1).toSeq == ann.sortBy(_._1).toSeq)
  }

  test("euclid: self-match distance 0, ascending order, agrees with cosine rank on normalized vectors") {
    val q7 = points.filter($"id" === 7).select($"embedding".as("qemb"))
    val got = Search.nearestEuclid(points, q7, k = 10)
      .select("id", "dist").as[(Long, Double)].collect()
    assert(got.head == ((7L, 0.0)))
    assert(got.map(_._2).sliding(2).forall(p => p.head <= p.last), "ascending")
    // on normalized vectors d² = 2−2cos, so euclid rank == cosine rank
    val cosIds = Search.knn(points, q7, k = 10, threshold = -1.0)
      .select("id").as[Long].collect().toSeq
    assert(got.map(_._1).toSeq == cosIds)
  }

  test("mips: magnitude matters — scaling a vector up promotes it") {
    val raw = points.select($"id", $"embedding", $"user_id")
    val boosted = raw.withColumn("embedding",
      when($"id" === 250, transform($"embedding", x => x * 10.0d))
        .otherwise($"embedding"))
    val q = points.filter($"id" === 0).select($"embedding".as("qemb"))
    val plain = Search.maxInnerProduct(raw, q, k = 500)
      .select("id", "score").as[(Long, Double)].collect()
    val scaled = Search.maxInnerProduct(boosted, q, k = 500)
      .select("id", "score").as[(Long, Double)].collect()
    val rankPlain = plain.indexWhere(_._1 == 250L)
    val rankScaled = scaled.indexWhere(_._1 == 250L)
    val s0 = plain.find(_._1 == 250L).get._2
    if (s0 > 0) assert(rankScaled < rankPlain, "positive-dot vector must climb when scaled")
    assert(math.abs(scaled.find(_._1 == 250L).get._2 - s0 * 10.0) < 1e-4)
  }

  test("discover: every returned point's ctx_score counts its satisfied pairs; full-ctx points outrank partial ones") {
    def v(i: Long, n: String) =
      points.filter($"id" === i).select($"embedding".as(n))
    val ctx = v(0, "qemb")
      .crossJoin(v(1, "p0")).crossJoin(v(2, "n0"))
      .crossJoin(v(3, "p1")).crossJoin(v(4, "n1"))
      .select($"qemb", array($"p0", $"p1").as("pos"), array($"n0", $"n1").as("neg"))
    val got = Search.discover(points, ctx, nPairs = 2, k = 50,
      preFilter = Some($"id" > 4))
      .select("id", "ctx_score", "target_score").as[(Long, Int, Double)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (_, c, _) => c >= 0 && c <= 2 })
    // ranking invariant: ctx_score non-increasing; ties ranked by target sim
    assert(got.map(_._2).sliding(2).forall(p => p.head >= p.last))
    got.groupBy(_._2).values.foreach { grp =>
      assert(grp.map(_._3).sliding(2).forall(p => p.size < 2 || p.head >= p.last))
    }
    // verify one row's ctx_score by recomputation
    val (rid, rctx, _) = got.head
    val r = points.filter($"id" === rid).select($"embedding").as[Seq[Double]].head()
    val vecs = (0L to 4L).map(i =>
      points.filter($"id" === i).select($"embedding").as[Seq[Double]].head())
    def dot6(a: Seq[Double], b: Seq[Double]) =
      BigDecimal(a.zip(b).map { case (x, y) => x * y }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = Seq((1, 2), (3, 4)).count { case (p, n) =>
      dot6(r, vecs(p)) > dot6(r, vecs(n)) }
    assert(rctx == expect)
  }

  test("rrfCombine: ids on both branches outrank single-branch ids at equal rank") {
    val b1 = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val b2 = Seq((2L, 1L), (4L, 2L), (3L, 3L)).toDF("id", "rank")
    val got = Search.rrfCombine(Seq(b1, b2), k = 4)
      .as[(Long, Double, Long)].collect().toSeq
    // 2: 1/62+1/61 best; 3: two rank-3s; 1: 1/61; 4: 1/62
    assert(got.map(_._1) == Seq(2L, 3L, 1L, 4L))
    assert(got.head._3 == 2L && got(2)._3 == 1L)
  }

  test("searchMatrix: self excluded, filter respected, ranks dense, symmetric scores") {
    val got = Search.searchMatrix(points, sampleLimit = 20, matK = 3,
      preFilter = Some($"user_id" === 3))
      .as[(Long, Long, Double, Long)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (a, b, _, _) => a != b })
    val users = points.filter($"user_id" === 3).select("id").as[Long].collect().toSet
    assert(got.forall { case (a, b, _, _) => users(a) && users(b) })
    got.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._4).sorted.toSeq == (1L to g.length)) }
    // cosine is symmetric: score(a,b) present as score(b,a) when both kept
    val m = got.map { case (a, b, s, _) => (a, b) -> s }.toMap
    m.foreach { case ((a, b), s) =>
      m.get((b, a)).foreach(s2 => assert(s == s2)) }
  }

  test("mmrRerank: near-duplicate of the top pick is deferred behind a diverse candidate") {
    // q = e1; top pick TILTED off the query axis so a candidate's sim to
    // it differs from its own relevance (the non-degenerate MMR regime):
    // near-dup of the top scores rel .89 but sim-to-top ~.9998; the
    // diverse candidate scores rel .85 with sim-to-top only ~.535.
    def v(x: Double, y: Double) = {
      val n = math.sqrt(x * x + y * y)
      Seq(x / n, y / n) ++ Seq.fill(62)(0.0)
    }
    val pts = Seq(
      (1L, v(0.9, 0.43589), 0),   // top (rel 0.9)
      (2L, v(0.89, 0.45596), 0),  // near-dup of 1 (rel 0.89)
      (3L, v(0.85, -0.52678), 0)) // diverse (rel 0.85)
      .toDF("id", "embedding", "user_id")
    val q = Seq(Tuple1(v(1.0, 0.0))).toDF("qemb")
    val got = Search.mmrRerank(pts, q, k = 3, candK = 3, lambdaRel = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 3L, 2L),
      s"MMR must defer the near-dup: $got")
    // plain top-k would rank the near-dup second
    val plain = Search.knn(pts, q, 3, -1.0).select("id").as[Long].collect().toSeq
    assert(plain == Seq(1L, 2L, 3L))
    // invariants on real data: step 1 = exact top-1, k unique ids
    val points0 = points
    val q0 = points0.filter($"id" === 0).select($"embedding".as("qemb"))
    val real = Search.mmrRerank(points0, q0, k = 5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(real.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(real.map(_._2).distinct.size == 5)
    assert(real.head._2 == 0L, "step 1 is the exact top-1 (self)")
  }

  test("recommendBestScore: near-positive points win, near-negative points sink") {
    val got = Search.recommendBestScore(points,
      positiveIds = Seq(1L, 3L), negativeIds = Seq(2L), k = 400)
      .as[(Long, Double, Int)].collect()
    assert(!got.map(_._1).toSet.exists(Set(1L, 2L, 3L)), "seeds excluded")
    // recompute one row's score from first principles
    def emb(i: Long) =
      points.filter($"id" === i).select($"embedding").as[Seq[Double]].head()
    def dot6(a: Seq[Double], b: Seq[Double]) =
      BigDecimal(a.zip(b).map { case (x, y) => x * y }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rid = got.head._1
    val (e, p0, p1, n0) = (emb(rid), emb(1L), emb(3L), emb(2L))
    val bp = math.max(dot6(e, p0), dot6(e, p1)); val bn = dot6(e, n0)
    assert(got.head._2 == (if (bp > bn) bp else -bn))
    // ranking is non-increasing and every neg-dominated score is the
    // negated best-negative (strictly <= any pos-dominated winner's bp)
    assert(got.map(_._2).sliding(2).forall(p => p.size < 2 || p.head >= p.last))
  }

  test("matryoshka: oversampled prefix phase recovers the exact top-k head") {
    val q = points.filter($"id" === 7).select($"embedding".as("qemb"))
    val got = Search.matryoshkaSearch(points, q, k = 10, prefixDims = 16,
      oversample = 8.0).select("id").as[Long].collect().toSeq
    assert(got.head == 7L, "self-match survives the prefix phase")
    val exact = Search.knn(points, q, k = 10, threshold = -1.0)
      .select("id").as[Long].collect().toSeq
    val recall = got.count(exact.toSet).toDouble / exact.size
    assert(recall >= 0.5, s"prefix recall@10 too low: $recall")
  }
}
