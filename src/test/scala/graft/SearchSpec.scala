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
}
