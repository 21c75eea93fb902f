package graft

import org.apache.spark.sql.functions._
import graft.operators.{Collection, Search}

/** Prepared-statement serving form (VERDICT r12 #6): one physical plan,
  * per-request literal rebinding through the QueryVectorSlot. The
  * contract is RESULT EQUALITY with Search.knnDirect across slot reuse —
  * a stale slot snapshot, a constant-folded first query, or a codegen
  * path reading the wrong reference would all fail these. */
class PreparedKnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Collection.load(spark, sf001).cache()

  private def directRows(q: Array[Double], k: Int, th: Double) =
    Search.knnDirect(points, q.toSeq, k = k, threshold = th)
      .as[(Long, Double, Int)].collect().toSeq

  test("prepared ≡ direct on a fresh statement") {
    val q = points.filter($"id" === 7)
      .select("embedding").head().getSeq[Double](0).toArray
    val prep = new Search.PreparedKnn(points, k = 10, threshold = 0.1)
    assert(prep.search(q).toSeq == directRows(q, 10, 0.1))
  }

  test("slot reuse: the SAME statement answers different queries correctly") {
    val prep = new Search.PreparedKnn(points, k = 10, threshold = 0.0)
    // reuse across 5 distinct query vectors — a frozen first query (the
    // constant-folding failure mode) would mismatch from the 2nd on
    (Seq(0L, 7L, 42L, 100L, 150L)).foreach { id =>
      val q = points.filter($"id" === id)
        .select("embedding").head().getSeq[Double](0).toArray
      assert(prep.search(q).toSeq == directRows(q, 10, 0.0),
        s"mismatch at query id=$id")
      assert(prep.search(q).head._1 == id, s"self-match lost at id=$id")
    }
  }

  test("threshold stays bound at prepare time") {
    val q = points.filter($"id" === 3)
      .select("embedding").head().getSeq[Double](0).toArray
    val strict = new Search.PreparedKnn(points, k = 50, threshold = 0.5)
    val loose = new Search.PreparedKnn(points, k = 50, threshold = -1.0)
    val s = strict.search(q)
    assert(s.forall(_._2 >= 0.5))
    assert(s.toSeq == directRows(q, 50, 0.5))
    assert(loose.search(q).length >= s.length)
  }

  test("statement-per-thread: concurrent statements do not cross queries") {
    val ids = Seq(0L, 7L, 11L, 42L, 100L, 150L, 199L, 5L)
    val qs = ids.map(id => points.filter($"id" === id)
      .select("embedding").head().getSeq[Double](0).toArray)
    val expected = qs.map(q => directRows(q, 5, 0.0))
    val preps = ids.map(_ => new Search.PreparedKnn(points, k = 5, threshold = 0.0))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(ids.length)
    try {
      val futs = ids.indices.map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean =
            (0 until 5).forall(_ => preps(i).search(qs(i)).toSeq == expected(i))
        })
      }
      assert(futs.forall(_.get()), "a statement crossed queries under concurrency")
    } finally pool.shutdownNow()
  }
}
