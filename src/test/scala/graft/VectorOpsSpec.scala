package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Invariants of the vector kernels (SURVEY.md §5: ‖normalize(x)‖=1,
  * cos(x,x)=1, symmetry, epsilon guard). */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Seq(3.0f, 4.0f)),
    (2L, Seq(-1.0f, 2.0f)),
    (3L, Seq(0.0f, 0.0f)), // zero vector: epsilon guard, no NaN/Inf
    (4L, Seq(1e-20f, 0.0f))
  ).toDF("id", "v")

  test("normalize produces unit norm (and 0 for the zero vector)") {
    val norms = vecs
      .withColumn("n", VectorOps.l2Norm(VectorOps.normalize(col("v"))))
      .select("id", "n").as[(Long, Double)].collect().toMap
    assert(math.abs(norms(1L) - 1.0) < 1e-12)
    assert(math.abs(norms(2L) - 1.0) < 1e-12)
    assert(norms(3L) == 0.0) // 0/eps = 0, stays finite
  }

  test("dot matches hand computation and is symmetric") {
    val d = vecs.filter($"id" <= 2)
      .select(VectorOps.dot(VectorOps.toDouble($"v"), VectorOps.toDouble($"v")).as("dd"))
      .as[Double].collect()
    assert(d.toSet == Set(25.0, 5.0))
    val ab = vecs.filter($"id" === 1).crossJoin(
        vecs.filter($"id" === 2).select($"v".as("w")))
      .select(
        VectorOps.dot(VectorOps.toDouble($"v"), VectorOps.toDouble($"w")).as("ab"),
        VectorOps.dot(VectorOps.toDouble($"w"), VectorOps.toDouble($"v")).as("ba"))
      .as[(Double, Double)].head()
    assert(ab._1 == ab._2 && ab._1 == (3.0 * -1 + 4.0 * 2))
  }

  test("cosine of a vector with itself is 1; scale-invariant") {
    val c = vecs.filter($"id" === 1)
      .select(
        VectorOps.cosine($"v", $"v").as("self"),
        VectorOps.cosine($"v", transform($"v", x => x * 7.5d)).as("scaled"))
      .as[(Double, Double)].head()
    assert(math.abs(c._1 - 1.0) < 1e-12)
    assert(math.abs(c._2 - 1.0) < 1e-12)
  }

  test("l2Dist is 0 to self and euclidean otherwise") {
    val d = vecs.filter($"id" === 1).crossJoin(
        vecs.filter($"id" === 2).select($"v".as("w")))
      .select(VectorOps.l2Dist($"v", $"v").as("z"), VectorOps.l2Dist($"v", $"w").as("d"))
      .as[(Double, Double)].head()
    assert(d._1 == 0.0)
    assert(math.abs(d._2 - math.sqrt(16 + 4)) < 1e-12)
  }
}
