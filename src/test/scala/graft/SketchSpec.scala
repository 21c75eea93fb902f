package graft

import org.apache.spark.sql.functions._
import graft.plans.SketchExpressions

/** Misra-Gries heavy-hitters aggregate: exact regime, error contract, and
  * partitioning invariance. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("capacity >= cardinality makes the sketch exactly the groupBy counts") {
    val df = spark.range(0, 10000).select((col("id") % 37).as("k"))
    val sk = df.agg(SketchExpressions.misraGries(col("k"), 64).as("sk"))
      .select(explode(col("sk")).as(Seq("k", "n")))
      .as[(Long, Long)].collect().toMap
    val exact = df.groupBy("k").count().as[(Long, Long)].collect().toMap
    assert(sk == exact)
  }

  test("small capacity: heavy hitters survive, counts under-estimate by <= n/(m+1)") {
    // skewed stream: key 0 appears 5000 times, keys 1..500 once each
    val heavy = Seq.fill(5000)(0L) ++ (1L to 500L)
    val df = heavy.toDF("k").repartition(8)
    val m = 10
    val sk = df.agg(SketchExpressions.misraGries(col("k"), m).as("sk"))
      .select(explode(col("sk")).as(Seq("k", "n")))
      .as[(Long, Long)].collect().toMap
    assert(sk.size <= m)
    assert(sk.contains(0L), "true heavy hitter evicted")
    val n = heavy.length
    assert(sk(0L) <= 5000L && sk(0L) >= 5000L - n / (m + 1),
      s"count ${sk(0L)} outside MG bound")
    sk.foreach { case (k, c) =>
      val truth = if (k == 0L) 5000L else 1L
      assert(c <= truth, s"over-estimate for $k")
    }
  }

  test("exact-regime result is invariant to input partitioning") {
    val base = spark.range(0, 5000).select((col("id") % 101).as("k"))
    def run(parts: Int): Map[Long, Long] =
      base.repartition(parts)
        .agg(SketchExpressions.misraGries(col("k"), 256).as("sk"))
        .select(explode(col("sk")).as(Seq("k", "n")))
        .as[(Long, Long)].collect().toMap
    assert(run(1) == run(13))
  }
}
