package graft

import graft.operators.{Collection, Multimodal, Quantization, Search, Stats}
import graft.operators.Events
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("mapPartitions decode path produces identical features to the expression path") {
    val assets = Multimodal.loadAssets(spark, sf001)
    val expr = Multimodal.extractFeaturesExpr(assets)
      .as[Multimodal.AssetFeatures].collect().sortBy(_.asset_id)
    val part = Multimodal.extractFeaturesPartitioned(assets)
      .collect().sortBy(_.asset_id)
    assert(expr.length == part.length && expr.length > 0)
    assert(expr.zip(part).forall { case (a, b) => a == b })
  }

  test("binary content is opaque bytes with correct metadata") {
    val a = Multimodal.loadAssets(spark, sf001)
    val r = a.select("n_bytes").distinct().as[Long].collect()
    assert(r.toSeq == Seq(16L)) // md5 blob stand-in
    assert(a.select("media_type").distinct().count() == 3)
  }
}

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Collection.load(spark, sf001).cache()

  test("two-phase int8 rescore returns the exact top-k (oversampling covers the gap)") {
    val q = points.filter($"id" === 0).select($"embedding".as("qemb"))
    val twoPhase = Quantization.twoPhaseSearch(points, q, k = 10)
      .select("id").as[Long].collect().toSeq
    val exact = Search.knn(points, q, k = 10, threshold = -1.0)
      .select("id").as[Long].collect().toSeq
    assert(twoPhase == exact)
  }

  test("int8 cheap score approximates the true dot within quantization error") {
    val q = points.filter($"id" === 1).select($"embedding".as("qemb"))
    val err = points.crossJoin(broadcast(q))
      .select(abs(
        Quantization.int8Score(
          Quantization.quantize($"embedding"), Quantization.quantize($"qemb"))
          - graft.functions.VectorOps.dot($"embedding", $"qemb")).as("e"))
      .agg(max("e")).as[Double].head()
    assert(err < 0.05, s"quantization error $err too large") // ~2*sqrt(64)/127
  }
}

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("metric summary moments match direct computation") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0))
      .toDF("g", "value")
    val r = Stats.metricSummary(df, Seq("g"), "value")
      .select("g", "n", "mean", "stddev_v", "p50")
      .as[(String, Long, Double, Option[Double], Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    val (n, mean, sd, p50) = r("a")
    assert(n == 3 && mean == 2.0 && p50 == 2.0)
    assert(math.abs(sd.get - 1.0) < 1e-12)
    assert(r("b")._3.isEmpty, "stddev undefined for n=1")
  }

  test("summary over real events is stable and ordered") {
    val s = Stats.metricSummary(Events.load(spark, sf001), Seq("event_type"), "value")
    val types = s.select("event_type").as[String].collect()
    assert(types.sameElements(types.sorted))
    assert(s.count() == 5)
  }
}
