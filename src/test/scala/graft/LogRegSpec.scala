package graft

import org.apache.spark.sql.functions._
import graft.operators.LogReg

/** LR quality-filter specs: decimal-exact GD determinism across physical
  * layout, monotone loss improvement over the zero model, separation
  * quality against the weak labels, and the scoring path's agreement
  * with a driver-side recomputation. */
class LogRegSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf001/documents.parquet")
  private lazy val feats = LogReg.qualityFeatures(docs).cache()
  private lazy val w = LogReg.train(feats)

  test("train must not evict a caller-managed cache") {
    val sel = LogReg.qualityFeatures(docs)
      .select($"f1", $"f2", $"f3", $"f4", $"y").cache()
    try {
      sel.count()
      LogReg.train(sel, iters = 1)
      assert(sel.storageLevel.useMemory,
        "caller's cache evicted by train's internal unpersist")
    } finally sel.unpersist()
  }

  test("train is deterministic across physical layout") {
    val w2 = LogReg.train(LogReg.qualityFeatures(docs.repartition(7)))
    assert(w.toSeq == w2.toSeq)
  }

  test("trained model beats the zero model on log-loss") {
    val l0 = LogReg.logLoss(feats, Array.fill(5)(0.0))
    val lw = LogReg.logLoss(feats, w)
    assert(math.abs(l0 - math.log(2.0)) < 1e-9, s"zero-model loss is ln2, got $l0")
    assert(lw < l0 * 0.8, s"trained loss $lw vs zero $l0")
  }

  test("predictions separate the weak labels well") {
    val scored = LogReg.score(docs, LogReg.weightsTable(spark, w))
    val n = scored.count()
    val agree = scored.filter(col("keep") === col("weak_label")).count()
    val acc = agree.toDouble / n
    // labels are a thresholded product of the features — a linear probe
    // should recover most of the gate
    assert(acc >= 0.85, s"accuracy $acc ($agree/$n)")
    // both classes must actually occur, or the bound is vacuous
    val kept = scored.filter(col("keep") === 1).count()
    assert(kept > 0 && kept < n, s"degenerate keep split $kept/$n")
  }

  test("scoring path agrees with driver recomputation") {
    val got = LogReg.score(docs, LogReg.weightsTable(spark, w))
      .select($"doc_id", $"lr_logit").as[(Long, Double)].collect().toMap
    val rows = LogReg.qualityFeatures(docs)
      .select($"doc_id", $"f1", $"f2", $"f3", $"f4")
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, f1, f2, f3, f4) =>
      val z = w(0) + w(1) * f1 + w(2) * f2 + w(3) * f3 + w(4) * f4
      val want = BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(id) - want) < 1e-9, s"doc $id: ${got(id)} vs $want")
    }
  }
}
