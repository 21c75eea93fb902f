package graft

import graft.operators.Stats

/** Bivariate stats + histogram semantics on handcrafted data. */
class BivariateStatsSpec extends SparkSpec {
  import spark.implicits._

  test("corrSummary: perfect, inverse, and degenerate correlations") {
    val df = Seq(
      // g1: y = 2x -> r = 1; g2: y = -x -> r = -1; g3: constant y -> null
      ("g1", 1.0, 2.0), ("g1", 2.0, 4.0), ("g1", 3.0, 6.0),
      ("g2", 1.0, 3.0), ("g2", 2.0, 2.0), ("g2", 3.0, 1.0),
      ("g3", 1.0, 5.0), ("g3", 2.0, 5.0), ("g3", 3.0, 5.0))
      .toDF("g", "x", "y")
    val r = Stats.corrSummary(df, Seq("g"), "x", "y")
      .select("g", "pearson_r")
      .as[(String, Option[Double])].collect().toMap
    assert(r("g1").contains(1.0), s"g1 ${r("g1")}")
    assert(r("g2").contains(-1.0), s"g2 ${r("g2")}")
    assert(r("g3").isEmpty, s"constant y must yield null, got ${r("g3")}")
  }

  test("histogramBins: bins partition the range, counts conserve rows") {
    val df = (0 until 100).map(i => (i.toLong, (i * 7L) % 97))
      .toDF("id", "m")
    val bins = Stats.histogramBins(df, "m", nBins = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(bins.map(_._2).sum == 100, "counts must conserve rows")
    bins.foreach { case (bin, _, lo, hi) =>
      assert(lo <= hi && bin >= 0 && bin < 10, s"bin $bin [$lo,$hi]")
    }
    // bins are ordered and non-overlapping
    bins.sliding(2).foreach {
      case Array((_, _, _, hi1), (_, _, lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("ksDrift: 0 for identical samples, ~1 for disjoint, counts faithful") {
    val same = (1 to 100).flatMap(i =>
      Seq(("a", i.toDouble), ("b", i.toDouble)))
      .toDF("grp", "value")
    val ks0 = Stats.ksDrift(same, "grp", "a", "b", "value", nBins = 20)
      .as[(Double, Long, Long, Long)].head()
    assert(ks0._1 == 0.0 && ks0._3 == 100L && ks0._4 == 100L)
    val disjoint = ((1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 100).map(i => ("b", 1000.0 + i)))
      .toDF("grp", "value")
    val ks1 = Stats.ksDrift(disjoint, "grp", "a", "b", "value", nBins = 20)
      .as[(Double, Long, Long, Long)].head()
    assert(ks1._1 == 1.0, s"disjoint samples must give KS 1, got $ks1")
    // a partial shift lands strictly between
    val shifted = ((1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 100).map(i => ("b", 50.0 + i)))
      .toDF("grp", "value")
    val ksMid = Stats.ksDrift(shifted, "grp", "a", "b", "value", nBins = 20)
      .as[(Double, Long, Long, Long)].head()._1
    assert(ksMid > 0.2 && ksMid < 0.8, s"shifted KS out of range: $ksMid")
  }

  test("psiDrift: ~0 for identical samples, large for disjoint, order-stable") {
    val same = (1 to 100).flatMap(i =>
      Seq(("a", i.toDouble), ("b", i.toDouble))).toDF("grp", "value")
    val psi0 = Stats.psiDrift(same, "grp", "a", "b", "value", nBins = 20)
      .as[(Double, Long, Long)].head()
    assert(math.abs(psi0._1) < 1e-6 && psi0._2 == 100L)
    val disjoint = ((1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 100).map(i => ("b", 1000.0 + i))).toDF("grp", "value")
    val psi1 = Stats.psiDrift(disjoint, "grp", "a", "b", "value", nBins = 20)
      .as[(Double, Long, Long)].head()._1
    assert(psi1 > 1.0, s"disjoint PSI should be large: $psi1")
    // deterministic across physical layout (the ordered-fold contract)
    val again = Stats.psiDrift(disjoint.repartition(7), "grp", "a", "b",
      "value", nBins = 20).as[(Double, Long, Long)].head()._1
    assert(again == psi1)
  }

  test("embedding health: collapse shows up as anisotropy, dims/norms exact") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    // dim 2 carries 10x the spread of the others -> it owns max_var
    val rows = (0 until 500).map { _ =>
      Seq.tabulate(8)(d => (if (d == 2) 10.0 else 1.0) * rnd.nextGaussian())
    }
    val df = rows.toDF("embedding")
    val r = graft.operators.Stats.embeddingHealth(df).collect()(0)
    assert(r.getAs[Long]("dim_count") == 8L)
    assert(r.getAs[Long]("max_var_dim") == 2L)
    assert(r.getAs[Double]("anisotropy") > 5.0)
    assert(r.getAs[Double]("min_norm") <= r.getAs[Double]("mean_norm") &&
      r.getAs[Double]("mean_norm") <= r.getAs[Double]("max_norm"))
    // determinism
    val r2 = graft.operators.Stats.embeddingHealth(df).collect()(0)
    assert(r.toSeq == r2.toSeq)
  }
}
