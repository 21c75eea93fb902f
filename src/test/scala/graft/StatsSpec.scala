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
}
