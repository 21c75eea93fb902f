package graft

import graft.operators.{Stats, TextAnalysis}

/** z-score outlier and PMI-bigram semantics on handcrafted data. */
class OutlierPmiSpec extends SparkSpec {
  import spark.implicits._

  test("zOutliers flags exactly the rows beyond the threshold") {
    // g1: values 1..7 plus a far outlier 100 -> only 100 crosses z=2
    val g1 = (1 to 7).map(v => (v.toLong, "g1", v.toDouble)) :+
      (8L, "g1", 100.0)
    // g2: constant metric -> stddev 0 -> z null -> never flagged
    val g2 = (10 to 13).map(v => (v.toLong, "g2", 5.0))
    val df = (g1 ++ g2).toDF("id", "g", "m")
    val out = Stats.zOutliers(df, Seq("g"), "id", "m", threshold = 2.0)
      .as[(Long, String, Double, Double, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(8L), out.mkString(", "))
    val z = out.head._4
    assert(z > 2.0 && z < 3.0, s"z of the planted outlier: $z")
  }

  test("zOutliers flags both tails") {
    // mean 0, sample stddev sqrt(200/5)=6.3246: z(+/-10) = +/-1.5811
    val df = Seq((1L, "g", -10.0), (2L, "g", 0.0), (3L, "g", 0.0),
      (4L, "g", 0.0), (5L, "g", 0.0), (6L, "g", 10.0)).toDF("id", "g", "m")
    val flagged = Stats.zOutliers(df, Seq("g"), "id", "m", threshold = 1.5)
      .as[(Long, String, Double, Double, Double)].collect()
    assert(flagged.map(_._1).toSet == Set(1L, 6L), flagged.mkString(", "))
    val zs = flagged.map(r => r._1 -> r._4).toMap
    assert(zs(1L) == -zs(6L) && zs(6L) == 1.581139, zs.toString)
  }

  test("pmiBigrams computes exact counts and lift on a known corpus") {
    // docs: "a b", "a b", "a c" -> c(a)=3 c(b)=2 c(c)=1, N=6
    // bigrams: (a,b)x2, (a,c)x1, NB=3; minCount=2 keeps only (a,b)
    // lift = (2/3) / ((3/6)*(2/6)) = 4.0 ; pmi = ln 4
    val docs = Seq((0L, "a b"), (1L, "a b"), (2L, "a c"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.pmiBigrams(docs, k = 10, minCount = 2)
      .as[(String, String, Long, Long, Long, Double, Double)].collect()
    assert(r.length == 1, r.mkString(", "))
    val (a, b, cab, ca, cb, lift, pmi) = r.head
    assert((a, b, cab, ca, cb) == ("a", "b", 2L, 3L, 2L))
    assert(lift == 4.0, s"lift $lift")
    assert(math.abs(pmi - math.log(4.0)) < 1e-6, s"pmi $pmi")
  }

  test("pmiBigrams ranking is lift-desc with (a,b) tiebreak") {
    // two pairs with equal lift: tie broken lexicographically
    val docs = Seq((0L, "x y"), (1L, "x y"), (2L, "p q"), (3L, "p q"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.pmiBigrams(docs, k = 10, minCount = 2)
      .as[(String, String, Long, Long, Long, Double, Double)].collect()
    assert(r.map(t => (t._1, t._2)).toSeq == Seq(("p", "q"), ("x", "y")),
      r.mkString(", "))
  }
}
