package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic hash-sampling semantics: reproducibility, rate accuracy,
  * stratum independence, and split totality. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(s"$sf001/documents.parquet").cache()

  test("sample membership is a pure function of (salt, id)") {
    def ids() = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      rates = Seq("en" -> 0.5), defaultRate = 0.2, salt = "t1")
      .filter(col("_keep")).select("doc_id").as[Long].collect().toSet
    assert(ids() == ids()) // repartition-independent, run-independent
    val other = Sampling.stratifiedSample(
      docs.repartition(7), col("doc_id"), col("lang"),
      rates = Seq("en" -> 0.5), defaultRate = 0.2, salt = "t1")
      .filter(col("_keep")).select("doc_id").as[Long].collect().toSet
    assert(other == ids())
  }

  test("different salts draw different samples") {
    def ids(salt: String) = Sampling.stratifiedSample(docs, col("doc_id"),
      col("lang"), rates = Seq.empty, defaultRate = 0.5, salt = salt)
      .filter(col("_keep")).select("doc_id").as[Long].collect().toSet
    assert(ids("a") != ids("b"))
  }

  test("per-stratum rates are honored within binomial tolerance") {
    val n = 2000
    val df = (0 until n).map(i => (i.toLong, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val sampled = Sampling.stratifiedSample(df, col("doc_id"), col("lang"),
      rates = Seq("en" -> 0.5, "de" -> 0.1), defaultRate = 0.0, salt = "r")
      .filter(col("_keep"))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // 1000 trials per stratum: ~6 sigma tolerance
    assert(math.abs(sampled("en") - 500L) < 100, s"en=${sampled("en")}")
    assert(math.abs(sampled("de") - 100L) < 60, s"de=${sampled("de")}")
  }

  test("temperature mix: small sources upweighted, overall fraction near target") {
    // skewed corpus: one giant source, two small ones
    val rows = (0 until 4000).map(i => (i.toLong, "big")) ++
      (4000 until 4400).map(i => (i.toLong, "mid")) ++
      (4400 until 4500).map(i => (i.toLong, "tiny"))
    val df = rows.toDF("doc_id", "source")
    val mixed = Sampling.temperatureMix(df, col("doc_id"), col("source"),
      totalFrac = 0.25, salt = "tm")
    val per = mixed.filter(col("_keep")).groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val total = per.values.sum.toDouble
    // overall near 25% of 4500 (binomial tolerance)
    assert(math.abs(total - 1125) < 180, s"total=$total")
    // sampling RATE must increase as source size decreases (alpha<1)
    val rate = Map("big" -> per.getOrElse("big", 0L) / 4000.0,
      "mid" -> per.getOrElse("mid", 0L) / 400.0,
      "tiny" -> per.getOrElse("tiny", 0L) / 100.0)
    assert(rate("tiny") > rate("mid") && rate("mid") > rate("big"), s"$rate")
    // membership deterministic across repartitioning
    val again = Sampling.temperatureMix(df.repartition(5), col("doc_id"),
      col("source"), totalFrac = 0.25, salt = "tm")
      .filter(col("_keep")).select("doc_id").as[Long].collect().toSet
    assert(again == mixed.filter(col("_keep")).select("doc_id")
      .as[Long].collect().toSet)
  }

  test("capPerGroup: dominant group trimmed to n, small groups intact, deterministic") {
    import org.apache.spark.sql.functions._
    val rows = (0L until 80L).map(i => (i, "big")) ++
      (100L until 105L).map(i => (i, "small"))
    val df = rows.toDF("doc_id", "source")
    val capped = Sampling.capPerGroup(df, col("source"), col("doc_id"),
      n = 10, salt = "t")
    val per = capped.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    assert(per("big") == 10L, s"dominant group must cap at n: $per")
    assert(per("small") == 5L, "under-cap groups keep everything")
    // deterministic across physical layout
    val again = Sampling.capPerGroup(df.repartition(7), col("source"),
      col("doc_id"), n = 10, salt = "t")
      .select("doc_id").as[Long].collect().toSet
    assert(again == capped.select("doc_id").as[Long].collect().toSet)
    // the rank<=n shape plans as WindowGroupLimit (partial pre-shuffle trim)
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), "expected WindowGroupLimit in plan")
  }

  test("train/test split is total, disjoint, and near the requested fraction") {
    val split = Sampling.trainTestSplit(docs, col("doc_id"), 0.8, salt = "sp")
    assert(split.count() == docs.count())
    val byName = split.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    val total = byName.values.sum
    assert(byName.keySet.subsetOf(Set("train", "test")))
    assert(byName("train") > (total * 0.6) && byName("train") < total)
  }

  test("unimax: caps respected, budget met exactly, waterline hand-checked") {
    // sources: a cap 200, b cap 1000, c cap 10000 (maxEpochs=2);
    // budget 3000 -> a,b capped; c takes the j=3 waterline 1800
    val docs = Seq(
      ("a", 60L), ("a", 40L),
      ("b", 250L), ("b", 250L),
      ("c", 2500L), ("c", 2500L)).toDF("source", "n_tok")
    val out = Sampling.unimaxAllocate(docs, col("source"), col("n_tok"),
        budgetTokens = 3000L, maxEpochs = 2)
      .select("source", "capacity", "allocated", "epochs")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("a") == ((200L, 200L, 2.0)))
    assert(out("b") == ((1000L, 1000L, 2.0)))
    assert(out("c") == ((10000L, 1800L, 0.36)))
    // budget attainable -> met exactly; epochs never exceed the cap
    assert(out.values.map(_._2).sum == 3000L)
    assert(out.values.forall(_._3 <= 2.0))
    // budget above total capacity -> everything capped
    val all = Sampling.unimaxAllocate(docs, col("source"), col("n_tok"),
        budgetTokens = 100000L, maxEpochs = 2)
      .select("capacity", "allocated").as[(Long, Long)].collect()
    assert(all.forall { case (cap, alloc) => alloc == cap })
  }
}
