package graft

import graft.operators.TextAnalysis

/** Decontamination semantics on a handcrafted fixture. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("decontamination flags docs sharing n-grams with the eval set only") {
    val eval = Seq((1L, "the quick brown fox jumps over the dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (100L, "something totally different is written here"),
      (101L, "he said the quick brown fox jumps high"),
      (102L, "the quick brown fox jumps over the dog")) // full overlap
      .toDF("doc_id", "text")
    val flagged = TextAnalysis.decontaminate(corpus, eval, n = 3)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(!flagged.contains(100L))
    assert(flagged.contains(101L) && flagged(101L)._2 == 1L)
    assert(flagged(102L)._1 > flagged(101L)._1, "full overlap shares more shingles")
  }

  test("minShared raises the flagging bar") {
    val eval = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq((200L, "alpha beta gamma unrelated tail")).toDF("doc_id", "text")
    assert(TextAnalysis.decontaminate(corpus, eval, n = 3, minShared = 1).count() == 1)
    assert(TextAnalysis.decontaminate(corpus, eval, n = 3, minShared = 2).count() == 0)
  }
}
