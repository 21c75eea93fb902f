package graft

import org.apache.spark.sql.functions._
import graft.operators.TextNormalize

class TextNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val decomposed = "cafe\u0301"  // e + combining acute
  private val composed = "caf\u00e9"     // é precomposed

  test("nfc composes decomposed graphemes and is identity on NFC text") {
    val df = Seq(
      (1L, decomposed),
      (2L, composed),
      (3L, "plain ascii"),
      (4L, null.asInstanceOf[String])
    ).toDF("id", "t")
    val out = df.select(col("id"), TextNormalize.nfc(col("t")).as("n"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains(composed), "decomposed must compose")
    assert(out(2L).contains(composed), "composed unchanged")
    assert(out(3L).contains("plain ascii"))
    assert(out(4L).isEmpty, "null-safe")
  }

  test("nfc is registered as a SQL function") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(s"SELECT nfc('$decomposed') AS n").as[String].head()
    assert(r == composed)
  }

  test("clean strips controls but keeps tab/newline, after composing") {
    val dirty = "a\u0007b c\td\ne " + decomposed
    val out = Seq((1L, dirty)).toDF("id", "t")
      .select(TextNormalize.clean(col("t")).as("c")).as[String].head()
    assert(out == "ab c\td\ne " + composed)
  }

  test("encodingReport counts each defect class per group") {
    val df = Seq(
      ("en", decomposed),                      // nfc drift only
      ("en", "\u00c3\u00a9\u00c2 text"),       // \u00c3\u00a9 is mojibake; bare \u00c2+space is not
      ("en", "x\ufffd\u0007\ufffdy"),          // 2 replacements + 1 control
      ("de", "clean text"),
      ("pt", "S\u00c3O PAULO \u00c2ngela")      // legit Latin-1 letters - NOT mojibake
    ).toDF("lang", "text")
    val rows = TextNormalize.encodingReport(df, "text", Seq("lang"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    // (lang, n_docs, n_nfc_changed, n_replacement, n_mojibake, n_control)
    assert(rows.toSeq == Seq(
      ("de", 1L, 0L, 0L, 0L, 0L),
      ("en", 3L, 1L, 2L, 1L, 1L),
      ("pt", 1L, 0L, 0L, 0L, 0L)))
  }
}
