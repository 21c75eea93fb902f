package graft

import org.apache.spark.sql.functions._

import graft.operators.Privacy

/** PII scan/redact semantics on handcrafted strings — category coverage,
  * pass ordering, non-overlap counting, and no-PII passthrough. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(s).toDF("t").select(Privacy.redact(col("t"))).as[String].head()

  test("each category redacts to its placeholder") {
    assert(redactOne("mail bob.smith+x@corp.example.org end")
      == "mail <EMAIL> end")
    assert(redactOne("call +1-555-0100 now") == "call <PHONE> now")
    assert(redactOne("from 192.168.0.1 port") == "from <IP> port")
    assert(redactOne("acct 123456789 ok") == "acct <NUM> ok")
  }

  test("pass order: email digits are not eaten by the digit-run pass") {
    // the local part contains a 4+ digit run AND an ip-shaped domain label;
    // the email pass must claim the whole token first
    assert(redactOne("x12345@ex.co") == "<EMAIL>")
    // phone before ip/digits: the body is digit runs joined by dashes
    assert(redactOne("+44-123-4567") == "<PHONE>")
    // dotted quad is <IP>, not four digit runs
    assert(redactOne("10.200.30.40") == "<IP>")
  }

  test("no-PII text passes through unchanged; short digits survive") {
    val s = "plain words 12 and 345 only"
    assert(redactOne(s) == s)
  }

  test("scanReport counts non-overlapping matches per category") {
    val df = Seq(
      ("g1", "a@b.co and c@d.org plus 192.168.0.1"),
      ("g1", "nothing here"),
      ("g2", "+1-555-0100 then 987654321 and 12345"))
      .toDF("g", "t")
    val r = Privacy.scanReport(df, "t", Seq("g"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    // (g, n_rows, n_email, n_phone, n_ipv4, n_digit_run, n_rows_with_pii)
    assert(r("g1") == ("g1", 2L, 2L, 0L, 1L, 0L, 1L), s"g1: ${r("g1")}")
    // digit runs: 0100 (inside the phone), 987654321, 12345
    assert(r("g2") == ("g2", 1L, 0L, 1L, 0L, 3L, 1L), s"g2: ${r("g2")}")
  }

  test("redactRows is a shuffle-free projection plus presentation sort") {
    val df = Seq((1L, "a@b.co"), (2L, "ok")).toDF("id", "t")
    val plan = Privacy.redactRows(df, "id", "t")
      .queryExecution.executedPlan.toString
    // one Exchange (the final ORDER BY), nothing else
    assert("Exchange".r.findAllIn(plan).size <= 1, plan)
  }
}
