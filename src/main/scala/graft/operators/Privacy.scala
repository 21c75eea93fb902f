package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over free-text columns — the scrubbing pass
  * every training-data pipeline runs before a corpus ships (emails, phone
  * numbers, IP addresses, long digit runs such as account/card numbers).
  * The reference stores caller-supplied free-form payload JSON
  * (src/api/schemas.py:19,38) with no scrubbing; at corpus scale that
  * payload is exactly where PII lands, so the engine provides the pass as a
  * first-class operator.
  *
  * Both operators are embarrassingly-parallel projections — zero shuffles
  * at any corpus size (the scan prunes to the text column); the scan's
  * per-category counts feed one map-side-combined rollup.
  *
  * Patterns are deliberately restricted to the regex subset with identical
  * semantics in Java (Spark codegen) and RE2 (DuckDB oracle): character
  * classes, bounded repetition, word boundaries — no backreferences, no
  * lookaround. Counting is non-overlapping leftmost matching in both
  * engines.
  */
object Privacy {

  /** Redaction order matters and is part of the contract: emails first
    * (their local part contains digits that would otherwise be eaten by the
    * digit-run pass), then phones, then IPv4 (dotted digits would match the
    * digit-run pattern), then bare digit runs. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+\\d{1,3}-\\d{3}-\\d{3,4}"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val digitRunRe = "\\d{4,}"

  private val passes = Seq(
    emailRe -> "<EMAIL>", phoneRe -> "<PHONE>",
    ipv4Re -> "<IP>", digitRunRe -> "<NUM>")

  /** Scrubbed form of a text column: every match of every category replaced
    * by its placeholder token, in the documented pass order. */
  def redact(text: Column): Column =
    passes.foldLeft(text) { case (c, (re, tok)) => regexp_replace(c, re, tok) }

  /** Per-row PII match counts (non-overlapping, leftmost) per category. */
  def scanCols(text: Column): Seq[(String, Column)] = Seq(
    "n_email" -> regexp_count(text, lit(emailRe)),
    "n_phone" -> regexp_count(text, lit(phoneRe)),
    "n_ipv4" -> regexp_count(text, lit(ipv4Re)),
    "n_digit_run" -> regexp_count(text, lit(digitRunRe)))

  /** Corpus PII audit: per-group totals of each PII category plus the count
    * of rows containing any PII — the report that decides whether a source
    * is shippable. One projection + one map-side-combined hash aggregate. */
  def scanReport(df: DataFrame, textCol: String, groupCols: Seq[String])
      : DataFrame = {
    val withCounts = scanCols(col(textCol)).foldLeft(df) {
      case (d, (name, c)) => d.withColumn(name, c.cast("long"))
    }
    val catSums = scanCols(col(textCol)).map { case (name, _) =>
      sum(col(name)).cast("long").as(name)
    }
    val anyPii = sum(when(
      scanCols(col(textCol)).map { case (n, _) => col(n) > 0L }
        .reduce(_ || _), 1L).otherwise(0L)).cast("long").as("n_rows_with_pii")
    withCounts
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_rows"), (catSums :+ anyPii): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** Scrubbed projection of (id, text) — the corpus rewrite itself. */
  def redactRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), redact(col(textCol)).as("redacted"))
      .orderBy(idCol)
}
