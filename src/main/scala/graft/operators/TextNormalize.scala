package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.TextExpressions

/** Unicode hygiene for LLM training corpora: NFC canonical composition,
  * control-character stripping, and an encoding-health report (replacement
  * characters, mojibake artifacts, control bytes, docs needing
  * recomposition). The reference has no text-normalization surface — this
  * is pipeline scope alongside [[Privacy]] and [[TextAnalysis]]: byte-level
  * dedup (exact, span, MinHash) and token counting are only sound when the
  * corpus has one byte representation per grapheme, and normalization is
  * the pass that guarantees it.
  *
  * Scale: every kernel here is a per-row projection (one native NFC call
  * plus regex passes) that fuses into the scan stage — no shuffle, no UDF;
  * the report is a single map-side-combined hash aggregate on low-
  * cardinality group keys. At 100 TB this runs at scan speed.
  */
object TextNormalize {

  /** C0 control characters except \t\n\r, plus DEL — the bytes that break
    * tokenizers and leak terminal escapes into training text. (Java and
    * DuckDB/RE2 both accept this \x-escape character class verbatim.) */
  val controlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** UTF-8-bytes-decoded-as-Latin-1 artifacts: Ã (0xC3) and Â (0xC2) are
    * the lead bytes of 2-byte UTF-8 sequences — but both are also
    * legitimate letters in real corpora ("SÃO", "Â"), so a bare
    * lead-char count over-reports. The signature requires the lead char
    * to be FOLLOWED by a Latin-1 char in the UTF-8 continuation-byte
    * range U+0080–U+00BF ("Ã©" = 0xC3 0xA9, the double-decode of "é");
    * a lead char before an ASCII letter ("SÃO") does not match. Two-digit
    * \xhh escapes mean the same code point in Java regex and RE2, so the
    * pattern is oracle-portable verbatim. */
  val mojibakeRe = "[\\xC3\\xC2][\\x80-\\xBF]"

  /** U+FFFD — what a decoder emits where bytes were unmappable. */
  val replacementChar = "�"

  /** Unicode NFC canonical composition ([[graft.plans.NfcNormalize]]):
    * "e"+COMBINING ACUTE → "é", one representation per grapheme. */
  def nfc(text: Column): Column = TextExpressions.nfc(text)

  /** Cleaned form of a text column: NFC-composed, control chars stripped. */
  def clean(text: Column): Column =
    regexp_replace(nfc(text), controlRe, "")

  /** The corpus rewrite itself: (id, cleaned) projection. */
  def cleanRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), clean(col(textCol)).as("cleaned"))
      .orderBy(idCol)

  /** Per-group encoding-health report: doc counts, docs whose bytes change
    * under NFC, and totals of replacement chars / mojibake lead chars /
    * control chars — the audit that decides whether a source needs a
    * re-decode before it is trainable. */
  def encodingReport(df: DataFrame, textCol: String,
      groupCols: Seq[String]): DataFrame = {
    val t = col(textCol)
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(when(nfc(t) =!= t, 1L).otherwise(0L)).cast("long")
          .as("n_nfc_changed"),
        sum(regexp_count(t, lit(replacementChar))).cast("long")
          .as("n_replacement"),
        sum(regexp_count(t, lit(mojibakeRe))).cast("long").as("n_mojibake"),
        sum(regexp_count(t, lit(controlRe))).cast("long").as("n_control"))
      .orderBy(groupCols.map(col): _*)
  }
}
