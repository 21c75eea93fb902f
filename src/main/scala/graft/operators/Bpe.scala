package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** One learned BPE merge rule: fuse adjacent symbols (`left`, `right`)
  * into `merged` = left+right. `pairCount` is the corpus-weighted
  * adjacency count that made this pair the step's argmax. */
final case class BpeMerge(step: Int, pair: String, merged: String, pairCount: Long)

/** Byte-pair-encoding tokenizer training and encoding over a
  * `documents(doc_id, text, ...)` table — the "train the tokenizer on the
  * corpus" step of an LLM data pipeline (Sennrich et al., ACL 2016;
  * reference repo has only a fixed regex token count,
  * `src/utils/performance.py` has no tokenizer at all — this is a
  * pipeline-completing addition, like dedup/sampling).
  *
  * Scale shape (the part that matters at 100 TB):
  *   - Training never touches the corpus more than ONCE: the only
  *     corpus-sized operation is the word-frequency aggregate
  *     ([[wordFreq]], one map-side-combined shuffle). The merge loop then
  *     iterates on that word-TYPE table (vocabulary-sized — millions of
  *     rows, not billions), weighting every pair count by the type's
  *     corpus frequency. Each step is one tiny groupBy + a 1-row argmax
  *     collect; the chosen rule is folded back into the cached type table.
  *   - Encoding is map-only: the learned rules are plan literals, each
  *     applied as a greedy left-to-right merge pass (a codegen'd
  *     `aggregate` fold — no UDF), per word, inside one projection. No
  *     shuffle, no join, no driver participation.
  *   - [[tokenFreq]] composes the two: fold the rules over the word-TYPE
  *     table and weight by type frequency — token statistics for the whole
  *     corpus at vocabulary cost.
  *
  * Determinism: argmax tiebreak is (count desc, pair string asc); the
  * merge pass is the exact Sennrich greedy left-to-right scan (correct on
  * symbol runs: `a a a a a` → `aa aa a`, NOT a naive string replace which
  * mis-associates runs). Both replay bit-for-bit in the DuckDB oracle via
  * `list_reduce` (see SparkEntry `bpe_train` / `bpe_token_freq`).
  *
  * Honest limit: the encode fold chains one pass per rule, so it is the
  * right plan for tens of rules (plan size is linear in rules). A
  * production 30k-merge vocabulary would move the loop into a single
  * custom Expression holding the rank table; the training side is
  * unchanged.
  */
object Bpe {

  /** "h e l l o </w>" — a word as space-joined single-char symbols with
    * the end-of-word marker as the final symbol. The corpus alphabet is
    * space-free words (TextOps.words), so ' ' is a safe symbol separator
    * and "</w>" a safe reserved symbol. */
  def symbolString(word: Column): Column =
    concat(regexp_replace(word, "(.)", "$1 "), lit("</w>"))

  /** Corpus word-frequency table (word, cnt) — the ONE corpus-sized pass
    * of training. */
  def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** One greedy left-to-right merge pass of rule (left, right) over a
    * space-joined symbol string: fold each symbol into the accumulator;
    * when the accumulator's LAST symbol is `left` and the incoming symbol
    * is `right`, replace that last symbol with left+right. This is
    * Sennrich's scan exactly — after `aa` is emitted for `a a`, the fused
    * token cannot re-merge with the next `a` in the same pass. */
  def mergePass(sym: Column, left: String, right: String): Column = {
    val merged = left + right
    aggregate(
      split(sym, " "),
      lit(""),
      (acc, t) => {
        val lastIsLeft = acc === lit(left) || endswith(acc, lit(" " + left))
        when(acc === lit(""), t)
          .when(lastIsLeft && t === lit(right),
            concat(acc.substr(lit(1), length(acc) - lit(left.length)), lit(merged)))
          .otherwise(concat(acc, lit(" "), t))
      })
  }

  private def mergeChain(sym: Column, merges: Seq[BpeMerge]): Column =
    merges.foldLeft(sym) { (c, m) =>
      val Array(l, r) = m.pair.split(" ", 2)
      mergePass(c, l, r)
    }

  /** Train up to `nMerges` BPE rules on the corpus. Returns the learned
    * rules in order; stops early if no adjacent pair is left (fully fused
    * vocabulary). Driver work per step is ONE collected row. */
  def train(docs: DataFrame, nMerges: Int): Seq[BpeMerge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    var vocab = wordFreq(docs)
      .select(symbolString(col("word")).as("sym"), col("cnt")).cache()
    val merges = ArrayBuffer.empty[BpeMerge]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val syms = split(col("sym"), " ")
      val best = vocab
        .select(col("cnt"), syms.as("s"))
        .where(size(col("s")) >= 2)
        .select(col("cnt"), explode(
          transform(sequence(lit(1), size(col("s")) - 1),
            j => concat(element_at(col("s"), j), lit(" "),
              element_at(col("s"), j + 1)))).as("pair"))
        .groupBy("pair").agg(sum("cnt").as("total"))
        .orderBy(desc("total"), asc("pair"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        val total = best(0).getLong(1)
        val m = BpeMerge(step, pair, pair.replace(" ", ""), total)
        merges += m
        val next = vocab
          .withColumn("sym", mergeChain(col("sym"), Seq(m))).cache()
        vocab.unpersist()
        vocab = next
        step += 1
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** [[train]] as a DataFrame (step, pair, merged, pair_count) — the
    * driver-verifiable merge table. */
  def trainDF(spark: SparkSession, docs: DataFrame, nMerges: Int): DataFrame = {
    import spark.implicits._
    train(docs, nMerges).toDF("step", "pair", "merged", "pair_count")
  }

  /** Encode the corpus with a learned rule list: adds `bpe_tokens`
    * (array of subword tokens, "</w>"-terminated per source word).
    * Map-only — rules are plan literals, the fold is codegen'd, no
    * shuffle at any scale. */
  def encode(docs: DataFrame, merges: Seq[BpeMerge]): DataFrame = {
    val encodedWords = transform(TextOps.words(col("text")),
      w => mergeChain(symbolString(w), merges))
    docs.withColumn("bpe_tokens",
      split(concat_ws(" ", encodedWords), " "))
  }

  /** Corpus token-frequency table (token, n) under a learned rule list,
    * computed at vocabulary cost: fold the rules over word TYPES and
    * weight by type frequency — never re-scans the corpus. Equals
    * exploding [[encode]]'s tokens over the full corpus (spec-asserted). */
  def tokenFreq(docs: DataFrame, merges: Seq[BpeMerge]): DataFrame =
    wordFreq(docs)
      .select(col("cnt"), mergeChain(symbolString(col("word")), merges).as("sym"))
      .select(col("cnt"), explode(split(col("sym"), " ")).as("token"))
      .groupBy("token").agg(sum("cnt").as("n"))
      .orderBy(desc("n"), asc("token"))
}
