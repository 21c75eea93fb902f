package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernels for the large-scale training-data pipeline
  * operators (language id, quality scoring, token counting, fingerprinting,
  * shingling for MinHash/SimHash dedup).
  *
  * All kernels are Catalyst higher-order-function expressions (no UDFs) and
  * are deliberately restricted to primitives with identical semantics in
  * DuckDB (md5, regexp_extract_all, integer arithmetic) so every operator is
  * oracle-checkable. Cross-engine hash: 60-bit int from the md5 hex prefix —
  * `conv(substr(md5(x),1,15),16,10)` here, `('0x'||substr(md5(x),1,15))::BIGINT`
  * in DuckDB.
  */
object TextOps {

  /** Whitespace word split (fixture texts are single-space separated). */
  def words(text: Column): Column = split(text, " ")

  /** Regex word tokens, lowercase alnum runs. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** Portable 60-bit hash of a string (md5 hex prefix → BIGINT), computed
    * natively from the digest bytes ([[graft.plans.Hash60]]). */
  def hash60(s: Column): Column = graft.plans.TextExpressions.hash60(s)

  /** Distinct word n-gram shingles, space-joined. Empty array when the doc
    * has fewer than n words (guards Spark's descending `sequence`). */
  def shingles(ws: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(ws) - n),
      i => concat_ws(" ", (0 until n).map(o => element_at(ws, i + o + 1)): _*))
    when(size(ws) >= n, array_distinct(grams)).otherwise(array().cast("array<string>"))
  }

  /** Exact Jaccard similarity of two distinct-element arrays, in DOUBLE. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)).cast("double"), lit(1.0d))

  /** Sorted distinct 60-bit hashes of the n-gram shingles — the compact
    * set representation for the Jaccard kernels: long compares instead of
    * string compares, and sortedness enables the codegen'd merge-walk
    * intersection ([[graft.plans.SortedLongIntersectCount]]). Collision
    * probability within a doc's shingle set is ~|S|²/2^61 — negligible,
    * and the DuckDB oracle hashes identically so results always agree. */
  def shingleHashSet(ws: Column, n: Int): Column =
    graft.plans.TextExpressions.shingleHashSet60(ws, n)

  /** Jaccard from an intersection count and the two set sizes. */
  def jaccardFromCount(c: Column, sa: Column, sb: Column): Column =
    c.cast("double") / greatest((sa + sb - c).cast("double"), lit(1.0d))

  /** MinHash signature: k permutations h_i(s) = (a_i·base + b_i) mod p over
    * portable 60-bit base hashes (pass `transform(shingles, hash60)` as
    * `baseHashes` via a materialized column so md5 runs once per shingle).
    * Classic shingle→minhash construction (Broder '97). */
  val MinHashP = 2147483647L // 2^31 - 1
  def minHash(baseHashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i => {
      val a = i * 2 + 1
      val b = pmod(i * lit(40503L), lit(MinHashP))
      aggregate(baseHashes, lit(MinHashP),
        (acc, h) => least(acc, pmod(a * pmod(h, lit(MinHashP)) + b, lit(MinHashP))))
    })

  /** LSH band signatures: split a minhash signature into `bands` bands of
    * `rows` values, hash each band to one string key. */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      md5(concat_ws("_",
        (0 until rows).map(r => element_at(sig, b * rows + r + 1)): _*)))

  /** Literal array of 2^0..2^59 — bit probes usable inside HOF lambdas
    * (Spark's shiftright/shiftleft only accept literal Int shifts). */
  private def pow2: Column =
    typedlit((0 until 60).map(j => 1L << j))

  /** 60-bit SimHash of a word multiset given per-word 60-bit hashes
    * (Charikar '02): bit j of the result is 1 iff the +1/-1 vote sum over
    * words' j-th bits is positive. */
  def simHash60(wordHashes: Column): Column = {
    val bits = transform(sequence(lit(0), lit(59)), j =>
      when(
        aggregate(wordHashes, lit(0L), (acc, h) =>
          acc + when(h.bitwiseAND(element_at(pow2, j + 1)) =!= 0L, 1L).otherwise(-1L)
        ) > 0L, 1L).otherwise(0L))
    // pack MSB-first: acc*2 + bit_j for j = 59..0
    aggregate(sequence(lit(59), lit(0), lit(-1)), lit(0L),
      (acc, j) => acc * 2L + element_at(bits, j + 1))
  }

  /** Hamming distance between two packed 60-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** 15-bit chunk `i` (0..3) of a 60-bit simhash — the banding key for
    * Hamming-radius-3 search: if two hashes differ in <=3 bits, at least one
    * of the 4 chunks is identical (pigeonhole), so chunk-equality candidate
    * generation has EXACT recall at radius 3. */
  def simChunk(h: Column, i: Int): Column =
    shiftright(h, i * 15).bitwiseAND(lit(0x7fffL))

  /** Rolling polynomial fingerprint over the word sequence:
    * fold (acc*31 + hash60(word)) mod 1e9+7. Order-sensitive — distinguishes
    * permuted docs that bag-of-words signatures collapse. */
  val FingerprintP = 1000000007L
  def rollingFingerprint(wordHashes: Column): Column =
    aggregate(wordHashes, lit(0L),
      (acc, h) => pmod(acc * 31L + pmod(h, lit(FingerprintP)), lit(FingerprintP)))

  /** Canonical bag-of-words key: md5 of the sorted distinct word list —
    * the exact-dedup group key robust to word order/repetition. */
  def bagOfWordsKey(ws: Column): Column =
    md5(concat_ws("|", array_sort(array_distinct(ws))))

  /** Per-language stopword hit count (dictionaries are engine constants). */
  val StopwordDicts: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "in", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ein", "zu", "von"),
    "es" -> Seq("el", "la", "de", "los", "y", "en", "que"),
    "fr" -> Seq("le", "la", "de", "les", "et", "en", "une"))

  def stopwordHits(ws: Column, dict: Seq[String]): Column =
    size(filter(ws, w => w.isin(dict: _*)))
}
