package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hash kernels. The portable 60-bit hash is defined as the
  * first 15 hex chars of md5 interpreted as an integer (matching the DuckDB
  * oracle's `('0x'||substr(md5(x),1,15))::BIGINT`); these expressions
  * compute it straight from the digest bytes — no hex string, no `conv`
  * parse. Measured: the expression-pipeline formulation (HOF transform +
  * md5 + conv) costs ~16µs per shingle; the native pass is ~0.5µs.
  * CodegenFallback is fine here — all the work is inside one JVM call. */
object TextHash {
  /** Per-thread digest: one expression instance can be evaluated from many
    * threads (broadcast reuse, driver-side folding concurrent with tasks),
    * and MessageDigest is mutable — a shared instance would interleave. */
  private val tlMd: ThreadLocal[MessageDigest] = ThreadLocal.withInitial(
    () => MessageDigest.getInstance("MD5"))
  def localMd(): MessageDigest = tlMd.get()

  /** First 60 bits of md5(s): big-endian first 8 bytes >>> 4. */
  def hash60(md: MessageDigest, bytes: Array[Byte]): Long = {
    val d = md.digest(bytes)
    val hi =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    hi >>> 4
  }
}

/** hash60(string) as a single native call. */
case class Hash60(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hash60 expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    TextHash.hash60(TextHash.localMd(), v.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildInternal(c: Expression): Hash60 = copy(child = c)
}

/** Sorted distinct hash60 values of the space-joined word n-grams — the
  * whole shingle pipeline (n-gram formation, hashing, dedup, sort) in one
  * native pass per row. Semantics identical to
  * `array_sort(array_distinct(transform(shingles(words,n), hash60)))`. */
case class ShingleHashSet60(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash_set expects array<string>, got ${t.simpleString}")
  }

  private val space = Array[Byte](' ')

  override def nullSafeEval(v: Any): Any = {
    val md = TextHash.localMd()
    val words = v.asInstanceOf[ArrayData]
    val nw = words.numElements()
    if (nw < n) return new GenericArrayData(Array.empty[Long])
    val raw = new Array[Long](nw - n + 1)
    var i = 0
    while (i <= nw - n) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(space)
        md.update(words.getUTF8String(i + j).getBytes)
        j += 1
      }
      val d = md.digest()
      val hi =
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      raw(i) = hi >>> 4
      i += 1
    }
    java.util.Arrays.sort(raw)
    // in-place dedup of the sorted array
    var w = 0; var r = 0
    while (r < raw.length) {
      if (w == 0 || raw(r) != raw(w - 1)) { raw(w) = raw(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(raw, w))
  }

  override protected def withNewChildInternal(c: Expression): ShingleHashSet60 =
    copy(child = c)
}

/** POSITIONAL hash60 values of every w-token window (stride 1) — the span
  * kernel behind substring-level dedup. Unlike [[ShingleHashSet60]] this
  * keeps one hash PER POSITION, unsorted and undeduplicated: occurrence
  * counts matter for duplicate-span statistics (a span repeated inside
  * one doc is still repetition). Semantics identical to
  * `transform(sequence(0, size(words)-w), i -> hash60(concat_ws(" ",
  * slice(words, i+1, w))))`, but one native pass — the lambda version
  * re-inlines the words expression per element under projection collapse
  * (the O(tokens·split) trap the README documents). */
case class SpanHashes60(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(w >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"span_hashes expects array<string>, got ${t.simpleString}")
  }

  private val space = Array[Byte](' ')

  override def nullSafeEval(v: Any): Any = {
    val md = TextHash.localMd()
    val words = v.asInstanceOf[ArrayData]
    val nw = words.numElements()
    if (nw < w) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](nw - w + 1)
    var i = 0
    while (i <= nw - w) {
      md.reset()
      var j = 0
      while (j < w) {
        if (j > 0) md.update(space)
        md.update(words.getUTF8String(i + j).getBytes)
        j += 1
      }
      val d = md.digest()
      val hi =
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      out(i) = hi >>> 4
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): SpanHashes60 =
    copy(child = c)
}

/** k-permutation MinHash signature of a 60-bit shingle-hash set in ONE pass:
  * sig[i] = min over sh of ((sh mod p)·(2i+1) + (i·40503 mod p)) mod p.
  * Identical values to the explode → k flat `min()` aggregates formulation
  * (all arithmetic stays below 2³⁹, so plain long ops never overflow), but
  * with no explode, no shuffle, and each shingle's k permutations computed
  * in a tight register loop — the signature becomes a map-side projection,
  * which is the shape that matters when the corpus is 100 TB and the
  * signature stage would otherwise shuffle |docs|·|shingles| rows. */
case class MinHashSig(child: Expression, k: Int, p: Long)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && p > 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val sh = v.asInstanceOf[ArrayData]
    val n = sh.numElements()
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, p)
    var j = 0
    while (j < n) {
      val h = sh.getLong(j) % p
      var i = 0
      while (i < k) {
        val m = (h * (2L * i + 1) + (i.toLong * 40503L) % p) % p
        if (m < sig(i)) sig(i) = m
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** Per-document repetition counts (the Gopher repetition-filter family —
  * Rae et al. '21 Table A1 measures a document's fraction of characters
  * covered by its most common word/n-gram and by duplicated n-grams) in
  * ONE native pass over the word array. Returns integer numerators plus
  * the char total so the caller forms fractions as exact-integer
  * divisions (cross-engine bit-identical):
  *
  *   struct(total_chars,           Σ len(word)
  *          top_word_chars,        count·len of the most frequent word
  *          dup_word_chars,        Σ count·len over words with count>1
  *          top_bigram_chars,      count·content-len of the top bigram
  *          top_trigram_chars)     count·content-len of the top trigram
  *
  * Ties break lexicographically smallest (ASCII corpus — same order in
  * DuckDB). Content length of an n-gram excludes the joining spaces. A
  * map-side projection: the whole filter runs with zero shuffles at any
  * corpus size. */
case class RepetitionCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("total_chars", LongType, nullable = false),
    StructField("top_word_chars", LongType, nullable = false),
    StructField("dup_word_chars", LongType, nullable = false),
    StructField("top_bigram_chars", LongType, nullable = false),
    StructField("top_trigram_chars", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"repetition_counts expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[ArrayData]
    val n = words.numElements()
    val w = new Array[String](n)
    var totalChars = 0L
    var i = 0
    while (i < n) {
      w(i) = words.getUTF8String(i).toString
      totalChars += w(i).length
      i += 1
    }
    // top REPEATED gram = max by (count, then lexicographically smallest)
    // among grams occurring >= 2 times (a gram seen once is not
    // repetition — without this floor every short all-distinct doc would
    // "repeat" its longest gram); value = count * content chars, 0 if
    // nothing repeats
    def top(counts: java.util.HashMap[String, Int],
        contentLen: String => Int): Long = {
      var bestGram: String = null
      var bestCnt = 1
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        if (c > bestCnt || (c == bestCnt && bestGram != null &&
            e.getKey.compareTo(bestGram) < 0)) {
          bestGram = e.getKey; bestCnt = c
        }
      }
      if (bestGram == null) 0L else bestCnt.toLong * contentLen(bestGram)
    }
    val wc = new java.util.HashMap[String, Int]()
    i = 0
    while (i < n) { wc.merge(w(i), 1, Integer.sum _); i += 1 }
    var dupWordChars = 0L
    val wit = wc.entrySet().iterator()
    while (wit.hasNext) {
      val e = wit.next()
      if (e.getValue > 1) dupWordChars += e.getValue.toLong * e.getKey.length
    }
    def gramCounts(k: Int): java.util.HashMap[String, Int] = {
      val m = new java.util.HashMap[String, Int]()
      var j = 0
      while (j + k <= n) {
        val sb = new java.lang.StringBuilder(w(j))
        var l = 1
        while (l < k) { sb.append(' ').append(w(j + l)); l += 1 }
        m.merge(sb.toString, 1, Integer.sum _)
        j += 1
      }
      m
    }
    org.apache.spark.sql.catalyst.InternalRow(
      totalChars,
      top(wc, _.length),
      dupWordChars,
      top(gramCounts(2), g => g.length - 1),
      top(gramCounts(3), g => g.length - 2))
  }

  override protected def withNewChildInternal(c: Expression): RepetitionCounts =
    copy(child = c)
}

/** Unicode NFC normalization (canonical composition) as one native call —
  * byte-level dedup, hashing, and equality see a single representation per
  * grapheme ("e"+U+0301 and "é" hash identically after this). Fast path:
  * `Normalizer.isNormalized` is a scan with no allocation, and real corpora
  * are overwhelmingly already NFC, so the common case returns the input
  * string untouched. Matches DuckDB's `nfc_normalize` (both implement
  * Unicode canonical composition). CodegenFallback for the same reason as
  * Hash60: the work is one JVM library call. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) v
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

/** 60-bit SimHash of a word array in ONE pass (OPTIMIZATION r17, guide
  * §2.4): bit j of the result is set iff Σ over words of ±1 — +1 when bit
  * j of hash60(word) is set, −1 otherwise — is strictly positive.
  * Identical values to the explode → 60 flat `sum(when(...))` aggregates
  * formulation (duplicate words vote once per occurrence, exactly as the
  * exploded rows did), but with no explode and no shuffle: the signature
  * becomes a map-side projection, the same shape migration [[MinHashSig]]
  * made for the minhash family. The 60 vote counters live in one int
  * array updated in a register loop per word hash. */
case class SimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val ws = v.asInstanceOf[ArrayData]
    val n = ws.numElements()
    val votes = new Array[Int](60)
    val md = TextHash.localMd()
    var i = 0
    while (i < n) {
      val h = TextHash.hash60(md, ws.getUTF8String(i).getBytes)
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) != 0L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimHash60 =
    copy(child = c)
}

object TextExpressions {
  import org.apache.spark.sql.GraftBridge
  def hash60(s: Column): Column = GraftBridge.column(Hash60(GraftBridge.expression(s)))
  def simHash60(words: Column): Column =
    GraftBridge.column(SimHash60(GraftBridge.expression(words)))
  def nfc(s: Column): Column = GraftBridge.column(NfcNormalize(GraftBridge.expression(s)))
  def shingleHashSet60(words: Column, n: Int): Column =
    GraftBridge.column(ShingleHashSet60(GraftBridge.expression(words), n))
  def spanHashes60(words: Column, w: Int): Column =
    GraftBridge.column(SpanHashes60(GraftBridge.expression(words), w))
  def minHashSig(sh: Column, k: Int, p: Long): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(sh), k, p))
  def repetitionCounts(words: Column): Column =
    GraftBridge.column(RepetitionCounts(GraftBridge.expression(words)))
}
