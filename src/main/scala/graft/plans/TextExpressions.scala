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

object TextExpressions {
  import org.apache.spark.sql.GraftBridge
  def hash60(s: Column): Column = GraftBridge.column(Hash60(GraftBridge.expression(s)))
  def shingleHashSet60(words: Column, n: Int): Column =
    GraftBridge.column(ShingleHashSet60(GraftBridge.expression(words), n))
  def minHashSig(sh: Column, k: Int, p: Long): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(sh), k, p))
}
