package graft

import org.apache.spark.sql.functions._
import graft.operators.{Collection, Quantization, Search}

/** Binary (sign-bit) quantization: bit layout, Hamming scoring, and the
  * two-phase search's agreement with exact search at high oversampling. */
class BinaryQuantizationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Collection.load(spark, sf001).cache()

  test("signPack sets exactly the bits of strictly-positive dims (incl. 63)") {
    val v = Array.fill(64)(-1.0d)
    v(0) = 1.0; v(5) = 0.5; v(63) = 2.0
    val z = Array.fill(64)(0.0d) // zeros are NOT positive -> sig 0
    val df = Seq((v.toSeq, z.toSeq)).toDF("v", "z")
    val (sv, sz) = df.select(
      Quantization.signPack($"v"), Quantization.signPack($"z"))
      .as[(Long, Long)].head()
    assert(sv == ((1L << 0) | (1L << 5) | (1L << 63)))
    assert(sz == 0L)
  }

  test("hammingScore: 64 for identical signs, 0 for opposite") {
    val a = Seq.fill(64)(1.0d)
    val b = Seq.fill(64)(-1.0d)
    val df = Seq((a, a, b)).toDF("x", "y", "n")
    val (same, opp) = df.select(
      Quantization.hammingScore(
        Quantization.signPack($"x"), Quantization.signPack($"y")),
      Quantization.hammingScore(
        Quantization.signPack($"x"), Quantization.signPack($"n")))
      .as[(Int, Int)].head()
    assert(same == 64 && opp == 0)
  }

  test("binary two-phase: self on top, high recall at generous oversampling") {
    // 1-bit signs at 64 dims are coarse: exact top-k equality is NOT the
    // contract (unlike int8); the contract is self-match + strong recall.
    val q = points.filter($"id" === 0).select($"embedding".as("qemb"))
    val exact = Search.knn(points, q, k = 5, threshold = -1.0)
      .select("id").as[Long].collect().toSeq
    val binary = Quantization.binaryTwoPhaseSearch(points, q, k = 5,
      oversample = 10.0).select("id").as[Long].collect().toSeq
    assert(binary.head == 0L, "self vector must rank first")
    val recall = (binary.toSet intersect exact.toSet).size
    assert(recall >= 4, s"recall@5 $recall/5 too low: $binary vs $exact")
  }
}
