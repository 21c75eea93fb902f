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

  test("trained SQ: full code range, layout-deterministic ranges, zero-range dims") {
    import graft.operators.{Collection, Quantization, Search}
    val points = Collection.load(spark, sf001).cache()
    def ranges(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      Quantization.sqTrainRanges(df).orderBy("dim")
        .select("hi").as[Double].collect().toSeq
    val his = ranges(points)
    assert(his == ranges(points.repartition(7)),
      "trained ranges depend on input partitioning")
    // trained codes use (nearly) the full ±127 range; the fixed ±1 scale
    // leaves most of the byte idle on unit-norm components
    def maxAbsCode(c: org.apache.spark.sql.Column): Int = points
      .select(org.apache.spark.sql.functions.aggregate(
        c, org.apache.spark.sql.functions.lit(0),
        (a, x) => org.apache.spark.sql.functions.greatest(a, abs(x))).as("m"))
      .agg(max($"m")).as[Int].head()
    val trainedMax = maxAbsCode(
      Quantization.sqEncodeTrained($"embedding", his))
    val fixedMax = maxAbsCode(Quantization.quantize($"embedding"))
    assert(trainedMax == 127, s"trained codes top out at $trainedMax")
    assert(fixedMax < 80,
      s"fixture no longer demonstrates the idle-range problem ($fixedMax)")
    // search contract: self first, recall parity with the untrained path
    val q = points.filter($"id" === 0).select($"embedding".as("qemb"))
    val exact = Search.knn(points, q, 10, -1.0)
      .select("id").as[Long].collect().toSet
    val trained = Quantization.sqTwoPhaseSearchTrained(points, q, his, 10)
      .select("id").as[Long].collect().toSeq
    assert(trained.head == 0L, "self vector must rank first")
    assert((trained.toSet intersect exact).size >= 8,
      s"trained-SQ recall too low: $trained")
    // a constant-zero dimension codes to 0, not NaN/div-by-zero
    val padded = points.select($"id", $"user_id",
      org.apache.spark.sql.functions.concat(
        $"embedding", org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit(0.0d))).as("embedding"))
    val hisP = ranges(padded)
    assert(hisP.last == 0.0)
    val codes = padded.select(Quantization.sqEncodeTrained(
        $"embedding", hisP).as("c"))
      .select(org.apache.spark.sql.functions.element_at($"c", 65))
      .distinct().as[Int].collect().toSeq
    assert(codes == Seq(0), s"zero-range dim must code to 0: $codes")
  }
}
