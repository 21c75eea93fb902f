package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Collection, Quantization, Search}

/** Bench-scale recall measurement: recall@k of each approximate search path
  * (IVF, multi-probe sign-LSH, binary-quantized two-phase) against exact
  * brute force, averaged over a deterministic query sample. Emitted with
  * every bench run so index-parameter changes can't silently collapse
  * recall while looking like a speedup — the measurement the reference's
  * performance suite reports as its accuracy claim
  * (PERFORMANCE_OPTIMIZATION_GUIDE.md:89, scripts/performance_test.py
  * recall section). */
object RecallReport {

  /** Mean recall@k per method over `nQueries` evenly-spread stored vectors. */
  def report(spark: SparkSession, sfDir: String,
      nQueries: Int = 8, k: Int = 10): Map[String, Double] = {
    val points = Collection.load(spark, sfDir).cache()
    try {
      val n = points.count()
      val qids = (0 until nQueries).map(i => i * (n / nQueries))
      val cents = Ann.seedCentroids(points, 16)
      val assigned = Ann.ivfAssign(points, cents).cache()
      // 12 hyperplane directions = stored vectors (same index parameters as
      // the registered ann_lsh_multiprobe query)
      val hps = points.filter(col("id") >= 100 && col("id") < 112)
        .orderBy("id").select("embedding").collect()
        .map(_.getSeq[Double](0).toSeq).toSeq
      def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
        df.select("id").collect().map(_.getLong(0)).toSet
      val perQuery = qids.map { qid =>
        val q = points.filter(col("id") === qid).select(col("embedding").as("qemb"))
        val exact = ids(Search.knn(points, q, k, -1.0))
        def recall(approx: Set[Long]): Double =
          if (exact.isEmpty) 1.0 else (approx & exact).size.toDouble / exact.size
        Map(
          "ivf" -> recall(ids(Ann.ivfSearch(assigned, cents, q, nprobe = 4, k = k))),
          "lsh_multiprobe" -> recall(ids(Ann.lshSearchMultiProbe(points, q, hps, k))),
          "binary_quant" -> recall(ids(Quantization.binaryTwoPhaseSearch(points, q, k))),
          "int8_quant" -> recall(ids(Quantization.twoPhaseSearch(points, q, k))))
      }
      val out = perQuery.flatten.groupMapReduce(_._1)(_._2)(_ + _)
        .map { case (m, s) => m -> s / nQueries }
      assigned.unpersist()
      out
    } finally {
      points.unpersist()
    }
  }
}
