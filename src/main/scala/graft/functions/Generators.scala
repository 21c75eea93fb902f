package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.VectorExpressions

/** Deterministic synthetic-vector generators mirroring the reference's
  * seeded test-data producers (V7/V8: scripts/performance_test.py:41-71 —
  * `generate_normalized_embedding(seed)` via N(0,1)^d then normalize, and
  * `generate_similar_embedding(base, s)` = normalize(s·base + (1-s)·noise)).
  *
  * Distributed: one row per (seed) generated executor-side from pure column
  * expressions — no driver loop, scales to any count. Gaussians come from
  * Box-Muller over two portable uniform hashes, so the output is fully
  * deterministic given (seed, dim) — unlike `randn()` whose values depend
  * on partitioning. */
object Generators {

  /** Uniform (0,1] from a hash of (seed, dim index, stream). */
  private def u(seed: org.apache.spark.sql.Column, tag: String) =
    (pmod(TextOps.hash60(concat_ws("_", lit(tag), seed)), lit(1000000007L))
      .cast("double") + 1.0d) / 1000000008.0d

  /** `n` unit vectors of dimension `dim`, ids 0..n-1. */
  def normalizedEmbeddings(spark: SparkSession, n: Int, dim: Int): DataFrame = {
    val base = spark.range(n).select(col("id"))
    val gaussians = transform(sequence(lit(0), lit(dim - 1)), j => {
      val key = concat_ws("_", col("id"), j)
      val u1 = u(key, "u1"); val u2 = u(key, "u2")
      sqrt(lit(-2.0d) * log(u1)) * cos(lit(2.0d * math.Pi) * u2) // Box-Muller
    })
    base.select(col("id"),
      VectorExpressions.normalizeL2(gaussians).as("embedding"))
  }

  /** Perturbed near-duplicates: normalize(s·base + (1-s)·unit_noise) per
    * input row — the reference's recall-test generator. `points` must have
    * (id, embedding[normalized]). */
  def similarEmbeddings(points: DataFrame, similarity: Double): DataFrame = {
    val noise = transform(sequence(lit(0), size(col("embedding")) - 1), j => {
      val key = concat_ws("_", col("id"), j)
      val u1 = u(key, "n1"); val u2 = u(key, "n2")
      sqrt(lit(-2.0d) * log(u1)) * cos(lit(2.0d * math.Pi) * u2)
    })
    points
      .withColumn("_noise", VectorExpressions.normalizeL2(noise))
      .select(col("id"),
        VectorExpressions.normalizeL2(
          zip_with(col("embedding"), col("_noise"),
            (b, nz) => b * similarity + nz * (1.0d - similarity))).as("embedding"))
  }
}
