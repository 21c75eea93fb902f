package graft

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Search

/** Argument-validated entry points mirroring the reference's request-schema
  * constraints (Q4/S8: src/api/schemas.py:61-72 — k ∈ [1,100], score
  * threshold ∈ [0,1], non-empty embedding). The engine operators themselves
  * accept wider ranges (internal callers use sentinel thresholds); this is
  * the user-facing surface where the reference's API contract is enforced. */
object Api {

  val MaxK = 100 // schemas.py:64 le=100
  val DefaultThreshold = 0.65 // settings.similarity_threshold

  def validateK(k: Int): Unit =
    require(k >= 1 && k <= MaxK, s"k must be in [1, $MaxK], got $k")

  def validateThreshold(t: Double): Unit =
    require(t >= 0.0 && t <= 1.0, s"score_threshold must be in [0, 1], got $t")

  /** Validated top-k search (reference POST /vectors/search). */
  def search(points: DataFrame, queryDf: DataFrame, k: Int = 10,
      scoreThreshold: Option[Double] = None,
      userFilter: Option[Column] = None): DataFrame = {
    validateK(k)
    val t = scoreThreshold.getOrElse(DefaultThreshold)
    validateThreshold(t)
    Search.knn(points, queryDf, k, t, userFilter)
  }

  /** Validated batched search. */
  def searchBatch(points: DataFrame, queries: DataFrame, k: Int = 10,
      scoreThreshold: Option[Double] = None): DataFrame = {
    validateK(k)
    val t = scoreThreshold.getOrElse(DefaultThreshold)
    validateThreshold(t)
    Search.knnBatch(points, queries, k, t)
  }
}
