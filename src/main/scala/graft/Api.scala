package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Collection, Search}

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

  /** Validated ingest (reference POST /vectors/add_batch → S5): rows of
    * (id?, vector, user_id, ts, metadata). Vectors are L2-normalized on
    * ingest; missing ids are derived deterministically from
    * (user_id, ts, vector hash) — the engine's reproducible stand-in for
    * the reference's uuid4 (src/core/qdrant_client.py:205-206); re-adds of
    * an existing id replace via last-write-wins upsert. Rejects the WHOLE
    * batch when any row has a missing/empty vector (schemas.py min_items=1
    * fails the request, not the row) — no partial silent ingestion. */
  def addVectors(current: DataFrame, adds: DataFrame): DataFrame = {
    // Materialize the batch ONCE before validating: the validation count
    // and the subsequent ingest pass read the same snapshot (a
    // non-deterministic source can't pass validation then ingest different
    // rows), and a deterministic source isn't scanned twice.
    val batch = adds.localCheckpoint()
    val bad = batch.filter(col("embedding").isNull || size(col("embedding")) < 1).count()
    require(bad == 0L,
      s"batch rejected: $bad row(s) with empty embedding (min_items=1)")
    val withIds = batch
      .withColumn("id",
        when(col("id").isNull,
          graft.functions.TextOps.hash60(concat_ws("_",
            col("user_id"), col("ts"), hash(col("embedding")))))
          .otherwise(col("id")))
    val normalized = Collection.withNormalized(withIds)
      .drop("embedding").withColumnRenamed("nemb", "embedding")
      .select(current.columns.map(col): _*)
    Collection.upsert(current, normalized)
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
