package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextOps, VectorOps}

/** The engine's "collection" — the Spark-native equivalent of the reference's
  * single mutable Qdrant collection of points
  * (reference: src/core/qdrant_client.py:60-151).
  *
  * A point row is `(id, embedding[normalized], user_id, ts, metadata...)`
  * (reference payload model: src/core/qdrant_client.py:208-213). Vectors are
  * always L2-normalized on ingest (src/core/qdrant_client.py:199-202,267-269),
  * which reduces cosine search to a dot product.
  *
  * Mutation semantics over immutable storage:
  *  - upsert = last-write-wins keyed on `id` (Qdrant `client.upsert`,
  *    src/core/qdrant_client.py:223-227) → window dedup on (id) by ts desc.
  *  - delete = anti-filter rewrite; predicate deletes return the TRUE count
  *    (the reference fakes the count from `operation_id` —
  *    src/core/qdrant_client.py:461 — the API spec promises the real one).
  *
  * Scale notes: the dedup window shuffles on `id` (hash partition — even
  * distribution, no skew since ids are unique); deletes are full scans that
  * Catalyst reduces to parquet-pushed predicate filters. At 100 TB, upserts
  * compact per partition; ids are uniformly distributed so no salting needed.
  */
object Collection {

  /** Load the test fixture `embeddings.parquet` as a collection view:
    * id = vec_id, user_id = label (the payload-field stand-in — FIXTURES.md),
    * ts = vec_id (deterministic "insertion time"), embedding normalized.
    */
  def load(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
    withNormalized(raw)
      .select(
        col("vec_id").as("id"),
        col("nemb").as("embedding"),
        col("label").as("user_id"),
        col("vec_id").cast("double").as("ts"))
  }

  /** Extended collection view carrying all five payload-indexed fields the
    * reference declares (src/core/advanced_indexing.py:50-99): user_id
    * (keyword), ts (datetime stand-in), confidence_score (float),
    * face_quality (integer), enrollment_group (keyword). The fixture only
    * carries (vec_id, label), so the three extra fields are derived
    * deterministically from the portable 60-bit hash of the id — any engine
    * (including the DuckDB oracle) rebuilds identical payload values.
    * Pure projections: the derivation adds no shuffle, and predicates over
    * these columns stay pushable/prunable like any scan column. */
  def loadWithPayload(spark: SparkSession, sfDir: String): DataFrame = {
    def h(tag: String) =
      TextOps.hash60(concat(lit(tag), col("id").cast("string")))
    load(spark, sfDir)
      .withColumn("confidence_score",
        round(pmod(h("conf_"), lit(1000000L)).cast("double") / 1e6, 6))
      .withColumn("face_quality", pmod(h("fq_"), lit(100L)).cast("int"))
      .withColumn("enrollment_group",
        concat(lit("grp_"), pmod(h("eg_"), lit(5L)).cast("string")))
  }

  /** The full §1.4 payload model on the collection view itself: the TYPED
    * payload-indexed columns ([[loadWithPayload]]) AND the open
    * schemaless `metadata` map carrying the same fields as strings — the
    * engine analogue of Qdrant points holding an arbitrary JSON payload
    * next to the indexed fields (src/core/qdrant_client.py:208-213).
    * Map access (`element_at`) is a pure projection; predicates over the
    * typed twins stay scan-pushable, which is why a real store indexes
    * the hot fields and leaves the map open. */
  def loadWithMeta(spark: SparkSession, sfDir: String): DataFrame =
    loadWithPayload(spark, sfDir)
      .withColumn("metadata", map(
        lit("confidence_score"), col("confidence_score").cast("string"),
        lit("face_quality"), col("face_quality").cast("string"),
        lit("enrollment_group"), col("enrollment_group")))

  /** Add a `nemb` (normalized DOUBLE embedding) column, evaluating the norm
    * once per row. Ingest-path analogue of reference V1/V2 normalize. */
  def withNormalized(df: DataFrame, embCol: String = "embedding"): DataFrame =
    df.withColumn("nemb", graft.plans.VectorExpressions.normalizeL2(col(embCol)))

  /** Last-write-wins upsert: union current points with new points and keep,
    * per id, the row with the highest (ts, isNew) — mirrors Qdrant upsert
    * replacing same-id points (src/core/qdrant_client.py:223-227,291-296).
    * Shuffles once on `id`.
    */
  def upsert(current: DataFrame, adds: DataFrame): DataFrame = {
    val unioned = current.withColumn("_gen", lit(0))
      .unionByName(adds.withColumn("_gen", lit(1)))
    val w = Window.partitionBy("id").orderBy(desc("ts"), desc("_gen"))
    unioned.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_gen")
  }

  /** Delete by point id (reference D1: src/core/qdrant_client.py:407-432). */
  def deleteById(df: DataFrame, id: Column): DataFrame =
    df.filter(not(col("id") === id))

  /** Predicate delete (reference D2: src/core/qdrant_client.py:434-469).
    * Returns the surviving rows; pair with a count of the removed set for
    * the true deleted_count the API spec promises (api_spec.md:108-114).
    * Rows where the predicate evaluates to NULL (e.g. a null payload field)
    * do NOT match the delete and must survive, so the kept set is
    * "NOT definitively true" rather than SQL `NOT pred`. */
  def deleteWhere(df: DataFrame, pred: Column): DataFrame =
    df.filter(not(coalesce(pred, lit(false))))

  /** Keyset-paginated scroll over the collection — the vector-DB "scroll"
    * read path (list points matching a filter, `limit` at a time, resuming
    * from a cursor). The cursor is the composite sort key of the LAST row of
    * the previous page, so each page is `WHERE key > cursor ORDER BY key
    * LIMIT n`: a parquet-pushed range predicate + TakeOrderedAndProject.
    * OFFSET pagination would re-scan and re-sort every preceding page —
    * keyset pagination is the only shape that survives 100 TB (page cost is
    * independent of how deep the scroll is, and with id-sorted files the
    * range predicate prunes row groups).
    * Cursor semantics: strictly-after `(afterTs desc, afterId asc)` — rows
    * with ts < afterTs, or ts = afterTs and id > afterId. */
  def scroll(
      points: DataFrame,
      limit: Int,
      afterTs: Option[Double] = None,
      afterId: Option[Long] = None,
      pred: Option[Column] = None): DataFrame = {
    // plain filter(p): NULL-evaluating rows already don't match (filter
    // keeps only TRUE), and a bare predicate reaches the parquet scan as
    // PushedFilters — a coalesce(p, false) wrapper is semantically
    // identical here but untranslatable for pushdown, which would cost
    // the row-group pruning this scroll exists for
    val base = pred.map(points.filter).getOrElse(points)
    val cursored = (afterTs, afterId) match {
      case (Some(t), Some(i)) =>
        base.filter(col("ts") < t || (col("ts") === t && col("id") > i))
      case (Some(t), None) => base.filter(col("ts") < t)
      case _ => base
    }
    cursored
      .orderBy(desc("ts"), asc("id"))
      .limit(limit)
      .select(col("id"), col("user_id"), col("ts"))
  }

  /** Keyset scroll ordered by an arbitrary (payload) field — the public
    * order_by scroll API. Deterministic (field DESC, id ASC) pagination;
    * the cursor is the last row's (field value, id) and the next page is a
    * PUSHED range predicate, never OFFSET (OFFSET at 100 TB re-reads
    * everything before the page; a keyset cursor reads only rows past it,
    * and a store sorted on the field skips whole row groups). */
  def scrollOrderedBy(
      points: DataFrame,
      field: String,
      limit: Int,
      afterVal: Option[Double] = None,
      afterId: Option[Long] = None,
      pred: Option[Column] = None): DataFrame = {
    // bare filter(p), not coalesce(p, false): same NULL-doesn't-match
    // semantics, but pushdown-translatable (see scroll)
    val base = pred.map(points.filter).getOrElse(points)
    val cursored = (afterVal, afterId) match {
      case (Some(v), Some(i)) =>
        base.filter(col(field) < v || (col(field) === v && col("id") > i))
      case (Some(v), None) => base.filter(col(field) < v)
      case _ => base
    }
    cursored
      .orderBy(desc(field), asc("id"))
      .limit(limit)
      .select(col("id"), col("user_id"), col(field))
  }

  /** Filtered exact count — the vector-DB "count points matching a filter"
    * endpoint. NULL-evaluating predicates don't match (same tri-state rule
    * as deleteWhere). One map-side-combined aggregate; at 100 TB this is a
    * pushed-filter scan + count-star partial agg, no wide row ever built. */
  def countWhere(points: DataFrame, pred: Column): DataFrame =
    points.agg(
      sum(when(coalesce(pred, lit(false)), 1L).otherwise(0L)).cast("long")
        .as("match_count"),
      count("*").cast("long").as("total_count"))

  /** Facet counts: the distinct values of a payload field among points
    * matching a filter, with per-value counts, top `topN` by count.
    * One hash aggregate on the facet field + TakeOrderedAndProject — the
    * same plan at any scale (value cardinality, not row count, bounds the
    * shuffle). */
  def facet(points: DataFrame, field: String, pred: Column, topN: Int): DataFrame =
    points
      .filter(pred) // NULL doesn't match; bare pred stays pushdown-translatable
      .groupBy(col(field).as("facet_value"))
      .agg(count("*").cast("long").as("n"))
      .orderBy(desc("n"), asc("facet_value"))
      .limit(topN)

  /** Payload update — the vector-DB "set_payload" mutation: merge
    * `updates` into the map-typed payload of every point matching `pred`
    * (last-write-wins per key), leaving non-matching rows untouched.
    * Implemented as remove-then-concat (`map_filter` out the updated keys,
    * then `map_concat`), which is independent of the session's
    * map-key-dedup policy. A pure projection: no shuffle at any scale, and
    * in a MERGE-on-read layout only matching partitions rewrite. */
  def setPayload(
      points: DataFrame, pred: Column, updates: Map[String, String],
      metaCol: String = "meta"): DataFrame = {
    val updateKeys = array(updates.keys.toSeq.sorted.map(lit): _*)
    val updateMap = map(updates.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    // coalesce: a matching row with a NULL payload map receives the updates
    // map (map_filter/map_concat over NULL would otherwise yield NULL and
    // silently drop the update).
    points.withColumn(metaCol,
      when(coalesce(pred, lit(false)),
        map_concat(
          map_filter(coalesce(col(metaCol), typedlit(Map.empty[String, String])),
            (k, _) => !array_contains(updateKeys, k)),
          updateMap))
        .otherwise(col(metaCol)))
  }

  /** Collection stats rollup (reference A1/A2:
    * src/core/qdrant_client.py:471-520): point count, user count, per-user
    * distribution moments, embedding norm sanity. */
  def stats(points: DataFrame): DataFrame = {
    val perUser = points.groupBy("user_id").agg(count("*").as("n"))
    perUser.agg(
      sum("n").cast("long").as("total_points"),
      count("*").cast("long").as("distinct_users"),
      round(avg("n"), 6).as("avg_points_per_user"),
      max("n").cast("long").as("max_points_per_user"),
      min("n").cast("long").as("min_points_per_user"))
  }
}
