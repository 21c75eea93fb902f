package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Collection, Search}

/** Driver contract — one entry per implemented operator from SURVEY.md §2,
  * each with an equivalent DuckDB oracle over the same parquet tables.
  *
  * Determinism rules shared by both sides (SURVEY.md §7.4): vector math in
  * DOUBLE; scores rounded to 6 decimals before thresholds/ranking; every
  * output deterministically ordered with a unique tiebreak; aggregate
  * outputs rounded; Spark ints cast to match DuckDB result types.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_search")(spark, "/root/testdata/sf0.001")

  // ---- shared oracle SQL fragments -------------------------------------
  /** DuckDB CTE mirroring Collection.load: normalized DOUBLE embeddings,
    * id/user_id/ts promoted columns. */
  private val C =
    """c AS (
      |  SELECT vec_id AS id, label AS user_id, vec_id::DOUBLE AS ts,
      |         list_transform(embedding::DOUBLE[],
      |           x -> x / greatest(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 1e-12)) AS ne
      |  FROM embeddings
      |)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1: flagship exact top-k cosine search (self-query vec_id=0).
    "knn_search" -> ((s, dir) => {
      val points = Collection.load(s, dir)
      val q = points.filter(col("id") === 0).select(col("embedding").as("qemb"))
      Search.knn(points, q, k = 10, threshold = 0.1)
    }),
    // Q1+Q3: search with user equality pre-filter.
    "knn_search_filtered" -> ((s, dir) => {
      val points = Collection.load(s, dir)
      val q = points.filter(col("id") === 0).select(col("embedding").as("qemb"))
      Search.knn(points, q, k = 10, threshold = 0.0,
        preFilter = Some(col("user_id") === 5))
    }),
    // Batched top-k: 8 query vectors, per-query rank <= 5.
    "knn_batch" -> ((s, dir) => {
      val points = Collection.load(s, dir)
      val qs = points.filter(col("id") < 8)
        .select(col("id").as("query_id"), col("embedding").as("qemb"))
      Search.knnBatch(points, qs, k = 5, threshold = 0.1)
        .orderBy(col("query_id"), col("rank"))
    }),
    // Q8: weighted multi-vector fusion.
    "multi_vector_fusion" -> ((s, dir) => {
      val points = Collection.load(s, dir)
      val qs = points.filter(col("id") < 3).select(
        col("id").as("query_id"), col("embedding").as("qemb"),
        when(col("id") === 0, 1.0).when(col("id") === 1, 0.5)
          .otherwise(0.25).as("weight"))
      Search.multiVectorFusion(points, qs, k = 10, threshold = 0.1)
    }),
    // Q11 verify: best score within one user vs threshold.
    "face_verify" -> ((s, dir) => {
      val points = Collection.load(s, dir)
      val q = points.filter(col("id") === 0).select(col("embedding").as("qemb"))
      Search.verify(points, q, lit(5), threshold = 0.65)
    }),
    // Q11 detect: users ranked by best hit.
    "face_detect" -> ((s, dir) => {
      val points = Collection.load(s, dir)
      val q = points.filter(col("id") === 0).select(col("embedding").as("qemb"))
      Search.detect(points, q, k = 5, threshold = 0.1)
    }),
    // S4/S5/D3: last-write-wins upsert (re-add ids<10 under user 999).
    "upsert_lww" -> ((s, dir) => {
      val cur = Collection.load(s, dir)
      val adds = cur.filter(col("id") < 10)
        .withColumn("user_id", lit(999))
        .withColumn("ts", col("ts") + 10000.0)
      Collection.upsert(cur, adds)
        .filter(col("id") < 20)
        .select(col("id"), col("user_id"), col("ts"))
        .orderBy(col("id"))
    }),
    // D2: predicate delete returning the TRUE deleted count.
    "delete_by_user" -> ((s, dir) => {
      val points = Collection.load(s, dir)
      points.agg(
        sum(when(col("user_id") === 3, 1L).otherwise(0L)).cast("long")
          .as("deleted_count"),
        sum(when(col("user_id") === 3, 0L).otherwise(1L)).cast("long")
          .as("remaining_count"))
    }),
    // A1/A2: collection stats rollup.
    "collection_stats" -> ((s, dir) =>
      Collection.stats(Collection.load(s, dir))),
  )

  def oracleSql: Map[String, String] = Map(
    "knn_search" ->
      s"""WITH $C, q AS (SELECT ne AS qe FROM c WHERE id = 0),
         |s AS (SELECT c.id, round(list_dot_product(c.ne, q.qe), 6) AS score, c.user_id FROM c, q)
         |SELECT id, score, user_id FROM s WHERE score >= 0.1
         |ORDER BY score DESC, id ASC LIMIT 10""".stripMargin,
    "knn_search_filtered" ->
      s"""WITH $C, q AS (SELECT ne AS qe FROM c WHERE id = 0),
         |s AS (SELECT c.id, round(list_dot_product(c.ne, q.qe), 6) AS score, c.user_id
         |      FROM c, q WHERE c.user_id = 5)
         |SELECT id, score, user_id FROM s WHERE score >= 0.0
         |ORDER BY score DESC, id ASC LIMIT 10""".stripMargin,
    "knn_batch" ->
      s"""WITH $C, q AS (SELECT id AS query_id, ne AS qe FROM c WHERE id < 8),
         |s AS (SELECT q.query_id, c.id, round(list_dot_product(c.ne, q.qe), 6) AS score, c.user_id FROM c, q),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id ASC) AS rank
         |      FROM s WHERE score >= 0.1)
         |SELECT query_id, id, score, rank, user_id FROM r WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,
    "multi_vector_fusion" ->
      s"""WITH $C,
         |q AS (SELECT id AS query_id, ne AS qe,
         |             CASE id WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 ELSE 0.25 END AS weight
         |      FROM c WHERE id < 3),
         |s AS (SELECT q.query_id, q.weight, c.id, round(list_dot_product(c.ne, q.qe), 6) AS score FROM c, q),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id ASC) AS rnk
         |      FROM s WHERE score >= 0.1)
         |SELECT id, round(sum(score * weight), 6) AS fused_score, count(*)::BIGINT AS votes
         |FROM r WHERE rnk <= 20 GROUP BY id
         |ORDER BY fused_score DESC, votes DESC, id ASC LIMIT 10""".stripMargin,
    "face_verify" ->
      s"""WITH $C, q AS (SELECT ne AS qe FROM c WHERE id = 0),
         |s AS (SELECT c.user_id, round(list_dot_product(c.ne, q.qe), 6) AS score
         |      FROM c, q WHERE c.user_id = 5)
         |SELECT user_id, max(score) AS best_score,
         |       (max(score) >= 0.65)::INT AS verified
         |FROM s GROUP BY user_id""".stripMargin,
    "face_detect" ->
      s"""WITH $C, q AS (SELECT ne AS qe FROM c WHERE id = 0),
         |s AS (SELECT c.user_id, round(list_dot_product(c.ne, q.qe), 6) AS score FROM c, q)
         |SELECT user_id, max(score) AS best_score, count(*)::BIGINT AS n_hits
         |FROM s WHERE score >= 0.1 GROUP BY user_id
         |ORDER BY best_score DESC, user_id ASC LIMIT 5""".stripMargin,
    "upsert_lww" ->
      """WITH c AS (SELECT vec_id AS id, label AS user_id, vec_id::DOUBLE AS ts FROM embeddings),
        |adds AS (SELECT id, 999 AS user_id, ts + 10000 AS ts FROM c WHERE id < 10),
        |u AS (SELECT *, 0 AS gen FROM c UNION ALL SELECT *, 1 AS gen FROM adds),
        |d AS (SELECT id, user_id, ts,
        |             row_number() OVER (PARTITION BY id ORDER BY ts DESC, gen DESC) AS rn FROM u)
        |SELECT id, user_id, ts FROM d WHERE rn = 1 AND id < 20 ORDER BY id""".stripMargin,
    "delete_by_user" ->
      """SELECT sum(CASE WHEN label = 3 THEN 1 ELSE 0 END)::BIGINT AS deleted_count,
        |       sum(CASE WHEN label = 3 THEN 0 ELSE 1 END)::BIGINT AS remaining_count
        |FROM embeddings""".stripMargin,
    "collection_stats" ->
      """WITH per AS (SELECT label AS user_id, count(*)::BIGINT AS n FROM embeddings GROUP BY 1)
        |SELECT sum(n)::BIGINT AS total_points, count(*)::BIGINT AS distinct_users,
        |       round(avg(n), 6) AS avg_points_per_user,
        |       max(n)::BIGINT AS max_points_per_user, min(n)::BIGINT AS min_points_per_user
        |FROM per""".stripMargin,
  )
}
