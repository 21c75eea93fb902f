package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over `events(event_id, ts, user_id, event_type,
  * value, props)`: tumbling-window aggregation, gap-based sessionization,
  * time-range filtered rollups, and JSON property extraction.
  *
  * The reference has no streaming surface (SURVEY.md §2.7); these are the
  * batch forms of the standard event-pipeline operators, written so the
  * identical plan runs under Structured Streaming (`window()` aggregation
  * and stateful sessionization via flatMapGroupsWithState — see
  * graft.streaming). Scale: all shuffles are hash partitions on
  * (window/user/type) keys; sessionization partitions by user_id, which is
  * high-cardinality and evenly distributed — no skew handling needed.
  */
object Events {

  /** Load `events.parquet`, whose `ts` is TIMESTAMP(NANOS) — a parquet type
    * Spark 4 rejects outright. Read nanos as LONG (legacy conf) and truncate
    * to microseconds with integer division (`div`, not `/`: epoch-nanos
    * ≈ 1.7e18 exceeds DOUBLE's 2^53 exact-integer range, so float division
    * would corrupt timestamps). DuckDB truncates ns→us identically. */
  def load(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 1-hour window x event_type counts/sums — the batch twin of a
    * streaming windowed aggregation. */
  def hourlyWindow(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count("*").cast("long").as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")

  /** Gap-based sessionization: a session breaks after `gapSec` of
    * inactivity per user. Equivalent of a streaming session window with
    * gap duration; implemented with lag + cumulative-sum session ids. */
  def sessionize(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count("*").cast("long").as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("user_id", "session_id")
  }

  /** Time-range + type-filtered rollup (reference Q6's range predicates —
    * src/core/advanced_indexing.py:166-194 — applied to the event table). */
  def rangeAgg(events: DataFrame, from: String, until: String,
      types: Seq[String]): DataFrame =
    events
      .filter(col("ts") >= to_timestamp(lit(from)) &&
        col("ts") < to_timestamp(lit(until)) &&
        col("event_type").isin(types: _*))
      .groupBy(col("event_type"))
      .agg(count("*").cast("long").as("n_events"),
        (sum(col("value").cast("decimal(18,2)")).cast("double") / count("*"))
          .as("avg_value"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("event_type")

  /** JSON property extraction + top-k users by extracted metric. */
  def jsonTopUsers(events: DataFrame, k: Int): DataFrame =
    events
      .withColumn("k_val", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("user_id"))
      .agg(sum(col("k_val")).as("total_k"), count("*").cast("long").as("n_events"))
      .orderBy(desc("total_k"), asc("user_id"))
      .limit(k)
}
