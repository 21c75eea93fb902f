package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

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

  /** Normalize the `ts` column to session-local TIMESTAMP (sessions pin
    * UTC) regardless of the fixture's physical encoding. Generated data has
    * shipped two encodings across rounds:
    *   - TIMESTAMP(NANOS), a parquet type Spark 4 rejects outright: read
    *     nanos as LONG (legacy conf) and truncate to microseconds with
    *     integer division (`div`, not `/`: epoch-nanos ≈ 1.7e18 exceeds
    *     DOUBLE's 2^53 exact-integer range, so float division would corrupt
    *     timestamps). DuckDB truncates ns→us identically.
    *   - TIMESTAMP(MICROS) without timezone, which Spark reads as
    *     TIMESTAMP_NTZ: reinterpret the wall-clock as UTC (cast under the
    *     UTC session tz), byte-identical instants to what DuckDB reads.
    * A map-side projection either way — nothing here blocks pushdown of
    * other predicates or costs a shuffle. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType =>
      // A LONG ts can ONLY mean epoch NANOS here: the sole producer of a
      // LongType ts is the nanosAsLong legacy conf reading a
      // TIMESTAMP(NANOS) parquet column ([[load]] sets it). Guard the
      // assumption: epoch-nanos for any plausible fixture date sit near
      // 1e18 (2001-09-09..2033-05-18 spans [1e18, 2e18)); a plain INT64
      // micros/millis column (~1.7e15 / ~1.7e12) would be silently divided
      // into wrong instants, so fail loud instead of guessing its unit.
      val guard = df.select(min(col("ts")), max(col("ts"))).first()
      val (lo, hi) = (guard.getLong(0), guard.getLong(1))
      require(lo >= 1000000000000000000L && hi < 2000000000000000000L,
        s"LongType ts range [$lo, $hi] is not epoch-nanos magnitude " +
          "(~1e18); refusing to assume a unit — fixture encoding changed?")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
    case _                => df
  }

  def load(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
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

  /** As-of join: for each left row, the most recent right row with
    * right.ts <= left.ts within the same key — the temporal operator Spark
    * lacks natively (DuckDB's ASOF JOIN serves as the independent oracle).
    *
    * Implementation is the union trick: tag both sides, sort per key by
    * (ts, tag) with right rows ordered before left at equal ts (giving the
    * <= semantics), and carry the last-seen right columns forward
    * with `last(..., ignoreNulls)` — ONE hash shuffle on the key and no
    * join at all, which at 100 TB beats a range join by orders of
    * magnitude (no per-row range probe, no broadcast of the right side).
    * Right rows are deduped to one per (key, ts) by max id first so ties
    * are deterministic. */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      key: String, tsCol: String, idCol: String): DataFrame = {
    val rightDedup = right.groupBy(col(key), col(tsCol))
      .agg(max(col(idCol)).as("r_id"))
      .select(col(key), col(tsCol).as("r_ts"), col("r_id"))
    val l = left.select(col(key), col(tsCol), col(idCol),
      lit(1).as("_tag"), lit(null).cast("timestamp").as("r_ts_in"),
      lit(null).cast("long").as("r_id_in"))
    val r = rightDedup.select(col(key), col("r_ts").as(tsCol),
      lit(null).cast("long").as(idCol),
      lit(0).as("_tag"), col("r_ts").as("r_ts_in"), col("r_id").as("r_id_in"))
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol), col("_tag"), col(idCol).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("r_ts", last(col("r_ts_in"), ignoreNulls = true).over(w))
      .withColumn("r_id", last(col("r_id_in"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(col(idCol), col(key), col(tsCol), col("r_ts"), col("r_id"))
  }

  /** Rolling (trailing) time-window aggregation: per event_type, the daily
    * total plus the 7-day trailing sum/average — a RANGE frame over epoch
    * days, so calendar gaps are handled correctly (a ROWS frame would
    * silently span gaps). Two-level shape: the tumbling daily rollup first
    * (map-side combinable hash agg — this is what touches every event),
    * then the window runs over the tiny (day × type) grid. Daily sums stay
    * in DECIMAL through the frame so the trailing sum is exact regardless
    * of accumulation order. */
  def rollingDaily(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count("*").cast("long").as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("day_value"))
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01")))
    val frame = Window.partitionBy("event_type").orderBy("day_num")
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    daily
      .withColumn("rolling_value",
        sum(col("day_value")).over(frame).cast("double"))
      .withColumn("rolling_days", count("*").over(frame).cast("long"))
      .withColumn("rolling_avg",
        round(col("rolling_value") / col("rolling_days"), 6))
      .select(col("day"), col("event_type"), col("n_events"),
        col("day_value").cast("double").as("day_value"),
        col("rolling_value"), col("rolling_days"), col("rolling_avg"))
      .orderBy("day", "event_type")
  }

  /** Ordered funnel analysis: per user, the earliest `stage1` event, the
    * earliest `stage2` event strictly after it, the earliest `stage3`
    * strictly after that — then the per-stage completion counts.
    *
    * Bounded-state shape: a chain of conditional-min AGGREGATES (one per
    * stage) joined on user_id — every per-user aggregation state is a
    * single timestamp, so a power user with millions of events costs the
    * same as one with ten (the earlier collect_list formulation built an
    * unbounded per-user array). All three aggregates and both joins hash
    * on user_id, so the chain is one partitioning reused; the stage
    * frames shrink monotonically (funnel completion only drops users). */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.length == 3, "three-stage funnel")
    val f = events.filter(col("event_type").isin(stages: _*))
      .select("user_id", "event_type", "ts")
    val s1 = f.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = f.filter(col("event_type") === stages(1))
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = f.filter(col("event_type") === stages(2))
      .join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    s1.agg(count("*").cast("long").as(s"n_${stages.head}"))
      .crossJoin(s2.agg(count("*").cast("long").as(s"n_${stages(1)}")))
      .crossJoin(s3.agg(count("*").cast("long").as(s"n_${stages(2)}")))
  }

  /** JSON property extraction + top-k users by extracted metric. */
  def jsonTopUsers(events: DataFrame, k: Int): DataFrame =
    events
      .withColumn("k_val", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("user_id"))
      .agg(sum(col("k_val")).as("total_k"), count("*").cast("long").as("n_events"))
      .orderBy(desc("total_k"), asc("user_id"))
      .limit(k)
}
