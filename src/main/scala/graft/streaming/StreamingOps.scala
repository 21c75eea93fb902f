package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Events

/** Structured Streaming forms of the event operators. The reference has no
  * streaming surface (SURVEY.md §2.7); this demonstrates that the engine's
  * batch operators carry over unchanged: the SAME logical plan
  * (window+aggregate) runs incrementally with a watermark, and the batch
  * DuckDB oracle verifies the streamed result.
  *
  * At scale: replace the file source with Kafka, keep the watermark at the
  * source's max disorder, and the state store shards by the grouping key —
  * the identical aggregation topology as the batch hash shuffle.
  */
object StreamingOps {

  /** Run the hourly-window aggregation as a stream over the events fixture
    * (file source, synchronous drain, complete mode into a memory sink) and
    * return the final result — row-identical to Events.hourlyWindow. */
  def hourlyWindowStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // the streaming file source requires a directory: stream the sf dir
    // with a glob pinned to the events file
    val stream = spark.readStream
      .schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count("*").cast("long").as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
    val name = s"graft_stream_${System.nanoTime()}"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy("window_start", "event_type")
  }
}
