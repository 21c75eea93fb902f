package graft

import graft.operators.Events
import graft.streaming.StreamingOps

/** Streaming/batch unification: the streamed windowed aggregation must be
  * row-identical to the batch operator over the same input. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streamed hourly window equals the batch hourly window") {
    val streamed = StreamingOps.hourlyWindowStream(spark, sf001).collect()
    val batch = Events.hourlyWindow(Events.load(spark, sf001)).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.sameElements(batch))
  }

  test("streaming ingest builds the same collection as batch load; rerun is exactly-once") {
    val dest = java.nio.file.Files.createTempDirectory("ingest")
      .resolve("store").toString
    val n1 = StreamingOps.ingestStream(spark, sf001, dest)
    val batch = graft.operators.Collection.load(spark, sf001)
    assert(n1 == batch.count())
    val ids = spark.read.parquet(dest).select("id")
      .as[Long].collect().toSet
    assert(ids == batch.select("id").as[Long].collect().toSet)
    // same checkpoint, no new files: nothing reprocessed, store unchanged
    val n2 = StreamingOps.ingestStream(spark, sf001, dest)
    assert(n2 == n1)
  }

  test("streamed dedup distinct-users equals batch count(DISTINCT)") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingOps.distinctUsersStream(spark, sf001).collect()
    val batch = Events.load(spark, sf001)
      .groupBy("event_type")
      .agg(countDistinct("user_id").cast("long").as("n_users"))
      .orderBy("event_type").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.sameElements(batch))
  }
}
