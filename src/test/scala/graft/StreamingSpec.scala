package graft

import graft.operators.Events
import graft.streaming.StreamingOps

/** Streaming/batch unification: the streamed windowed aggregation must be
  * row-identical to the batch operator over the same input. */
class StreamingSpec extends SparkSpec {

  test("streamed hourly window equals the batch hourly window") {
    val streamed = StreamingOps.hourlyWindowStream(spark, sf001).collect()
    val batch = Events.hourlyWindow(Events.load(spark, sf001)).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.sameElements(batch))
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
