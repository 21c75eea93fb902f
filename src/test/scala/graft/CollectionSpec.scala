package graft

import org.apache.spark.sql.functions._
import graft.operators.Collection

/** Upsert/delete semantics (reference S4/S5/D1-D3:
  * src/core/qdrant_client.py upsert + delete paths). */
class CollectionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Collection.load(spark, sf001).cache()

  test("load normalizes embeddings on ingest") {
    val norms = points
      .select(graft.functions.VectorOps.l2Norm($"embedding").as("n"))
      .agg(min("n"), max("n")).as[(Double, Double)].head()
    assert(math.abs(norms._1 - 1.0) < 1e-9 && math.abs(norms._2 - 1.0) < 1e-9)
  }

  test("upsert with same id and newer ts replaces the point (last-write-wins)") {
    val n0 = points.count()
    val adds = points.filter($"id" === 1)
      .withColumn("user_id", lit(777)).withColumn("ts", $"ts" + 1.0)
    val after = Collection.upsert(points, adds)
    assert(after.count() == n0, "upsert must not grow the collection for existing ids")
    assert(after.filter($"id" === 1).select("user_id").as[Int].head() == 777)
  }

  test("upsert with OLDER ts does not replace") {
    val adds = points.filter($"id" === 1)
      .withColumn("user_id", lit(777)).withColumn("ts", $"ts" - 1.0)
    val after = Collection.upsert(points, adds)
    assert(after.filter($"id" === 1).select("user_id").as[Int].head() != 777)
  }

  test("upsert inserts new ids") {
    val adds = points.filter($"id" === 2).withColumn("id", lit(999999L))
    val after = Collection.upsert(points, adds)
    assert(after.count() == points.count() + 1)
  }

  test("delete by id removes exactly that point; deleting absent id is a no-op") {
    val after = Collection.deleteById(points, lit(3L))
    assert(after.count() == points.count() - 1)
    assert(after.filter($"id" === 3).count() == 0)
    assert(Collection.deleteById(points, lit(-42L)).count() == points.count())
  }

  test("predicate delete removes all of a user's points and reports true count") {
    val doomed = points.filter($"user_id" === 2).count()
    val after = Collection.deleteWhere(points, $"user_id" === 2)
    assert(after.count() == points.count() - doomed)
    assert(after.filter($"user_id" === 2).count() == 0)
  }

  test("predicate delete keeps rows where the predicate is NULL") {
    // a null payload field must NOT match the delete (Qdrant filter
    // semantics: only definitively-matching points are removed)
    val df = Seq(
      (1L, Some("a")), (2L, Option.empty[String]), (3L, Some("b"))
    ).toDF("id", "tag")
    val after = Collection.deleteWhere(df, $"tag" === "a")
    assert(after.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }
}
