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

  test("scroll pages are disjoint, ordered, and resumable from the cursor") {
    val p1 = Collection.scroll(points, limit = 10)
      .as[(Long, Int, Double)].collect()
    assert(p1.length == 10)
    // ordered by (ts desc, id asc)
    assert(p1.sliding(2).forall(w =>
      w.head._3 > w.last._3 || (w.head._3 == w.last._3 && w.head._1 < w.last._1)))
    val last = p1.last
    val p2 = Collection.scroll(points, limit = 10,
      afterTs = Some(last._3), afterId = Some(last._1))
      .as[(Long, Int, Double)].collect()
    assert(p2.length == 10)
    assert((p1.map(_._1).toSet intersect p2.map(_._1).toSet).isEmpty)
    // page 2 = rows 10..19 of a double-sized page (keyset == offset here)
    val both = Collection.scroll(points, limit = 20)
      .as[(Long, Int, Double)].collect()
    assert(both.drop(10).map(_._1).toSeq == p2.map(_._1).toSeq)
  }

  test("countWhere counts only definitively-matching rows (NULL-safe)") {
    val df = Seq((1L, Some("a")), (2L, Option.empty[String]), (3L, Some("b")))
      .toDF("id", "tag")
    val (m, t) = Collection.countWhere(df, $"tag" =!= "b")
      .as[(Long, Long)].head()
    assert(m == 1L && t == 3L) // NULL tag is not a match but is counted in total
  }

  test("facet returns per-value counts ordered by count desc, value asc") {
    val f = Collection.facet(points, "user_id", lit(true), topN = 3)
      .as[(Int, Long)].collect()
    assert(f.length == 3)
    assert(f.sliding(2).forall(w =>
      w.head._2 > w.last._2 || (w.head._2 == w.last._2 && w.head._1 < w.last._1)))
    val direct = points.groupBy("user_id").count()
      .as[(Int, Long)].collect().toMap
    assert(f.forall { case (v, n) => direct(v) == n })
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

  test("scrollOrderedBy: payload-field keyset pages concatenate to the global order") {
    val ext = Collection.loadWithPayload(spark, sf001)
    val all = Collection.scrollOrderedBy(ext, "confidence_score", limit = 20)
      .as[(Long, Int, Double)].collect().toSeq
    assert(all.map(_._3).sliding(2).forall(p => p.head >= p.last))
    val (lastConf, lastId) = (all.last._3, all.last._1)
    val page2 = Collection.scrollOrderedBy(ext, "confidence_score",
      limit = 20, afterVal = Some(lastConf), afterId = Some(lastId))
      .as[(Long, Int, Double)].collect().toSeq
    assert(page2.nonEmpty)
    assert((all.map(_._1).toSet & page2.map(_._1).toSet).isEmpty, "pages overlap")
    // two keyset pages == the first 40 of one big page
    val big = Collection.scrollOrderedBy(ext, "confidence_score", limit = 40)
      .as[(Long, Int, Double)].collect().toSeq
    assert(all ++ page2 == big)
  }
}
