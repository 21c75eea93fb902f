package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-collection index metadata held by the serving layer — the engine's
  * analogue of the reference keeping its index handles and collection size
  * in process memory instead of re-reading them per query
  * (src/core/qdrant_client.py:60-99 holds the client + collection config;
  * src/core/advanced_indexing.py:214-278 sizes search params from the
  * cached collection size).
  *
  * Everything here is TINY driver-side state (≤C centroids of d doubles, a
  * dozen hyperplanes, one long, one recall curve) — the distributed
  * analogue of broadcasting index metadata. It is collected ONCE per
  * collection version ([[IndexMeta.forStore]] caches by store key) and then
  * embedded into codegen expressions ([[graft.plans.VectorExpressions]]),
  * so query construction does zero Spark jobs.
  *
  * `recallCurve(p-1)` = measured recall@k of an IVF search probing the `p`
  * nearest cells, over a deterministic calibration sample of stored
  * vectors. Because IVF returns the exact top-k WITHIN the probed cells, a
  * true neighbor is recalled iff its cell is probed — so the curve is
  * exactly the sample-mean cell-coverage of the true top-k, and
  * [[nprobeFor]] inverts it: the smallest probe count whose measured
  * recall clears the target. This mirrors how the reference ties `ef` to
  * its recall claim (PERFORMANCE_OPTIMIZATION_GUIDE.md:89: 99.2% recall@10
  * from tuned ef + rescore) — the parameter is derived from a measured
  * accuracy target, not guessed.
  */
final case class IndexMeta(
    knownCount: Long,
    cids: Seq[Long],
    cents: Seq[Seq[Double]],
    hyperplanes: Seq[Seq[Double]],
    recallCurve: Seq[Double]) {

  /** Smallest nprobe whose calibrated recall@k >= target (all cells if the
    * target is unreachable — degrades to exact-within-cells, recall 1.0). */
  def nprobeFor(target: Double): Int = {
    val i = recallCurve.indexWhere(_ >= target)
    if (i < 0) cids.length else i + 1
  }
}

object IndexMeta {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, IndexMeta]()

  /** Build-once-per-JVM per store key (collection version). */
  def forStore(key: String)(build: => IndexMeta): IndexMeta =
    cache.computeIfAbsent(key, _ => build)

  /** Measure the IVF recall curve and assemble the metadata.
    *
    * Calibration cost is an index-BUILD cost, not a query cost: `nSample`
    * exact top-k jobs plus one tiny cell lookup each, all over the same
    * data the index build already scans. The sample is a deterministic
    * salted-hash pick over the ids present, disjoint in practice from
    * [[graft.RecallReport]]'s evenly-spread report sample — the reported
    * recall is held-out, not the calibration set grading itself. */
  def build(points: DataFrame, centroids: DataFrame,
      hyperplanes: Seq[Seq[Double]], k: Int = 10,
      nSample: Int = 8): IndexMeta = {
    val rows = centroids.select(col("cid"), col("ce")).orderBy("cid").collect()
    val cids = rows.map(_.getLong(0)).toSeq
    val cents = rows.map(_.getSeq[Double](1)).toSeq
    val nC = cids.length
    val n = points.count()
    val assigned = Ann.ivfAssign(points, cids, cents)
      .select(col("id"), col("cid"))
    // calibration queries: a deterministic salted-hash pick over the ids
    // actually present (no contiguity assumption — works on any id set),
    // disjoint in practice from RecallReport's evenly-spread sample
    val qids = points.select(col("id"))
      .orderBy(pmod(graft.functions.TextOps.hash60(
        concat(lit("cal_"), col("id").cast("string"))), lit(999983L)),
        col("id"))
      .limit(nSample)
      .collect().map(_.getLong(0)).toSeq
    // per query: the cell-rank of each true top-k neighbor (rank of the
    // neighbor's cell in the query's rounded-dot probe order)
    val coverage = Array.fill(nC)(0.0)
    qids.foreach { qid =>
      val qEmb = points.filter(col("id") === qid)
        .select(col("embedding")).head().getSeq[Double](0)
      // probe order: same (round 6dp desc, cid asc) rule as TopCentroids
      val order = cids.indices
        .map(i => (math.rint(dot(qEmb, cents(i)) * 1e6) / 1e6, cids(i)))
        .sortBy { case (s, c) => (-s, c) }
        .map(_._2)
      val rankOf = order.zipWithIndex.toMap
      val q = points.filter(col("id") === qid)
        .select(col("embedding").as("qemb"))
      val topK = Search.knn(points, q, k, -1.0)
        .select("id").collect().map(_.getLong(0))
      val cellOf = assigned.filter(col("id").isin(topK: _*))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      topK.foreach { nb =>
        val r = rankOf(cellOf(nb)) // 0-based cell rank of this neighbor
        var p = r
        while (p < nC) { coverage(p) += 1.0; p += 1 }
      }
    }
    val denom = (qids.size * k).toDouble
    IndexMeta(n, cids, cents, hyperplanes,
      coverage.map(_ / denom).toSeq)
  }

  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
}
