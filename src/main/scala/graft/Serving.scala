package graft

import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import scala.collection.mutable.ArrayBuffer
import scala.concurrent.{Future, Promise}

import org.apache.spark.sql.{DataFrame, Row}

/** Micro-batched serving loop — the engine's interactive point-serving
  * shape, graded against the reference BenchmarkSuite's targets
  * (≥1000 ops/s, ≤20 ms search — src/utils/performance.py:448-484,
  * README.md:7-8).
  *
  * Why this exists: Spark's per-job driver cost (plan + schedule,
  * ~0.1 s) bounds ANY one-job-per-request path near ~10 QPS per client
  * thread regardless of data size — no plan shape removes it. The
  * serving answer is to queue in-flight requests and flush them as ONE
  * [[graft.operators.Search.knnBatch]] job: the fixed cost amortizes
  * across the flush, per-query top-k semantics are preserved by the
  * window rank inside knnBatch, and each caller gets back exactly the
  * rows a solo [[graft.operators.Search.knn]] would return
  * (spec-asserted in ApiSpec). Latency is bounded by
  * `maxWaitMs + one batched job`; throughput scales with `maxBatch`.
  *
  * This is the same trade the reference makes implicitly: its ≥1000 QPS
  * headline comes from an in-process index serving many concurrent HTTP
  * requests on one box; the Spark-idiomatic equivalent is batch
  * amortization, not per-request jobs.
  *
  * Thread model: callers [[submit]] from any number of threads; one
  * daemon flusher drains the queue — a flush starts as soon as a request
  * is available and closes when `maxBatch` requests are buffered or
  * `maxWaitMs` has passed since the flush opened, whichever is first.
  * A failed flush fails exactly that flush's futures.
  */
final class BatchedServer(
    points: DataFrame,
    k: Int,
    threshold: Double,
    maxBatch: Int = 1024,
    maxWaitMs: Long = 20L) extends AutoCloseable {

  require(maxBatch >= 1, s"maxBatch must be >= 1, got $maxBatch")
  require(maxWaitMs >= 0, s"maxWaitMs must be >= 0, got $maxWaitMs")

  private val spark = points.sparkSession
  import spark.implicits._

  private final case class Pending(emb: Seq[Double], p: Promise[Array[Row]])
  private val queue = new LinkedBlockingQueue[Pending]()
  @volatile private var open = true

  /** Enqueue one search request; the future completes with this request's
    * top-k rows `(id, score, user_id)` in rank order — the same rows, in
    * the same order, as a solo `Search.knn(points, q, k, threshold)`. */
  def submit(qemb: Seq[Double]): Future[Array[Row]] = {
    require(open, "BatchedServer is closed")
    require(qemb != null && qemb.nonEmpty,
      "empty embedding (min_items=1)") // same bar as Api.addVectors
    val p = Promise[Array[Row]]()
    queue.put(Pending(qemb, p))
    p.future
  }

  /** One knnBatch job over a drained flush; per-request slices handed back
    * through the promises. query_id is the position in THIS flush — ids
    * never leave the flush, so concurrent flushes can't collide. */
  private def flush(batch: Seq[Pending]): Unit =
    try {
      val reqs = batch.zipWithIndex
        .map { case (pd, i) => (i.toLong, pd.emb) }
        .toDF("query_id", "qemb")
      val out = operators.Search.knnBatch(points, reqs, k, threshold).collect()
      val (qIx, idIx, scoreIx, rankIx, userIx) =
        out.headOption.map { r =>
          (r.fieldIndex("query_id"), r.fieldIndex("id"),
            r.fieldIndex("score"), r.fieldIndex("rank"),
            r.fieldIndex("user_id"))
        }.getOrElse((0, 1, 2, 3, 4))
      val byQuery = out.groupBy(_.getLong(qIx))
      batch.zipWithIndex.foreach { case (pd, i) =>
        val hits = byQuery.getOrElse(i.toLong, Array.empty[Row])
          .sortBy(_.getLong(rankIx))
          .map(r => Row(r.get(idIx), r.get(scoreIx), r.get(userIx)))
        pd.p.success(hits)
      }
    } catch {
      case e: Throwable => batch.foreach(_.p.tryFailure(e))
    }

  private val flusher = new Thread(() => {
    while (open || !queue.isEmpty) {
      val first = queue.poll(math.max(maxWaitMs, 1L), TimeUnit.MILLISECONDS)
      if (first != null) {
        val buf = ArrayBuffer(first)
        val deadline = System.nanoTime() + maxWaitMs * 1000000L
        var keepFilling = buf.size < maxBatch
        while (keepFilling) {
          // take everything already queued without waiting…
          var draining = true
          while (draining && buf.size < maxBatch) {
            val more = queue.poll()
            if (more == null) draining = false else buf += more
          }
          // …then wait out the remaining flush window for stragglers
          val waitLeft = deadline - System.nanoTime()
          if (buf.size >= maxBatch || waitLeft <= 0) keepFilling = false
          else {
            val nxt = queue.poll(waitLeft, TimeUnit.NANOSECONDS)
            if (nxt == null) keepFilling = false else buf += nxt
          }
        }
        flush(buf.toSeq)
      }
    }
  }, "graft-batched-server-flusher")
  flusher.setDaemon(true)
  flusher.start()

  /** Stop accepting requests, drain what's queued, and join the flusher. */
  def close(): Unit = {
    open = false
    flusher.join()
  }
}
