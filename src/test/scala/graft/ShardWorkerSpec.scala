package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-process serving building blocks: slab file round-trip and the
  * worker's slice-merged top-k vs a brute-force oracle. (The socket
  * layer is exercised end-to-end by CrossProcProbe / the bench's
  * cross_process_* rows — correctness there is router ≡ Search.knn.) */
class ShardWorkerSpec extends AnyFunSuite {

  private def mkRows(n: Int, d: Int): Array[(Long, Array[Double], Int)] = {
    val rnd = new scala.util.Random(7)
    Array.tabulate(n) { i =>
      val e = Array.fill(d)(rnd.nextDouble() * 2 - 1)
      val norm = math.sqrt(e.map(x => x * x).sum)
      (i.toLong, e.map(_ / norm), i % 10)
    }
  }

  test("SlabIO round-trips ids, users, and embeddings exactly") {
    val rows = mkRows(257, 64) // odd count: exercises the write tail
    val p = java.nio.file.Files.createTempFile("slab", ".bin").toString
    SlabIO.write(p, rows)
    val back = SlabIO.read(p)
    assert(back.length == rows.length)
    rows.zip(back).foreach { case ((id, e, u), (id2, e2, u2)) =>
      assert(id == id2 && u == u2)
      assert(java.util.Arrays.equals(e, e2)) // bit-exact doubles
    }
    java.nio.file.Files.delete(java.nio.file.Paths.get(p))
  }

  test("SlabIO round-trips ragged (mixed-dim) rows") {
    val rows: Array[(Long, Array[Double], Int)] = Array(
      (1L, Array(0.6, 0.8), 0),
      (2L, Array(1.0, 0.0, 0.0), 1),
      (3L, Array[Double](), 2))
    val p = java.nio.file.Files.createTempFile("slab", ".bin").toString
    SlabIO.write(p, rows)
    val back = SlabIO.read(p)
    assert(back.map(_._2.toSeq).toSeq == rows.map(_._2.toSeq).toSeq)
    java.nio.file.Files.delete(java.nio.file.Paths.get(p))
  }

  test("worker topK over slices == brute-force top-k with the global tie order") {
    val rows = mkRows(1003, 32)
    val rep = BatchedServer.FlatReplica(rows)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val rnd = new scala.util.Random(13)
      val queries = Array.fill(3) {
        val q = Array.fill(32)(rnd.nextDouble() * 2 - 1)
        val n = math.sqrt(q.map(x => x * x).sum)
        q.map(_ / n)
      }
      val k = 10
      val th = 0.0
      val got = ShardWorker.topK(rep, pool, 4, queries, k, th)
      queries.zipWithIndex.foreach { case (q, qi) =>
        val want = rows.map { case (id, e, u) =>
          var s = 0.0; var i = 0
          while (i < e.length) { s += e(i) * q(i); i += 1 }
          (id, graft.plans.Num.round6(s), u)
        }.filter(_._2 >= th)
          .sortBy { case (id, s, _) => (-s, id) }.take(k).toSeq
        assert(got(qi).toSeq == want, s"query $qi")
      }
    } finally pool.shutdownNow()
  }
}
