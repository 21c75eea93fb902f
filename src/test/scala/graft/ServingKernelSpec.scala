package graft

import org.scalatest.funsuite.AnyFunSuite

/** Exhaustive parity of the serving scan kernel ([[BatchedServer.scoreRange]])
  * against a naive reference: the row-blocked kernel must produce
  * BIT-IDENTICAL results to "exact left-to-right dot, 6dp HALF_UP round,
  * (score desc, id asc) top-k, threshold ≥" on any input — the blocking
  * and the rounding gate are pure execution detail. No Spark session
  * needed: the kernel is plain JVM code.
  *
  * (These specs also graded the round-10 int8-gate experiment — a
  * quantized scan with certified-bound exact rescore, Qdrant's scalar
  * quantization shape. It passed all of them but measured SLOWER than
  * the blocked double kernel on this JVM — 24.7 vs 33.5 Gcells/s at the
  * design point; scalar byte loads + 3-cycle imuls lose to latency-
  * hidden double FMAs without SIMD — so it was reverted. PLANS_r10.) */
class ServingKernelSpec extends AnyFunSuite {

  private def round6(x: Double): Double = graft.plans.Num.round6(x)

  /** Naive reference: per query, exact sequential dots over min-length,
    * round6, threshold, (score desc, id asc) top-k. */
  private def reference(rows: Array[(Long, Array[Double], Int)],
      queries: Array[Array[Double]], k: Int, th: Double)
      : Map[Int, Seq[(Long, Double, Int)]] =
    queries.zipWithIndex.map { case (q, qi) =>
      qi -> rows.toSeq.map { case (id, emb, u) =>
        val nd = math.min(emb.length, q.length)
        var s = 0.0d
        var d = 0
        while (d < nd) { s += emb(d) * q(d); d += 1 }
        (id, round6(s), u)
      }.filter(_._2 >= th)
        .sortBy { case (id, s, _) => (-s, id) }
        .take(k)
    }.toMap

  private def viaKernel(rows: Array[(Long, Array[Double], Int)],
      queries: Array[Array[Double]], k: Int, th: Double,
      useSimd: Boolean = true): Map[Int, Seq[(Long, Double, Int)]] = {
    val rep = BatchedServer.FlatReplica(rows, useSimd)
    // exercise slice boundaries too: union of per-slice top-k must merge
    // to the same global top-k (the superset argument). Odd slice count
    // also leaves SIMD-block-unaligned boundaries, covering the scalar
    // head/tail stitching of the SIMD dispatch.
    val nSlices = 3
    val cands = (0 until nSlices).flatMap { si =>
      val lo = rep.n * si / nSlices
      val hi = rep.n * (si + 1) / nSlices
      BatchedServer.scoreRange(rep, lo, hi, queries, k, th)
    }
    cands.groupBy(_._1).map { case (qi, cs) =>
      qi -> cs.map { case (_, id, s, u) => (id, s, u) }
        .sortBy { case (id, s, _) => (-s, id) }.take(k).toSeq
    }.toMap.withDefaultValue(Seq.empty)
  }

  private def check(rows: Array[(Long, Array[Double], Int)],
      queries: Array[Array[Double]], k: Int, th: Double): Unit = {
    val expect = reference(rows, queries, k, th)
    // both kernels — scalar blocked AND (when the module is present)
    // the SIMD transposed-block path — must match the naive reference
    for (simd <- Seq(false, true)) {
      val got = viaKernel(rows, queries, k, th, useSimd = simd)
      queries.indices.foreach { qi =>
        assert(got(qi) == expect(qi),
          s"simd=$simd qi=$qi k=$k th=$th\n got=${got(qi)}\n want=${expect(qi)}")
      }
    }
  }

  test("SIMD kernel active in this JVM; transposed blocks bit-identical to scalar") {
    assume(BatchedServer.SimdSupport.enabled,
      "incubator vector module absent — SIMD path not gradeable here")
    val rnd = new scala.util.Random(41L)
    val dim = 48
    val rows = Array.tabulate(1021) { i => // prime count: unaligned tail
      (i.toLong, Array.fill(dim)(rnd.nextGaussian()), i % 6)
    }
    val rep = BatchedServer.FlatReplica(rows, true)
    assert(rep.tslab != null && rep.tlanes >= 2,
      "uniform-dim corpus must build the transposed SIMD slab")
    assert(rep.simdRows == (rows.length / rep.tlanes) * rep.tlanes)
    // raw dots: SIMD lane ≡ scalar sequential, bit for bit, every row
    val q = Array.fill(dim)(rnd.nextGaussian())
    val out = new Array[Double](rep.tlanes)
    (0 until rep.simdRows / rep.tlanes).foreach { blk =>
      graft.simd.SimdDot.block1(rep.tslab, blk * rep.tlanes * dim, dim, q, out)
      (0 until rep.tlanes).foreach { lane =>
        val r = blk * rep.tlanes + lane
        val seq = BatchedServer.dotRaw(
          java.util.Arrays.copyOfRange(rep.embs, rep.offs(r), rep.offs(r + 1)), q)
        assert(java.lang.Double.doubleToLongBits(out(lane)) ==
          java.lang.Double.doubleToLongBits(seq),
          s"row $r: SIMD lane dot differs from scalar sequential")
      }
    }
  }

  test("random uniform-dim corpus: kernel ≡ naive reference across k and thresholds") {
    val rnd = new scala.util.Random(7L)
    val dim = 24
    val rows = Array.tabulate(301) { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian() * 0.2), i % 5)
    }
    val queries = Array.fill(9)(Array.fill(dim)(rnd.nextGaussian() * 0.2))
    for (k <- Seq(1, 7, 50); th <- Seq(-1e9, 0.0, 0.05))
      check(rows, queries, k, th)
  }

  test("extreme magnitudes: the certified quantization bound holds far from unit norm") {
    val rnd = new scala.util.Random(11L)
    val dim = 16
    // magnitudes spanning 12 orders, mixed signs, plus exact-zero rows
    val rows = Array.tabulate(120) { i =>
      val mag = math.pow(10.0, (i % 13) - 6)
      val emb =
        if (i % 17 == 3) Array.fill(dim)(0.0)
        else Array.fill(dim)(rnd.nextGaussian() * mag)
      (i.toLong, emb, i % 3)
    }
    val queries = Array.tabulate(6) { j =>
      Array.fill(dim)(rnd.nextGaussian() * math.pow(10.0, j - 3))
    }
    for (k <- Seq(3, 20); th <- Seq(-1e18, 0.0))
      check(rows, queries, k, th)
  }

  test("ragged rows and ragged queries take the exact paths, same results") {
    val rnd = new scala.util.Random(13L)
    val rows = Array.tabulate(97) { i =>
      val dim = Seq(8, 16, 16, 16, 32)(i % 5) // ragged blocks
      (i.toLong, Array.fill(dim)(rnd.nextGaussian()), i % 4)
    }
    val queries = Array(
      Array.fill(16)(rnd.nextGaussian()),
      Array.fill(4)(rnd.nextGaussian()),   // shorter than most rows
      Array.fill(64)(rnd.nextGaussian()))  // longer than all rows
    for (k <- Seq(5, 25); th <- Seq(-1e9, 0.1))
      check(rows, queries, k, th)
  }

  test("non-finite row never places and never corrupts its block") {
    // a NaN dot fails every >= comparison (gate and threshold alike), so
    // the row simply never places — and the 3 clean rows sharing its
    // 4-row block must be unaffected
    val dim = 8
    val rnd = new scala.util.Random(17L)
    val rows = Array.tabulate(40) { i =>
      val emb = Array.fill(dim)(rnd.nextGaussian())
      if (i == 21) emb(3) = Double.NaN
      (i.toLong, emb, 1)
    }
    val queries = Array(Array.fill(dim)(rnd.nextGaussian()))
    val got = viaKernel(rows, queries, 10, -1e9)
    assert(!got(0).exists(_._1 == 21L), "NaN row must not place")
    assert(got(0).size == 10)
    // and the clean rows still match the reference exactly
    val clean = rows.filterNot(_._1 == 21L)
    assert(viaKernel(clean, queries, 10, -1e9) ==
      reference(clean, queries, 10, -1e9))
  }

  test("job-tier fast gate: magnitude-scaled slack certifies the bound far from unit norm") {
    // The job tier gates on the reassociated dotFastAbs before the exact
    // recompute. For near-unit rows a fixed 1e-6 slack covers the
    // reassociation error; at |aᵢbᵢ| ~ 1e8+ it does NOT (ADVICE r10) —
    // gateSlack must scale with the measured Σ|aᵢbᵢ|. Two claims:
    // (1) the certified bound |fast − seq| ≤ gateSlack − 1e-6 holds on
    // adversarial heavy-cancellation rows; (2) the simulated job-tier
    // gate pipeline is row-identical to the ungated reference.
    val rnd = new scala.util.Random(29L)
    val scratch = new Array[Double](2)
    val dims = Seq(16, 64, 333)
    for (dim <- dims; trial <- 0 until 200) {
      val mag = math.pow(10.0, trial % 12) // 1 .. 1e11
      val emb = Array.tabulate(dim) { d =>
        // alternating-sign near-cancelling terms: worst reassociation case
        (if ((d + trial) % 2 == 0) 1 else -1) *
          (mag * (1.0 + rnd.nextDouble() * 1e-3))
      }
      val q = Array.fill(dim)(1.0 + rnd.nextGaussian() * 1e-3)
      BatchedServer.dotFastAbs(emb, q, scratch)
      var seq = 0.0d; var d = 0
      while (d < dim) { seq += emb(d) * q(d); d += 1 }
      val reassocErr = math.abs(scratch(0) - seq)
      val bound = BatchedServer.gateSlack(dim, scratch(1)) - 1e-6
      assert(reassocErr <= bound,
        s"dim=$dim mag=$mag: |fast-seq|=$reassocErr > certified $bound")
    }
    // full gate-pipeline parity at products ~1e8+: simulate the job-tier
    // inner loop (gate → exact recompute → round6 → threshold → top-k)
    // and require row-identity with the ungated reference
    val dim = 64
    val rows = Array.tabulate(400) { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian() * 1e4), i % 3)
    }
    val queries = Array.fill(5)(Array.fill(dim)(rnd.nextGaussian() * 1e4))
    for (k <- Seq(3, 25); th <- Seq(-1e18, 0.0)) {
      val expect = reference(rows, queries, k, th)
      val got = queries.zipWithIndex.map { case (q, qi) =>
        val top = new BatchedServer.TopK(k)
        rows.foreach { case (id, emb, u) =>
          BatchedServer.dotFastAbs(emb, q, scratch)
          val slack = BatchedServer.gateSlack(
            math.min(emb.length, q.length), scratch(1))
          if (!(scratch(0) < top.floor(th) - slack)) {
            var s = 0.0d; var d = 0
            val nd = math.min(emb.length, q.length)
            while (d < nd) { s += emb(d) * q(d); d += 1 }
            val r = round6(s)
            if (r >= th) top.offer(r, id, u)
          }
        }
        qi -> top.drain().toSeq.map { case (s, id, u) => (id, s, u) }
          .sortBy { case (id, s, _) => (-s, id) }
      }.toMap
      queries.indices.foreach { qi =>
        assert(got(qi) == expect(qi),
          s"gated job-tier pipeline diverges at qi=$qi k=$k th=$th")
      }
    }
  }

  test("tie-breaks: equal scores keep ascending ids through gate and merge") {
    val dim = 4
    val v = Array(0.5, 0.5, 0.5, 0.5)
    val rows = Array.tabulate(50)(i => (49L - i, v.clone(), 0)) // ids 0..49, all identical
    val queries = Array(v.clone())
    val got = viaKernel(rows, queries, 7, 0.0)
    assert(got(0).map(_._1) == (0L until 7L), s"tie order broken: ${got(0)}")
  }
}
