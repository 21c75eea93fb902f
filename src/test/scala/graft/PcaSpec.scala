package graft

import org.apache.spark.sql.functions._
import graft.operators.{Collection, Pca}

/** PCA specs: exact moments vs a driver-side recomputation, Jacobi
  * orthonormality and residual, eigenvalue ordering, projected variance ≡
  * eigenvalue (the end-to-end certificate), dot-product preservation of
  * the uncentered rotation (the PCA-PQ metric-safety claim), and train
  * determinism across physical layouts. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Collection.load(spark, sf001).cache()
  private lazy val rows =
    points.select($"embedding").as[Seq[Double]].collect().map(_.toArray)
  private lazy val model = Pca.train(points, 64)

  test("moments: exact vs driver recomputation") {
    val (n, s1, s2) = Pca.moments(points, 64)
    assert(n == rows.length)
    val d = 64
    val es1 = Array.ofDim[Double](d)
    val es2 = Array.ofDim[Double](d, d)
    rows.foreach { x =>
      var i = 0
      while (i < d) {
        es1(i) += x(i)
        var j = i
        while (j < d) { es2(i)(j) += x(i) * x(j); j += 1 }
        i += 1
      }
    }
    var i = 0
    while (i < d) {
      assert(math.abs(s1(i) - es1(i)) < 1e-9, s"mean sum $i")
      var j = i
      while (j < d) {
        assert(math.abs(s2(i)(j) - es2(i)(j)) < 1e-9, s"gram sum $i,$j")
        j += 1
      }
      i += 1
    }
  }

  test("eigvals non-increasing and non-negative; comps orthonormal") {
    val d = model.dim
    model.eigvals.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0) >= w(1) - 1e-12) }
    assert(model.eigvals.forall(_ >= 0.0))
    // R Rᵀ ≈ I at the 9dp component rounding
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val dp = (0 until d).map(k => model.comps(i)(k) * model.comps(j)(k)).sum
        val want = if (i == j) 1.0 else 0.0
        assert(math.abs(dp - want) < 1e-6, s"orthonormality $i,$j: $dp")
        j += 1
      }
      i += 1
    }
  }

  test("projected variance matches eigenvalue per component") {
    val table = Pca.modelTable(spark, model)
    val rep = Pca.varianceReport(points, table, 64)
      .select($"comp", $"eigval", $"var_proj", $"cum_energy_ratio")
      .as[(Int, Double, Double, Double)].collect()
    assert(rep.length == 64)
    rep.foreach { case (c, ev, vp, _) =>
      // 6dp projection rounding + n vs n−1 free: population variance both
      assert(math.abs(ev - vp) < 1e-3 + 0.01 * ev, s"comp $c: eig $ev var $vp")
    }
    assert(math.abs(rep.last._4 - 1.0) < 1e-6, "cumulative energy sums to 1")
    val cums = rep.map(_._4)
    cums.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0) <= w(1) + 1e-12) }
  }

  test("uncentered rotation preserves dot products (PCA-PQ metric safety)") {
    val sample = rows.take(12)
    val rot = sample.map { x =>
      model.comps.map(rw => rw.zip(x).map { case (a, b) => a * b }.sum)
    }
    for (a <- sample.indices; b <- sample.indices) {
      val orig = sample(a).zip(sample(b)).map { case (x, y) => x * y }.sum
      val r = rot(a).zip(rot(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(orig - r) < 1e-6, s"dot drift $a,$b: $orig vs $r")
    }
  }

  test("rotate() column path agrees with driver rotation") {
    val got = Pca.rotate(points.filter($"id" < 8), model)
      .orderBy("id").select($"embedding").as[Seq[Double]].collect()
    val want = rows.take(8).map { x =>
      model.comps.map(rw => rw.zip(x).map { case (a, b) => a * b }.sum)
    }
    got.zip(want).foreach { case (g, w) =>
      g.zip(w).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    }
  }

  test("balanced permutation: valid, balanced, metric-preserving") {
    val perm = Pca.balancedPermutation(model.eigvals, 8)
    assert(perm.sorted.toSeq == (0 until 64), "a permutation of 0..63")
    // per-subspace eigval loads must be far more even than straight order
    def loads(order: Array[Int]) = (0 until 8).map { s =>
      (0 until 8).map(i => model.eigvals(order(s * 8 + i))).sum }
    val bal = loads(perm)
    val straight = loads((0 until 64).toArray)
    assert(bal.max / bal.min < straight.max / straight.min,
      s"balance ${bal.max / bal.min} vs straight ${straight.max / straight.min}")
    assert(bal.max / bal.min < 3.0, s"balanced ratio ${bal.max / bal.min}")
    // a row permutation of an orthonormal R still preserves dots
    val sample = rows.take(6)
    val rot = sample.map { x =>
      perm.map(c => model.comps(c).zip(x).map { case (a, b) => a * b }.sum) }
    for (a <- sample.indices; b <- sample.indices) {
      val orig = sample(a).zip(sample(b)).map { case (x, y) => x * y }.sum
      val r = rot(a).zip(rot(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(orig - r) < 1e-6)
    }
  }

  test("train is deterministic across physical layout") {
    val m2 = Pca.train(points.repartition(7), 64)
    assert(m2.eigvals.toSeq == model.eigvals.toSeq)
    assert(m2.mu.toSeq == model.mu.toSeq)
    assert(m2.comps.map(_.toSeq).toSeq == model.comps.map(_.toSeq).toSeq)
  }

  test("moment states merge exactly: chunked+merged ≡ single pass, any order") {
    val full = Pca.momentState(points, 64)
    def chunk(m: Int, r: Int) =
      Pca.momentState(points.filter(pmod($"id", lit(m)) === r), 64)
    // two different chunkings, scrambled merge trees
    val m4 = Pca.mergeStates(
      Pca.mergeStates(chunk(4, 3), chunk(4, 1)),
      Pca.mergeStates(chunk(4, 2), chunk(4, 0)))
    val m3 = Pca.mergeStates(chunk(3, 1),
      Pca.mergeStates(chunk(3, 2), chunk(3, 0)))
    for (m <- Seq(m4, m3)) {
      assert(m.n == full.n)
      assert(m.hi.toSeq == full.hi.toSeq, "hi words diverged")
      assert(m.lo.toSeq == full.lo.toSeq, "lo words diverged")
    }
    // zero state is the merge identity; an empty-filter state IS zero
    val z = Pca.mergeStates(full, Pca.zeroState(64))
    assert(z.n == full.n && z.hi.toSeq == full.hi.toSeq &&
      z.lo.toSeq == full.lo.toSeq)
    val empty = Pca.momentState(points.filter($"id" < 0), 64)
    assert(empty.n == 0L && empty.hi.forall(_ == 0L))
    // the maintenance claim: retraining from the merged state is
    // BIT-IDENTICAL to the batch model — not approximately equal
    val mInc = Pca.trainFromState(m4)
    assert(mInc.eigvals.toSeq == model.eigvals.toSeq)
    assert(mInc.mu.toSeq == model.mu.toSeq)
    assert(mInc.comps.map(_.toSeq).toSeq == model.comps.map(_.toSeq).toSeq)
  }
}
