package graft.plans

/** The one 6-decimal rounding kernel every oracle-parity path shares.
  *
  * Spark `round(x, 6)` semantics on DoubleType: shortest-representation
  * BigDecimal, HALF_UP. Cross-engine determinism (README "Design rules")
  * hinges on every engine-side kernel — codegen expressions, the serving
  * replica tier, MMR rerank, multimodal decode — rounding bit-identically
  * to the `round(col, 6)` the oracle SQL uses, so the kernel lives in
  * exactly one place. A top-level object gets a static forwarder, so
  * generated Java (`doGenCode`) can call `graft.plans.Num.round6(...)`
  * directly and stay bit-identical with the interpreted `eval` path.
  *
  * Implementation: `BigDecimal.valueOf` stringifies the double and
  * re-parses it (~1 µs) — measured as the DOMINANT cost of the
  * centroid-assignment expressions (N·C calls in `ivfAssign`; a k-means||
  * seeding sweep at C=268 spent ~7 s of its 7.8 s here). The hot path is
  * now pure FP with a PROVEN-equal guard:
  *
  *  - `f = x·1e6` differs from the shortest-repr decimal value of x
  *    scaled by 1e6 by ≤ 1.5·ulp(f) (≤ 0.5 ulp multiply rounding +
  *    ≤ 1 ulp shortest-repr displacement, since |repr(x)−x| ≤
  *    ulp(x)/2 and ulp(x)·1e6 ≤ 2·ulp(f));
  *  - when f is farther than that from every decimal tie boundary
  *    k+0.5, round-to-nearest of f and HALF_UP of the shortest repr
  *    pick the SAME integer k, and `k/1e6` (correctly-rounded double
  *    division of an exact-integer double) is the same nearest-double
  *    the BigDecimal path's `doubleValue()` returns;
  *  - otherwise (within `margin` of a boundary — a ~1e-9 fraction of
  *    inputs — or when |f| is large enough that margin spans the whole
  *    interval, or NaN/±Inf where the comparison is false) it falls
  *    back to the reference BigDecimal form, preserving semantics
  *    INCLUDING the NumberFormatException on NaN/Inf.
  *
  * AlgebraPropertySpec certifies fast ≡ reference over random magnitudes
  * and adversarially constructed boundary values.
  */
object Num {
  def round6(x: Double): Double = {
    val f = x * 1e6
    val fl = Math.floor(f)
    val frac = f - fl
    val margin = 1e-9 + 2.0 * Math.ulp(f)
    if (frac > 0.5 + margin || frac < 0.5 - margin) Math.floor(f + 0.5) / 1e6
    else round6Ref(x)
  }

  /** The reference (Spark-semantics) form — slow, always correct. */
  def round6Ref(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
}
