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
  */
object Num {
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
}
