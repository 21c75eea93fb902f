package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Performance/statistics rollups (reference A3/A4:
  * src/utils/performance.py:139-175 mean/median/min/max/stdev summaries and
  * scripts/performance_test.py:451-476 p95/p99 percentiles) as engine
  * operators over any metric column.
  *
  * Determinism: inputs are fixed-decimal metrics, so first/second moments
  * are computed from EXACT decimal sums (stddev via the sum-of-squares
  * identity) — bit-identical across engines. Percentiles use exact linear
  * interpolation (`percentile`, not `percentile_approx` — approx sketches
  * are engine-specific; at 100 TB swap in percentile_approx and accept the
  * documented error bound).
  */
object Stats {

  /** Grouped metric summary: n, mean, min, max, sample stddev, p50/p95/p99.
    * `metric` must be a fixed-2-decimal DOUBLE column. */
  def metricSummary(df: DataFrame, groupCols: Seq[String], metric: String,
      decimals: Int = 2): DataFrame = {
    val m = col(metric)
    val dsum = sum(m.cast(s"decimal(28,$decimals)")).cast("double")
    val dsumsq = sum((m.cast(s"decimal(18,$decimals)") * m.cast(s"decimal(18,$decimals)")))
      .cast("double")
    val n = count("*")
    df.groupBy(groupCols.map(col): _*)
      .agg(
        n.cast("long").as("n"),
        (dsum / n).as("mean"),
        min(m).as("min_v"),
        max(m).as("max_v"),
        // sample stddev from exact sums: sqrt((Σx² − (Σx)²/n) / (n−1))
        when(n > 1, sqrt(greatest(
          (dsumsq - dsum * dsum / n) / (n - 1), lit(0.0d)))).as("stddev_v"),
        // rounded: Spark interpolates a*(1-f)+b*f, DuckDB a+f*(b-a) —
        // equal mathematically, ulp-different in float
        round(percentile(m, lit(0.5)), 6).as("p50"),
        round(percentile(m, lit(0.95)), 6).as("p95"),
        round(percentile(m, lit(0.99)), 6).as("p99"))
      .orderBy(groupCols.map(col): _*)
  }
}
