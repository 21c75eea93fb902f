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

  /** Grouped Pearson correlation of two fixed-decimal metric columns,
    * computed from EXACT decimal co-moment sums (never the engine's
    * float-accumulating corr() — accumulation order differs across
    * engines): r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²)·√(n·Σy² − (Σy)²)).
    * One map-side-combined aggregate — the same 100 TB shape as any sum. */
  def corrSummary(df: DataFrame, groupCols: Seq[String],
      x: String, y: String, decimals: Int = 2): DataFrame = {
    val dx = col(x).cast(s"decimal(18,$decimals)")
    val dy = col(y).cast(s"decimal(18,$decimals)")
    val n = count("*").cast("double")
    val sx = sum(dx).cast("double"); val sy = sum(dy).cast("double")
    val sxx = sum(dx * dx).cast("double"); val syy = sum(dy * dy).cast("double")
    val sxy = sum(dx * dy).cast("double")
    val denom = sqrt(greatest(n * sxx - sx * sx, lit(0.0d))) *
      sqrt(greatest(n * syy - sy * sy, lit(0.0d)))
    df.groupBy(groupCols.map(col): _*)
      .agg(count("*").cast("long").as("n"),
        round((sx / n), 6).as("mean_x"),
        round((sy / n), 6).as("mean_y"),
        round(when(denom > 0.0d, (n * sxy - sx * sy) / denom)
          .otherwise(lit(null)), 6).as("pearson_r"))
      .orderBy(groupCols.map(col): _*)
  }

  /** Per-group z-score outlier detection — the metric-anomaly pass (flag
    * rows whose metric deviates > `threshold` sample standard deviations
    * from their group's mean). Group moments come from the same EXACT
    * decimal sums as [[metricSummary]] (cross-engine determinism); the
    * per-group stats table is GROUP-cardinality small, so the join back to
    * the rows is a broadcast hash join — the corpus pass stays map-side at
    * any scale (one partial-aggregate shuffle of |groups| rows, then a
    * map-only flag projection). z is rounded 6dp BEFORE thresholding, per
    * the shared determinism rule. */
  def zOutliers(df: DataFrame, groupCols: Seq[String], idCol: String,
      metric: String, threshold: Double, decimals: Int = 2): DataFrame = {
    val m = col(metric)
    val dsum = sum(m.cast(s"decimal(28,$decimals)")).cast("double")
    val dsumsq = sum(m.cast(s"decimal(18,$decimals)") * m.cast(s"decimal(18,$decimals)"))
      .cast("double")
    val n = count(lit(1))
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg((dsum / n).as("g_mean"),
        when(n > 1, sqrt(greatest(
          (dsumsq - dsum * dsum / n) / (n - 1), lit(0.0d)))).as("g_stddev"))
    df.join(broadcast(stats), groupCols)
      .withColumn("z", round(
        when(col("g_stddev") > 0.0d, (m - col("g_mean")) / col("g_stddev")), 6))
      .filter(abs(col("z")) > threshold)
      .select((Seq(col(idCol)) ++ groupCols.map(col) ++
        Seq(m, col("z"), round(col("g_mean"), 6).as("g_mean"))): _*)
      .orderBy(idCol)
  }

  /** Fixed-width histogram of an integer metric — the "length buckets"
    * report a curation pipeline emits. Bounds come from one min/max agg
    * (two longs to the driver — index-metadata scale); bin assignment is
    * then pure INTEGER arithmetic folded into the scan projection, so the
    * pass is map-side at any corpus size. (Equi-DEPTH binning via a
    * global-window ntile would be the single-partition trap — see
    * TextAnalysis.packSequences for the same avoidance — and
    * cutpoint-based depth bins inherit cross-engine percentile
    * interpolation ulps; fixed width is the deterministic shape.) */
  /** Two-sample Kolmogorov–Smirnov drift statistic over fixed-width
    * buckets — the distribution-shift monitor a training pipeline runs
    * between data snapshots (did `metric` drift between source A and
    * source B / last week and this week?). KS = max |F_A − F_B| over the
    * bucketed ECDFs; bucketing bounds the error by the largest bucket
    * mass and, crucially, bounds the CUMSUM domain: the running sums run
    * over ≤`nBins` aggregated rows, so the one global window here is a
    * bounded-cardinality frame by construction, not the single-partition
    * trap (exact KS would need a global sort of raw values).
    *
    * Cross-engine determinism: bucket width derives from one min/max agg
    * with the same double arithmetic both engines run; bin assignment is
    * floor of one division; ECDF differences are fixed-shape double
    * divisions rounded 6dp; argmax ties break on the lowest bin. */
  def ksDrift(df: DataFrame, groupCol: String, a: String, b: String,
      metric: String, nBins: Int = 200): DataFrame = {
    val f = df.filter(col(groupCol).isin(a, b))
    val bounds = f.agg(min(col(metric)).cast("double"),
      max(col(metric)).cast("double"),
      sum(when(col(groupCol) === a, 1L).otherwise(0L)),
      sum(when(col(groupCol) === b, 1L).otherwise(0L))).head()
    require(!bounds.isNullAt(0) && bounds.getLong(2) > 0 && bounds.getLong(3) > 0,
      s"ksDrift: both groups '$a' and '$b' need at least one non-null '$metric' row " +
        s"(got a=${if (bounds.isNullAt(2)) 0 else bounds.getLong(2)}, " +
        s"b=${if (bounds.isNullAt(3)) 0 else bounds.getLong(3)})")
    val lo = bounds.getDouble(0)
    val width = math.max((bounds.getDouble(1) - lo) / nBins, 1e-12)
    val binned = f
      .withColumn("bin", least(lit(nBins - 1L),
        floor((col(metric).cast("double") - lit(lo)) / lit(width))).cast("long"))
      .groupBy("bin")
      .agg(
        sum(when(col(groupCol) === a, 1L).otherwise(0L)).cast("long").as("ca_"),
        sum(when(col(groupCol) === b, 1L).otherwise(0L)).cast("long").as("cb_"))
    val tot = binned.agg(sum("ca_").cast("double").as("na"),
      sum("cb_").cast("double").as("nb"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    binned
      .withColumn("ca", sum("ca_").over(w).cast("double"))
      .withColumn("cb", sum("cb_").over(w).cast("double"))
      .crossJoin(broadcast(tot))
      .withColumn("d", round(abs(col("ca") / col("na") - col("cb") / col("nb")), 6))
      .orderBy(desc("d"), asc("bin"))
      .limit(1)
      .select(col("d").as("ks_stat"), col("bin").as("at_bin"),
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"))
  }

  /** Population stability index over the same fixed-width buckets as
    * [[ksDrift]]: PSI = Σ_bins (p_A − p_B)·ln(p_A / p_B) with ε-smoothed
    * shares (industry-standard drift score; >0.25 conventionally = major
    * shift). KS sees the worst POINT divergence, PSI integrates shift
    * across the whole distribution — monitors run both.
    *
    * Determinism: the Σ is an ORDERED fold — per-bin terms are collected
    * into a bin-sorted array and reduced left-to-right (matching the
    * oracle's ordered list_reduce) because a hash-aggregate SUM of
    * doubles associates nondeterministically. The array is ≤nBins
    * entries: bounded, like the KS cumsum. */
  def psiDrift(df: DataFrame, groupCol: String, a: String, b: String,
      metric: String, nBins: Int = 200, eps: Double = 1e-6): DataFrame = {
    val f = df.filter(col(groupCol).isin(a, b))
    val bounds = f.agg(min(col(metric)).cast("double"),
      max(col(metric)).cast("double"),
      sum(when(col(groupCol) === a, 1L).otherwise(0L)),
      sum(when(col(groupCol) === b, 1L).otherwise(0L))).head()
    require(!bounds.isNullAt(0) && bounds.getLong(2) > 0 && bounds.getLong(3) > 0,
      s"psiDrift: both groups '$a' and '$b' need at least one non-null '$metric' row " +
        s"(got a=${if (bounds.isNullAt(2)) 0 else bounds.getLong(2)}, " +
        s"b=${if (bounds.isNullAt(3)) 0 else bounds.getLong(3)})")
    val lo = bounds.getDouble(0)
    val width = math.max((bounds.getDouble(1) - lo) / nBins, 1e-12)
    val binned = f
      .withColumn("bin", least(lit(nBins - 1L),
        floor((col(metric).cast("double") - lit(lo)) / lit(width))).cast("long"))
      .groupBy("bin")
      .agg(
        sum(when(col(groupCol) === a, 1L).otherwise(0L)).cast("long").as("ca_"),
        sum(when(col(groupCol) === b, 1L).otherwise(0L)).cast("long").as("cb_"))
    val tot = binned.agg(sum("ca_").cast("double").as("na"),
      sum("cb_").cast("double").as("nb"))
    binned
      .crossJoin(broadcast(tot))
      .withColumn("pa", col("ca_").cast("double") / col("na") + lit(eps))
      .withColumn("pb", col("cb_").cast("double") / col("nb") + lit(eps))
      .withColumn("term", (col("pa") - col("pb")) * log(col("pa") / col("pb")))
      .agg(
        round(aggregate(
          expr("transform(array_sort(collect_list(struct(bin, term))), s -> s.term)"),
          lit(0.0d), (acc, x) => acc + x), 6).as("psi"),
        max(col("na")).cast("long").as("n_a"),
        max(col("nb")).cast("long").as("n_b"))
  }

  def histogramBins(df: DataFrame, metric: String, nBins: Int): DataFrame = {
    val b = df.agg(min(col(metric)).cast("long"), max(col(metric)).cast("long"))
      .head()
    val lo = b.getLong(0)
    val width = math.max(1L, (b.getLong(1) - lo + nBins) / nBins)
    df.withColumn("bin", ((col(metric).cast("long") - lo) / lit(width))
        .cast("long"))
      .groupBy("bin")
      .agg(count("*").cast("long").as("n"),
        min(col(metric)).cast("long").as("lo"),
        max(col(metric)).cast("long").as("hi"))
      .orderBy("bin")
  }

  /** Embedding-health report over RAW (un-normalized) vectors — the
    * collapse/anisotropy diagnostic run before trusting a vector corpus
    * (Ethayarajh '19 measured how anisotropic real embedding spaces get;
    * a near-zero-variance dimension or a norm distribution collapsing to
    * a point are the classic symptoms of a broken encoder export).
    * One row: dim count, norm min/mean/max, mean per-dim variance, the
    * largest per-dim variance and which dimension owns it, and
    * anisotropy = max_var / mean_var.
    *
    * Determinism: per-row norms are 6dp-rounded then DECIMAL-summed
    * (order-free); per-dim moments follow the label_centroids rule
    * (round the avg at 6dp, then single double ops on identical
    * operands); the max-variance dim ties to the smallest dim. Shape:
    * one posexplode + a dim-keyed aggregate + a row-keyed projection —
    * two scans, no corpus-sized state. */
  def embeddingHealth(emb: DataFrame): DataFrame = {
    val d = emb.select(posexplode(col("embedding")).as(Seq("dim", "v")))
    val dims = d.groupBy("dim")
      .agg(round(avg("v"), 6).as("m"),
        round(avg(col("v") * col("v")), 6).as("m2"))
      .withColumn("variance", round(col("m2") - col("m") * col("m"), 6))
    val topDim = dims
      .orderBy(desc("variance"), asc("dim"))
      .limit(1)
      .select(col("variance").as("max_var"), col("dim").cast("long").as("max_var_dim"))
    val dimAgg = dims.agg(
      count(lit(1)).cast("long").as("dim_count"),
      round(sum(col("variance").cast("decimal(28,6)")).cast("double")
        / count(lit(1)), 6).as("mean_var"))
    val norms = emb.select(
      round(sqrt(graft.functions.VectorOps.dot(col("embedding"), col("embedding"))), 6)
        .as("nrm"))
    val normAgg = norms.agg(
      round(min(col("nrm")), 6).as("min_norm"),
      round(sum(col("nrm").cast("decimal(28,6)")).cast("double")
        / count(lit(1)), 6).as("mean_norm"),
      round(max(col("nrm")), 6).as("max_norm"))
    dimAgg.crossJoin(topDim).crossJoin(normAgg)
      .withColumn("anisotropy", round(col("max_var") / col("mean_var"), 6))
      .select(col("dim_count"), col("min_norm"), col("mean_norm"),
        col("max_norm"), col("mean_var"), col("max_var"),
        col("max_var_dim"), col("anisotropy"))
  }
}
