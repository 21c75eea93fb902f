package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression quality filter — the trained-model
  * counterpart of [[TextAnalysis.trainQualityModel]]'s one-pass naive
  * Bayes, and the second standard shape of the "model-based quality
  * filtering" stage (public practice: GPT-3 §2.2 trains a logistic
  * classifier over document features; CCNet/fastText is a linear model
  * on hashed features). The NB form is a single counting aggregate; this
  * form is ITERATIVE distributed training — full-batch gradient descent,
  * one map-side-combined aggregate per step — the execution shape every
  * trained-on-corpus model (LR, linear probes, GLMs) needs at 100 TB.
  *
  * Determinism rules:
  *  - Per-row gradient terms (σ(w·x) − y)·x_j are doubles (σ is
  *    transcendental), but they are summed IN DECIMAL after a
  *    deterministic per-element cast — the gradient is exact given the
  *    per-row terms, so training is bit-reproducible across runs,
  *    partitionings, and physical plans (spec-pinned).
  *  - Weights are rounded to 6dp and persisted as a ≤(k+1)-row side
  *    table; SCORING is a pure fixed-order linear form over 6dp features
  *    and 6dp weights — no transcendental ever meets the cross-engine
  *    comparison (the kmeans/PQ side-table rule).
  *
  * Scale shape: the feature frame is computed once and cached (at fleet
  * scale: materialized once, the standard iterative-training layout);
  * each GD step is ONE aggregate producing k+1 decimal sums — shuffle
  * bytes per step are (k+1) rows per map task, independent of N. The
  * model is driver-side scalars (index-metadata tier). No driver-side
  * per-row work anywhere.
  */
object LogReg {

  /** Bounded per-doc quality features, all engine-recomputable at 6dp:
    * (doc_id, f1 length signal, f2 distinct ratio, f3 stopword ratio,
    * f4 bounded avg word length, y weak label). The weak label is the
    * heuristic quality gate ([[TextAnalysis.qualityStats]] score ≥
    * `labelThreshold`) — the same bootstrap the NB filter trains on. */
  def qualityFeatures(docs: DataFrame, labelThreshold: Double = 0.2): DataFrame =
    TextAnalysis.qualityStats(docs)
      .select(col("doc_id"),
        least(lit(1.0d), col("word_count") / 100.0d).as("f1"),
        col("distinct_ratio").as("f2"),
        col("stopword_ratio").as("f3"),
        least(lit(1.0d), col("avg_word_len") / 10.0d).as("f4"),
        when(col("quality_score") >= labelThreshold, 1.0d).otherwise(0.0d).as("y"))

  /** Full-batch GD on the cached feature frame: `iters` steps of
    * w ← w − lr·(1/n)·Σ (σ(w·x) − y)·x, gradient summed in DECIMAL.
    * Returns the 6dp-rounded weight vector [bias, w1..w4]. */
  def train(feats: DataFrame, iters: Int = 20, lr: Double = 2.0): Array[Double] = {
    val sel = feats.select("f1", "f2", "f3", "f4", "y")
    // respect a caller-managed cache: unpersist() removes the cache entry
    // for ANY sameResult plan, so blindly cache-and-unpersist here would
    // evict the caller's cached feature frame behind its back (measured:
    // a 45 s rebuild on the next action at 500k docs)
    val callerCached = sel.storageLevel.useMemory || sel.storageLevel.useDisk
    val cached = if (callerCached) sel else sel.cache()
    try {
      val w = Array.fill(5)(0.0)
      var t = 0
      while (t < iters) {
        val z = lit(w(0)) + lit(w(1)) * col("f1") + lit(w(2)) * col("f2") +
          lit(w(3)) * col("f3") + lit(w(4)) * col("f4")
        val p = lit(1.0d) / (lit(1.0d) + exp(-z))
        val r = p - col("y")
        def g(c: Column) = sum((r * c).cast("decimal(38,18)")).cast("double")
        val row = cached.agg(
          g(lit(1.0d)), g(col("f1")), g(col("f2")), g(col("f3")), g(col("f4")),
          count(lit(1))).head()
        val n = row.getLong(5).toDouble
        var j = 0
        while (j < 5) { w(j) -= lr * row.getDouble(j) / n; j += 1 }
        t += 1
      }
      w.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    } finally if (!callerCached) cached.unpersist()
  }

  /** The trained weights as their persistable side table (j, w). */
  def weightsTable(spark: SparkSession, w: Array[Double]): DataFrame = {
    import spark.implicits._
    w.toSeq.zipWithIndex.map { case (x, j) => (j, x) }.toDF("j", "w")
  }

  /** Exact decimal mean log-loss of the weight vector on the feature
    * frame (diagnostic / spec support): −(1/n)·Σ [y ln p + (1−y) ln(1−p)],
    * per-row terms clamped away from 0/1 before ln. */
  def logLoss(feats: DataFrame, w: Array[Double]): Double = {
    val z = lit(w(0)) + lit(w(1)) * col("f1") + lit(w(2)) * col("f2") +
      lit(w(3)) * col("f3") + lit(w(4)) * col("f4")
    val p = least(lit(1.0d - 1e-12), greatest(lit(1e-12),
      lit(1.0d) / (lit(1.0d) + exp(-z))))
    val term = -(col("y") * log(p) + (lit(1.0d) - col("y")) * log(lit(1.0d) - p))
    val row = feats.agg(
      sum(term.cast("decimal(38,18)")).cast("double"), count(lit(1))).head()
    row.getDouble(0) / row.getLong(1)
  }

  /** Score every document with the persisted weights: logit in the FIXED
    * evaluation order w0 + w1·f1 + … (identically writable in SQL),
    * rounded to 6dp; keep ⇔ logit > 0. The weights arrive as collected
    * literals from the ≤5-row side table — broadcast-free pure map. */
  def score(docs: DataFrame, weights: DataFrame): DataFrame = {
    val w = weights.orderBy("j").select("w").collect().map(_.getDouble(0))
    require(w.length == 5, s"expected 5 weights, got ${w.length}")
    qualityFeatures(docs)
      .select(col("doc_id"),
        round(lit(w(0)) + lit(w(1)) * col("f1") + lit(w(2)) * col("f2") +
          lit(w(3)) * col("f3") + lit(w(4)) * col("f4"), 6).as("lr_logit"),
        col("y").cast("long").as("weak_label"))
      .withColumn("keep", (col("lr_logit") > 0.0d).cast("long"))
      .orderBy("doc_id")
  }
}
