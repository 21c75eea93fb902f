package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Deterministic hash-based sampling for training-data curation: stratified
  * sampling with per-stratum rates and train/test splitting.
  *
  * The keep decision is a pure function of (salt, row id): bucket =
  * hash60(salt ‖ id) mod `Buckets`, keep iff bucket < rate·Buckets. No RNG
  * state, no `rand()` — the sample is reproducible across runs, engines,
  * partitionings and cluster sizes (Spark's `df.sample` is none of those),
  * rows can be re-derived or audited later, and changing the salt draws an
  * independent sample. This is the only sampling shape that is safe at
  * 100 TB: a map-side filter with zero shuffle, pushable next to the scan.
  */
object Sampling {

  val Buckets = 1000000L

  /** Deterministic bucket in [0, Buckets) from a salted 60-bit hash of the
    * row id (hash60 is non-negative, so % == pmod). */
  def hashBucket(idCol: Column, salt: String): Column =
    pmod(TextOps.hash60(concat(lit(salt + "_"), idCol.cast("string"))),
      lit(Buckets))

  /** Per-stratum sampling rates: keep iff bucket < rate(stratum)·Buckets.
    * `rates` maps stratum values to rates; unlisted strata get
    * `defaultRate`. Appends `_bucket` and `_keep` columns (filter on
    * `_keep` for the sample; keeping both makes the decision auditable). */
  def stratifiedSample(
      df: DataFrame, idCol: Column, stratumCol: Column,
      rates: Seq[(String, Double)], defaultRate: Double,
      salt: String): DataFrame = {
    val cutoff = rates.foldLeft(lit((defaultRate * Buckets).toLong)) {
      case (acc, (value, rate)) =>
        when(stratumCol === value, lit((rate * Buckets).toLong)).otherwise(acc)
    }
    df.withColumn("_bucket", hashBucket(idCol, salt))
      .withColumn("_keep", col("_bucket") < cutoff)
  }

  /** Deterministic train/test split: `split` = "train" iff bucket <
    * trainFrac·Buckets. Same hash family as stratifiedSample with a
    * DIFFERENT salt, so split membership and sample membership are
    * independent. */
  def trainTestSplit(
      df: DataFrame, idCol: Column, trainFrac: Double,
      salt: String): DataFrame =
    df.withColumn("split",
      when(hashBucket(idCol, salt) < lit((trainFrac * Buckets).toLong),
        lit("train")).otherwise(lit("test")))

  /** Temperature-based source mixing — the standard recipe for balancing a
    * multi-source training corpus (sampling sources ∝ n^α with α < 1
    * upweights small sources; α = 0.5 here, the multilingual-sampling
    * default popularized by mBERT/XLM-R and used for dataset mixing at
    * scale): target a `totalFrac` overall sample whose per-source share is
    * ∝ √n_source, i.e. rate_s = min(1, totalFrac·N·√n_s / (Σ√ · n_s)),
    * rounded to 6dp. Rates derive from the tiny per-source count table
    * (one agg + driver fold in SOURCE ORDER — √ is IEEE-exact in any
    * engine, and the ordered fold makes the Σ reproducible); membership
    * is then the same salted-hash map-side filter as [[stratifiedSample]],
    * so the pass over the corpus is shuffle-free. */
  def temperatureMix(
      df: DataFrame, idCol: Column, sourceCol: Column,
      totalFrac: Double, salt: String): DataFrame = {
    val counts = df.groupBy(sourceCol.as("_src"))
      .agg(count("*").as("_n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    val n = counts.map(_._2).sum
    val sumSqrt = counts.foldLeft(0.0) { case (acc, (_, c)) =>
      acc + math.sqrt(c.toDouble)
    }
    // integer bucket cutoffs (floor — identical in any IEEE engine given
    // the same operation order), never a re-derived double rate
    val cutoffs = counts.map { case (s, c) =>
      s -> math.min(Buckets, math.floor(
        totalFrac * n * math.sqrt(c.toDouble) / (sumSqrt * c.toDouble) * 1e6)
        .toLong)
    }
    val cutoff = cutoffs.foldLeft(lit(0L)) { case (acc, (value, k)) =>
      when(sourceCol === value, lit(k)).otherwise(acc)
    }
    df.withColumn("_bucket", hashBucket(idCol, salt))
      .withColumn("_keep", col("_bucket") < cutoff)
  }

  /** Per-group contribution cap — "no source may contribute more than `n`
    * rows", the anti-dominance guard of corpus curation (one crawl dump
    * must not drown the mix). Deterministic reservoir: rows rank within
    * their group by a salted hash (uniform and reproducible — an audit
    * can re-derive exactly why a row was kept) and the first `n` survive.
    *
    * Scale shape: row_number + `rank <= n` plans as WindowGroupLimit with
    * a PARTIAL pass before the shuffle (the knnBatch top-k shape), so a
    * dominant group is trimmed to ≤n per map task first — the shuffle
    * moves O(n · tasks) rows per group, not the whole hot group. */
  def capPerGroup(
      df: DataFrame, groupCol: Column, idCol: Column,
      n: Int, salt: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(asc("_h"), idCol.asc)
    df.withColumn("_h", TextOps.hash60(concat_ws("_",
        lit(salt), groupCol.cast("string"), idCol.cast("string"))))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_h", "_rn")
  }

  /** UniMax budget allocation (Chung et al. '23, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): given a total token budget and a per-source epoch
    * cap, allocate the budget as UNIFORMLY as possible across sources
    * without repeating any source more than `maxEpochs` times — the
    * waterfilling allocation that modern mixtures use where temperature
    * sampling ([[temperatureMix]]) would still over-sample giants and
    * over-epoch tiny sources.
    *
    * Closed form, fully declarative (no driver loop): sort sources by
    * capacity cap_i = n_tokens_i·maxEpochs ascending; the waterline at
    * prefix j is (B − Σ_{i<j} cap_i) ÷ (m − j + 1) in INTEGER floor
    * division; the first j whose capacity reaches its own waterline
    * starts the uncapped tail — sources before it take their full cap,
    * the rest take the tail's (constant) waterline. All integer math —
    * bit-identical in any engine. Two tiny aggregates + windows over an
    * m-row frame (m = source count — index-metadata scale, but the
    * plan never collects it).
    *
    * Returns one row per source: (source, n_tokens, capacity,
    * allocated, epochs = 6dp allocated/n_tokens). Σ allocated ≤ B with
    * equality when the budget is attainable (floor remainders of the
    * uncapped tail are deliberately not redistributed — allocation is
    * auditable from the formula alone). */
  def unimaxAllocate(
      docs: DataFrame, sourceCol: Column, tokensCol: Column,
      budgetTokens: Long, maxEpochs: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("cap", "source")
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy("cap", "source")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val caps = docs
      .groupBy(sourceCol.as("source"))
      .agg(sum(tokensCol).cast("long").as("n_tokens"))
      .withColumn("cap", col("n_tokens") * maxEpochs)
    val lev = caps
      .withColumn("j", row_number().over(w).cast("long"))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("pfx", coalesce(sum(col("cap")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          -1)), lit(0L)))
      // integer waterline at this prefix (div, never a double divide:
      // exact at any magnitude; negative waterlines — budget already
      // exhausted by smaller caps — only ever feed `cap >= level` and a
      // greatest(_, 0), where truncate-vs-floor cannot matter)
      .withColumn("level",
        expr(s"(CAST($budgetTokens AS BIGINT) - pfx) div (m - j + 1)"))
    val jstar = lev
      .filter(col("cap") >= col("level"))
      .agg(min(col("j")).as("jstar"))
    lev.crossJoin(broadcast(jstar))
      .withColumn("tail_level", max(when(col("j") === col("jstar"),
        col("level"))).over(wAll))
      .withColumn("allocated",
        when(col("jstar").isNull || col("j") < col("jstar"), col("cap"))
          .otherwise(greatest(col("tail_level"), lit(0L))))
      .withColumn("epochs",
        round(col("allocated").cast("double") / col("n_tokens"), 6))
      .select(col("source"), col("n_tokens"), col("cap").as("capacity"),
        col("allocated"), col("epochs"))
      .orderBy("source")
  }
}
