package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor (OPTIMIZATION r17, guide §2 "make
  * partitioning scale-adaptive... rather than a constant tuned for either
  * local mode or the cluster").
  *
  * Heavy per-row kernels (word hashing, n-gram shingles, minhash/simhash
  * signatures, DSIR features) inherit the scan's partition count. A small
  * input — one parquet file under `spark.sql.files.maxPartitionBytes` —
  * plans as ONE scan partition, so the whole kernel serializes on one
  * core while the rest of the box idles (measured: 857 ms single-task
  * minhash stage, 1.06 s single-task DSIR stage at sf0.1 on 32 cores).
  * At 100 TB the scan's splits already exceed the session parallelism and
  * this is an exact no-op — the decision reads the plan's size STATISTIC
  * (no job, no extra pass) and only round-robins inputs the planner
  * would put in fewer splits than the session has cores.
  */
object Par {

  /** Round-robin `df` to the session's default parallelism when its
    * estimated size fits inside one scan split; identity otherwise.
    * Purely a physical re-distribution: row content is untouched, and
    * every downstream operator in this codebase is partition-agnostic
    * (deterministic aggregates / totally-ordered windows), so results
    * are bit-identical either way. */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    // ANALYZED-plan statistic, not optimized: running the optimizer just
    // to read a size estimate costs a full Catalyst pass per call
    // (measured: spreading the relational/events loaders this way, with
    // several loads per query, doubled those queries' wall time — that
    // experiment was reverted; see OPTIMIZATION_r17.md)
    val analyzed = df.queryExecution.analyzed
    // scan-chain gate: only a plain projection/filter over a leaf inherits
    // the scan's (possibly single) split count — that is the serialization
    // this floor exists to fix. A derived frame (join/aggregate/window
    // upstream) already owns a shuffle-determined partition count, and
    // repartitioning it was measured a net loss (curate pipeline 1.2-1.3×;
    // see OPTIMIZATION_r17.md)
    val scanChain = analyzed.collect {
      // file-source leaves only: a checkpointed frame (LogicalRDD) owns
      // its materialized partition count — re-exchanging it was measured
      // a regression (dedup_clusters_sigdedup 1.4×)
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        true
      case _: org.apache.spark.sql.catalyst.plans.logical.Project => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Filter => true
      case _: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias => true
      case _ => false
    }.forall(identity)
    val est = analyzed.stats.sizeInBytes
    if (!scanChain || est > BigInt(maxSplit)) df
    else df.repartition(spark.sparkContext.defaultParallelism)
  }
}
