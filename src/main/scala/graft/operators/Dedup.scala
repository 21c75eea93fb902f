package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextOps, VectorOps}
import graft.plans.VectorExpressions

/** Deduplication operators for the training-data pipeline: exact
  * (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard, and
  * embedding-cosine near-dup.
  *
  * Scale design: every variant is candidate-generation-by-key so the only
  * shuffles are hash partitions on short keys (band signature / simhash
  * chunk / group hash) — never an all-pairs product. At 100 TB the
  * candidate join is the classic LSH bucket self-join: explode to
  * (band_key, doc) rows, shuffle once on band_key, pair within buckets,
  * exact-verify only the candidates. The all-pairs oracle exists only in
  * the DuckDB verification SQL at sf0.01.
  */
object Dedup {

  /** Exact dedup via canonical bag-of-words key: groups of docs with the
    * same sorted-distinct word set (order/repetition-insensitive exact
    * duplicate clusters). One hash aggregate. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .withColumn("bow_key", TextOps.bagOfWordsKey(TextOps.words(col("text"))))
      .groupBy("bow_key")
      .agg(count("*").cast("long").as("n_docs"), min("doc_id").as("keep_doc_id"))
      .filter(col("n_docs") > 1)
      .orderBy("keep_doc_id")

  /** N-gram (word shingle) Jaccard near-dup pairs — the exact quadratic
    * kernel. `blockOn` (e.g. `source`) turns the cross product into an
    * equi-join: pairs are only formed within a block, which is both the
    * semantic contract ("dedup within source") and the scale path — the
    * quadratic cost is per-block, the shuffle a hash partition on the block
    * key. Without blocking, reserve for verified candidate sets.
    * Returns (doc_a, doc_b, jaccard) with jaccard >= threshold. */
  def ngramJaccardPairs(
      docs: DataFrame, n: Int, threshold: Double,
      blockOn: Option[String] = None): DataFrame = {
    val sh = docs
      .withColumn("sh", TextOps.shingleHashSet(TextOps.words(col("text")), n))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id") +: col("sh") +: blockOn.map(col).toSeq: _*)
    val a = sh.select(col("doc_id").as("doc_a") +: col("sh").as("sh_a")
      +: blockOn.map(c => col(c).as("blk_a")).toSeq: _*)
    val b = sh.select(col("doc_id").as("doc_b") +: col("sh").as("sh_b")
      +: blockOn.map(c => col(c).as("blk_b")).toSeq: _*)
    val cond = blockOn
      .map(_ => col("blk_a") === col("blk_b") && col("doc_a") < col("doc_b"))
      .getOrElse(col("doc_a") < col("doc_b"))
    a.join(b, cond)
      .withColumn("ic", VectorExpressions.sortedIntersectCount(col("sh_a"), col("sh_b")))
      .withColumn("jaccard", round(
        TextOps.jaccardFromCount(col("ic"), size(col("sh_a")), size(col("sh_b"))), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash+LSH near-dup pairs: shingle → 60-bit base hash → k-perm
    * minhash signature → banded LSH keys → bucket self-join for candidates
    * → exact Jaccard verification >= threshold.
    *
    * With k=128, bands=32, rows=4 the probability of missing a pair at
    * jaccard j is (1 - j^4)^32 — <1e-10 at j=0.85, 13% at j=0.5 — so pick
    * thresholds >= ~0.7 for exact-recall-grade results.
    *
    * Physical shape: the signature is built as EXPLODE(shingles) → 128 flat
    * `min(...)` aggregates — each shingle hashed exactly once and every
    * expression whole-stage-codegen'd with map-side partial aggregation
    * (nested HOF formulations re-evaluate the shingle pipeline per
    * permutation per band — a multiplicative interpreted-eval blowup).
    * Then one explode×bands + hash partition on band key; no quadratic
    * stage (bucket sizes bound by near-dup cluster size, not corpus size).
    */
  def minHashLshPairs(
      docs: DataFrame,
      n: Int = 3,
      k: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.7): DataFrame = {
    val rows = k / bands
    val p = TextOps.MinHashP
    val shingleRows = docs
      .select(col("doc_id"),
        explode(TextOps.shingleHashSet(TextOps.words(col("text")), n)).as("sh60"))
      .withColumn("h", pmod(col("sh60"), lit(p)))
    val minExprs = (0 until k).map { i =>
      val a = 2L * i + 1
      val b = (i.toLong * 40503L) % p
      min(pmod(col("h") * a + b, lit(p))).as(s"m$i")
    }
    val sigs = shingleRows.groupBy("doc_id").agg(minExprs.head, minExprs.tail: _*)
    val bandCols = (0 until bands).map { bIdx =>
      md5(concat_ws("_", (0 until rows).map(r => col(s"m${bIdx * rows + r}")): _*))
    }
    val banded = sigs.select(col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_key")))
    val cands = banded.select(col("doc_id").as("doc_a"), col("band_idx"), col("band_key"))
      .join(banded.select(col("doc_id").as("doc_b"), col("band_idx"), col("band_key")),
        Seq("band_idx", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    // exact verification: join candidate pairs back to the shingle hash sets
    val sh = docs
      .withColumn("sh", TextOps.shingleHashSet(TextOps.words(col("text")), n))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"))
    cands
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("ic", VectorExpressions.sortedIntersectCount(col("sh_a"), col("sh_b")))
      .withColumn("jaccard", round(
        TextOps.jaccardFromCount(col("ic"), size(col("sh_a")), size(col("sh_b"))), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash near-dup pairs at Hamming radius <= `maxHamming` (<=3):
    * 60-bit simhash per doc, candidates via equality on any of the four
    * 15-bit chunks (pigeonhole ⇒ EXACT recall at radius 3), then exact
    * Hamming verification. Returns (doc_a, doc_b, hamming). */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "chunk banding guarantees recall only to radius 3")
    // explode words → hash once per word → 60 flat codegen'd bit-vote sums
    // → pack; one hash shuffle on doc_id (map-side partial aggregation).
    val wordRows = docs
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
      .withColumn("wh", TextOps.hash60(col("w")))
    val bitSums = (0 until 60).map(j =>
      sum(when(col("wh").bitwiseAND(lit(1L << j)) =!= 0L, 1L).otherwise(-1L)).as(s"b$j"))
    val h = wordRows.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(j => when(col(s"b$j") > 0L, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
    val chunks = h.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(i => TextOps.simChunk(col("simhash"), i)): _*))
        .as(Seq("chunk_idx", "chunk")))
    val l = chunks.select(col("doc_id").as("doc_a"), col("simhash").as("h_a"),
      col("chunk_idx"), col("chunk"))
    val r = chunks.select(col("doc_id").as("doc_b"), col("simhash").as("h_b"),
      col("chunk_idx"), col("chunk"))
    l.join(r, Seq("chunk_idx", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "h_a", "h_b").distinct()
      .withColumn("hamming", TextOps.hamming(col("h_a"), col("h_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Connected components over a near-dup pair list: every document gets a
    * `cluster_id` = the smallest doc id reachable through the pair graph.
    * Pair-producing dedup (minhash/simhash/cosine) yields EDGES; the unit
    * of deduplication is the transitive CLUSTER (keep one doc per
    * component), so this is the step that turns pair lists into keep/drop
    * decisions.
    *
    * Algorithm: iterative min-label propagation — labels(node) starts as
    * node, each round takes the min over the node's own label and its
    * neighbors' labels, until a fixpoint. Converges in O(component
    * diameter) rounds; near-dup clusters are dense and shallow (diameter
    * 2-4 in practice), so this terminates in a handful of rounds. Each
    * round is one hash-shuffle join on node id + one hash aggregate —
    * uniform keys, no skew; `localCheckpoint` cuts the lineage so plan
    * size stays constant across rounds. (The large-star/small-star
    * optimization halves round count at extreme scale; the propagation
    * topology is identical.) */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 30): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lab", col("node"))
      .localCheckpoint()
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val neighborLabs = edges
        .join(labels, edges("src") === labels("node"))
        .select(col("dst").as("node"), col("lab"))
      val next = labels.select("node", "lab").union(neighborLabs)
        .groupBy("node").agg(min("lab").as("lab"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("lab", "prev"), "node")
        .filter(col("lab") =!= col("prev")).count()
      labels = next
      converged = changed == 0L
      it += 1
    }
    labels.select(col("node"), col("lab").as("cluster_id"))
  }

  /** Embedding-cosine near-dup pairs over a normalized-embedding collection:
    * (id_a, id_b, cos) with cos >= threshold. Exact path is a self-join;
    * the scale path buckets by LSH/IVF first (see Ann) so the join is
    * per-bucket. */
  def embeddingCosinePairs(points: DataFrame, threshold: Double): DataFrame = {
    val a = points.select(col("id").as("id_a"), col("embedding").as("e_a"))
    val b = points.select(col("id").as("id_b"), col("embedding").as("e_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(VectorOps.dot(col("e_a"), col("e_b")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
