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

  /** N-gram (word shingle) Jaccard near-dup pairs — EXACT, with lossless
    * prefix-filtered candidate generation (AllPairs/PPJoin family, Bayardo
    * et al. 2007 / Xiao et al. 2008): a pair with J >= t must share a
    * token among the first |S| - ceil(t'·|S|) + 1 tokens of EACH set under
    * any fixed total token order (here: ascending 60-bit shingle hash) —
    * if all common tokens sat past A's prefix, the overlap could be at
    * most ceil(t'|A|) - 1 < the t-required overlap. So candidates come
    * from an EQUI-JOIN on exploded prefix tokens, never a block cross
    * product: the shuffle is a hash partition on (token [, block]) keys,
    * bucket sizes are bound by token frequency, and the quadratic kernel
    * runs only on verified-candidate pairs. t' = t - 5e-7 keeps the
    * filter lossless w.r.t. the ROUNDED final `round(J,6) >= t`.
    *
    * `blockOn` (e.g. `source`) additionally restricts pairs to a block —
    * the "dedup within source" contract; the prefix join makes the
    * UNBLOCKED form scalable too (it was a full cross product before).
    * Returns (doc_a, doc_b, jaccard) with jaccard >= threshold. */
  def ngramJaccardPairs(
      docs: DataFrame, n: Int, threshold: Double,
      blockOn: Option[String] = None): DataFrame = {
    val tp = threshold - 5e-7
    // materialized once: `sh` feeds the prefix explode AND both verify
    // join-backs, and the shingle kernel is map-side (no exchange for
    // Spark to reuse) — without the barrier it would run 3× (same
    // reasoning as minHashLshPairs; simHashPairs is fine as-is because
    // its expensive stage is an aggregate whose exchange IS reused)
    val sh = docs
      .withColumn("sh", TextOps.shingleHashSet(TextOps.words(col("text")), n))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id") +: col("sh") +: blockOn.map(col).toSeq: _*)
      .localCheckpoint()
    // prefix length |S| - ceil(t'*|S|) + 1 (>= 1); tokens are pre-sorted
    val prefLen = (size(col("sh")) - ceil(size(col("sh")) * tp) + 1).cast("int")
    val pref = sh.select(
      col("doc_id") +: explode(slice(col("sh"), lit(1), prefLen)).as("tok")
        +: blockOn.map(col).toSeq: _*)
    val joinKeys = "tok" +: blockOn.toSeq
    val cands = pref.toDF("doc_a" +: "tok" +: blockOn.toSeq: _*)
      .join(pref.toDF("doc_b" +: "tok" +: blockOn.toSeq: _*), joinKeys)
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    // exact verification on the candidate pairs: size-ratio prune (J <=
    // min/max, relaxed by the rounding granularity) then the codegen
    // merge-walk intersection
    cands
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .filter(least(size(col("sh_a")), size(col("sh_b"))).cast("double") >=
        greatest(size(col("sh_a")), size(col("sh_b"))) * tp)
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
    * Physical shape: the signature is ONE map-side native pass per doc
    * (`MinHashSig`: all k permutation-mins in a register loop over the
    * shingle set — no explode, no shuffle; the earlier explode → 128 flat
    * `min()` aggregates formulation shuffled |docs|·|shingles| rows, and
    * nested HOF formulations re-evaluate the shingle pipeline per
    * permutation per band — a multiplicative interpreted-eval blowup).
    * Then one explode×bands + hash partition on band key; no quadratic
    * stage (bucket sizes bound by near-dup cluster size, not corpus size).
    */
  /** Shingle sets + banded MinHash signatures of one frame, both
    * materialized ONCE (localCheckpoint): each feeds at least two joins,
    * and without a barrier every consumer re-runs the
    * words→shingles→128-perm MinHash pipeline — the single most
    * expensive map stage. Real LSH deployments persist signatures for
    * the same reason; the banded stream is only (docs × bands) rows. */
  private def minHashSides(docs: DataFrame, n: Int, k: Int,
      bands: Int): (DataFrame, DataFrame) = {
    val rows = k / bands
    val p = TextOps.MinHashP
    // parallelism floor (OPTIMIZATION r17, guide §2): the 128-perm
    // MinHash register loop is the most expensive map kernel in the
    // dedup family; on a one-split input it serialized on one core
    // (measured 857 ms single task). Par.spread is an identity once the
    // scan has >= session-parallelism splits.
    val sh = Par.spread(docs)
      .withColumn("sh", TextOps.shingleHashSet(TextOps.words(col("text")), n))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"))
      .localCheckpoint()
    val sigs = sh.select(col("doc_id"),
      graft.plans.TextExpressions.minHashSig(col("sh"), k, p).as("sig"))
    val bandCols = (0 until bands).map { bIdx =>
      md5(concat_ws("_",
        (0 until rows).map(r => element_at(col("sig"), bIdx * rows + r + 1)): _*))
    }
    val banded = sigs.select(col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_key")))
      .localCheckpoint()
    (sh, banded)
  }

  /** Exact Jaccard verification of candidate (doc_a, doc_b) pairs against
    * per-side shingle sets, with the size-ratio prune (relaxed by the 6dp
    * rounding granularity): candidates whose set sizes preclude
    * round(J,6) >= threshold skip the merge-walk entirely. */
  private def verifyJaccard(cands: DataFrame, shA: DataFrame, shB: DataFrame,
      threshold: Double): DataFrame =
    cands
      .join(shA.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(shB.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .filter(least(size(col("sh_a")), size(col("sh_b"))).cast("double") >=
        greatest(size(col("sh_a")), size(col("sh_b"))) * (threshold - 5e-7))
      .withColumn("ic", VectorExpressions.sortedIntersectCount(col("sh_a"), col("sh_b")))
      .withColumn("jaccard", round(
        TextOps.jaccardFromCount(col("ic"), size(col("sh_a")), size(col("sh_b"))), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  def minHashLshPairs(
      docs: DataFrame,
      n: Int = 3,
      k: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.7): DataFrame = {
    val (sh, banded) = minHashSides(docs, n, k, bands)
    val cands = banded.select(col("doc_id").as("doc_a"), col("band_idx"), col("band_key"))
      .join(banded.select(col("doc_id").as("doc_b"), col("band_idx"), col("band_key")),
        Seq("band_idx", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    verifyJaccard(cands, sh, sh, threshold)
  }

  /** CROSS-corpus MinHash near-dup: pairs BETWEEN a new snapshot (left)
    * and history (right) at similarity level — the incremental peer of
    * [[bloomNovel]], which screens EXACT content keys only; this is the
    * "is the new crawl a near-rewrite of something we already have"
    * question. Candidates come from a banded left×right bucket join
    * (never left×left or right×right — the intra-snapshot pair volume,
    * usually the dominant term, is simply never generated), then the
    * standard exact-Jaccard verification. At 100 TB the history side's
    * banded signatures are a PERSISTED index (built once per snapshot,
    * the same lifecycle as the collection indexes); each new snapshot
    * streams its bands against them. */
  def minHashLshCrossPairs(
      left: DataFrame, right: DataFrame,
      n: Int = 3, k: Int = 128, bands: Int = 32,
      threshold: Double = 0.7): DataFrame = {
    val (shA, bandedA) = minHashSides(left, n, k, bands)
    val (shB, bandedB) = minHashSides(right, n, k, bands)
    val cands = bandedA
      .select(col("doc_id").as("doc_a"), col("band_idx"), col("band_key"))
      .join(bandedB.select(col("doc_id").as("doc_b"), col("band_idx"), col("band_key")),
        Seq("band_idx", "band_key"))
      .select("doc_a", "doc_b").distinct()
    verifyJaccard(cands, shA, shB, threshold)
  }

  /** SimHash near-dup pairs at Hamming radius <= `maxHamming` (<=3):
    * 60-bit simhash per doc, candidates via equality on any of the four
    * 15-bit chunks (pigeonhole ⇒ EXACT recall at radius 3), then exact
    * Hamming verification. Returns (doc_a, doc_b, hamming). */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "chunk banding guarantees recall only to radius 3")
    val h = simHashesSpread(docs)
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

  /** (doc_id, simhash) as a map-side projection — the one-pass
    * [[graft.plans.SimHash60]] kernel (OPTIMIZATION r17): the previous
    * explode → 60 flat bit-vote sums → pack formulation shuffled
    * |docs|·|words| rows into a 60-aggregate hash agg; the native pass
    * produces identical signatures with zero shuffles at any corpus
    * size (the [[graft.plans.MinHashSig]] shape migration). */
  private def simHashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.plans.TextExpressions.simHash60(
        TextOps.words(col("text"))).as("simhash"))

  /** [[simHashes]] with the scale-adaptive parallelism floor — for the
    * NON-checkpointed pairs path only (measured: spreading the
    * checkpointed [[simHashClusters]] signature frame regressed 1.4×,
    * the 32-partition checkpoint + exchange outweigh the kernel there,
    * while the pairs path wins 0.71-0.78×). */
  private def simHashesSpread(docs: DataFrame): DataFrame =
    simHashes(Par.spread(docs))

  /** Signature-dedup clustering — the duplicate-heavy-corpus form of
    * simhash dedup. [[simHashPairs]]' contract (EVERY pair at radius ≤
    * maxHamming) is inherently Ω(true pair count): a duplicate class of
    * m docs IS m(m−1)/2 output rows, quadratic no matter how good the
    * banding — the measured sf10 blowup in SCALING.md. Clustering does
    * not need the pair list. Dedup by DISTINCT signature first: one
    * representative (min doc_id) per simhash value, a STAR edge
    * rep←member inside each signature group (radius 0 — trivially a
    * valid pair), then chunk-banded candidate generation over the
    * DISTINCT signatures only, Hamming-verified, emitting rep–rep edges.
    * CC runs over stars ∪ rep-pairs.
    *
    * Components are PROVABLY identical to
    * `connectedComponents(simHashPairs(docs, maxHamming), …)`: every
    * added edge is a true radius-≤maxHamming pair, and every true pair
    * (a, b) is connected as a—rep(sig_a)—rep(sig_b)—b because distance
    * depends only on the signatures (DedupSpec asserts row equality).
    *
    * Scale: edge count = (n − |distinct sigs|) stars + verified pairs
    * among DISTINCT signatures — linear in n for duplicate-heavy
    * corpora where the pair list is quadratic; the signature-level join
    * keeps the same pigeonhole exactness (recall 1.0 at radius ≤ 3).
    * Returns (node, cluster_id) for every doc in a cluster of size ≥ 2,
    * the same surface as [[connectedComponents]]. */
  def simHashClusters(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "chunk banding guarantees recall only to radius 3")
    val h = simHashes(docs).localCheckpoint()
    val groups = h.groupBy("simhash").agg(min("doc_id").as("rep"))
    val stars = h.join(groups, Seq("simhash"))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"))
    val sigChunks = groups.select(col("rep"), col("simhash"),
      posexplode(array((0 until 4).map(i => TextOps.simChunk(col("simhash"), i)): _*))
        .as(Seq("chunk_idx", "chunk")))
    val l = sigChunks.select(col("rep").as("doc_a"), col("simhash").as("h_a"),
      col("chunk_idx"), col("chunk"))
    val r = sigChunks.select(col("rep").as("doc_b"), col("simhash").as("h_b"),
      col("chunk_idx"), col("chunk"))
    val repPairs = l.join(r, Seq("chunk_idx", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "h_a", "h_b").distinct()
      .filter(TextOps.hamming(col("h_a"), col("h_b")) <= maxHamming)
      .select(col("doc_a"), col("doc_b"))
    connectedComponents(stars.unionByName(repPairs), "doc_a", "doc_b")
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
      maxIter: Int = 30, smallGraphEdges: Long = 4000000L,
      starGraphEdges: Long = 64000000L): DataFrame = {
    // materialize the (possibly expensive) pair pipeline ONCE — the
    // bidirectional edge union would otherwise evaluate it twice
    val p = pairs.select(col(aCol).as("a"), col(bCol).as("b")).localCheckpoint()
    // Adaptive physical path (the same size-switch pattern as
    // Ann.adaptiveSearch and Spark's own broadcast threshold), THREE tiers:
    //  - driver union-find when the pair graph fits on the driver
    //    (~16 bytes/edge): exact, milliseconds, zero shuffles;
    //  - min-label + pointer-jumping (below) for the mid range: O(log
    //    diameter) rounds, each one join + one aggregate — near-dup
    //    clusters are dense and shallow, so this is a handful of rounds;
    //  - large-star/small-star contraction ([[starContraction]]) for
    //    genuinely huge graphs, whose worst case (deep, path-shaped
    //    components) the paper bounds in O(log² n) rounds INDEPENDENT of
    //    diameter, with per-round cost linear in the edge count.
    val edgeCount = p.count()
    if (edgeCount <= smallGraphEdges) return unionFindLocal(p)
    if (edgeCount > starGraphEdges) return starContraction(p, maxIter)._1
    minLabelPointerJump(p, maxIter)
  }

  /** Min-label propagation with pointer jumping over canonical pairs
    * `(a, b)` — the mid tier of [[connectedComponents]], and the finisher
    * [[starContraction]] falls back to if its round budget runs out. */
  private def minLabelPointerJump(p: DataFrame, maxIter: Int): DataFrame = {
    val edges = p.union(p.select(col("b"), col("a")))
      .toDF("src", "dst")
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lab", col("node"))
      .localCheckpoint()
    // labels only ever decrease, so Σlab is strictly decreasing until the
    // fixpoint: an O(1)-row aggregate is the convergence test (vs a
    // join+count of old-vs-new, which doubles the per-round work).
    // DECIMAL(38,0) keeps the sum exact at any node count (a wrapped
    // long sum could alias across rounds).
    def labSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("lab").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labSum(labels)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // (1) neighbor-min: lab ← min(lab, labs of neighbors)
      val neighborLabs = edges
        .join(labels, edges("src") === labels("node"))
        .select(col("dst").as("node"), col("lab"))
      val m = labels.select("node", "lab").union(neighborLabs)
        .groupBy("node").agg(min("lab").as("lab"))
      // (2) pointer jumping: lab ← lab(lab). Every label value is itself a
      // node (labels start as ids and only copy), and lab(x) <= x, so the
      // jump is monotone; combining it with neighbor-min turns O(diameter)
      // rounds into O(log diameter) — the difference between 12 shuffles
      // and 4 on a long path, at any scale.
      val jump = m.select(col("node").as("jn"), col("lab").as("jlab"))
      labels = m.join(jump, m("lab") === jump("jn"), "left")
        .select(m("node"),
          least(m("lab"), coalesce(col("jlab"), m("lab"))).as("lab"))
        .localCheckpoint()
      val s = labSum(labels)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      it += 1
    }
    labels.select(col("node"), col("lab").as("cluster_id"))
  }

  /** Large-star/small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14 — public literature):
    * the huge-graph tier of [[connectedComponents]].
    *
    * Each round is two edge rewrites, each one hash aggregate + one
    * equi-join on node id:
    *  - LARGE-STAR: per node u over its bidirectional neighborhood,
    *    m = min(Γ(u) ∪ {u}); every strictly-larger neighbor re-attaches
    *    to m: emit (v, m) for v ∈ Γ(u), v > u.
    *  - SMALL-STAR: edges oriented child→parent (u > v); per node u,
    *    m = min(N⁻(u) ∪ {u}) = min over its smaller neighbors; emit
    *    (v, m) for v ∈ N⁻(u), v ≠ m, plus (u, m).
    * The alternation converges to a forest of stars — every edge is
    * (node, component-min) — in O(log² n) rounds regardless of component
    * DIAMETER (the min-label loop's O(log diameter) is great for shallow
    * near-dup clusters but a path-shaped component makes diameter ≈ n).
    * Fixpoint test: the canonical oriented edge set stops changing
    * (count equality + one-sided except on deduplicated sets).
    *
    * Returns (labels, rounds) — rounds exposed for the log-bound property
    * spec. */
  private[graft] def starContraction(
      p: DataFrame, maxIter: Int = 30): (DataFrame, Int) = {
    // canonical orientation (child u > parent v), self-loops dropped
    var edges = p
      .select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var rounds = 0
    var converged = edges.isEmpty
    while (!converged && rounds < maxIter) {
      // LARGE-STAR over the bidirectional view
      val bidir = edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = bidir.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val large = bidir.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
      // SMALL-STAR over the canonical orientation
      val lo = large
        .select(greatest(col("a"), col("b")).as("u"),
          least(col("a"), col("b")).as("v"))
        .filter(col("u") =!= col("v"))
      val minsS = lo.groupBy("u").agg(min(col("v")).as("m"))
      val small = lo.join(minsS, Seq("u"))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u_"), col("m"))
        .union(minsS.select(col("u").as("u_"), col("m")))
      val next = small
        .select(greatest(col("u_"), col("m")).as("u"),
          least(col("u_"), col("m")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint()
      converged = next.count() == edges.count() &&
        next.except(edges).isEmpty
      edges = next
      rounds += 1
    }
    if (!converged) {
      // Round budget exhausted before the star-forest fixpoint: surviving
      // edges need not be (node, component-min), so reading them as labels
      // could mislabel nodes (ADVICE r7). Both rewrites PRESERVE which
      // nodes are mutually connected (the paper's correctness invariant),
      // so finish exactly on the contracted edge set — largely flattened
      // by the star rounds, so the min-label finisher converges fast.
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"starContraction hit maxIter=$maxIter before convergence; " +
          "finishing with min-label pointer jumping on the contracted edges")
      // a fresh budget: the exhausted star budget may be tiny, and the
      // finisher's O(log diameter) rounds are on a different clock
      return (minLabelPointerJump(edges.toDF("a", "b"), math.max(maxIter, 30)),
        rounds)
    }
    // fixpoint is a star forest: every surviving edge is (node, its
    // component min); the min itself labels itself
    val labels = edges.select(col("u").as("node"), col("v").as("cluster_id"))
      .union(edges.select(col("v").as("node"), col("v").as("cluster_id"))
        .distinct())
      .distinct()
    (labels, rounds)
  }

  /** Masks(b) = 1L << b for b in 0..31 — a literal lookup table because
    * `functions.shiftleft` only takes a literal shift amount. 32-bit
    * words (stored in BIGINT) keep every shift < 2^31, so the SQL oracle
    * needs no 1<<63 overflow special-casing. */
  private val BloomMasks: Seq[Long] = (0 until 32).map(1L << _)

  private def bloomMask(pos: Column): Column =
    element_at(typedlit(BloomMasks),
      pos.bitwiseAND(lit(31L)).cast("int") + 1)

  /** The k probe bit-positions of a document's exact-dedup content key
    * ([[graft.functions.TextOps.bagOfWordsKey]]) in an `mBits`-bit Bloom
    * filter. Kirsch–Mitzenmacher double hashing (one 60-bit base hash,
    * pos_i = (h mod m + i·(h>>30 | 1)) mod m) — pure integer arithmetic,
    * so the probe sequence replays exactly in the SQL oracle. */
  private def bloomProbes(mBits: Int, kProbes: Int): Column = {
    val h = TextOps.hash60(TextOps.bagOfWordsKey(TextOps.words(col("text"))))
    val h1 = pmod(h, lit(mBits.toLong))
    val h2 = shiftright(h, 30).bitwiseOR(lit(1L))
    array((0 until kProbes).map(i =>
      pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong))): _*)
  }

  /** Build the Bloom filter of a corpus's exact-dedup content keys as the
    * NONZERO 32-bit words of an `mBits`-bit array: rows (w, word). One
    * scan + one tiny aggregate (≤ mBits/32 rows) — the filter for 10B
    * docs at 1% FP is a few GB of (w, word) rows, a broadcastable frame,
    * never driver state. */
  def bloomBuild(docs: DataFrame, mBits: Int, kProbes: Int): DataFrame =
    docs.select(explode(bloomProbes(mBits, kProbes)).as("pos"))
      .select(shiftright(col("pos"), 5).cast("int").as("w"),
        bloomMask(col("pos")).as("m"))
      .groupBy("w").agg(expr("bit_or(m)").as("word"))

  /** Dedup against HISTORY without joining it: keep only docs whose
    * content key is definitely NOT in the `bloom` filter of a previously
    * seen corpus ([[bloomBuild]]) — the standard shape for incremental
    * corpus ingestion at 100 TB, where re-joining every prior snapshot
    * per increment is unpayable. Bloom membership has no false
    * negatives, so every previously-seen key is caught — every SURVIVOR
    * is genuinely novel; the price is false positives dropping
    * ~(1−e^{−kn/m})^k of the novel docs — the classic Bloom trade,
    * deterministic here so the oracle replays it bit-for-bit.
    *
    * Plan shape: `kProbes` successive LEFT broadcast-hash joins on the
    * word index (no explode, no shuffle, no aggregation — a map-only
    * pass over the incoming corpus), then one filter on the conjunction
    * of per-probe bit tests. */
  def bloomNovel(
      docs: DataFrame, bloom: DataFrame, mBits: Int, kProbes: Int): DataFrame = {
    val withProbes = docs.withColumn("_probes", bloomProbes(mBits, kProbes))
    val joined = (0 until kProbes).foldLeft(withProbes) { (df, i) =>
      val pos = element_at(col("_probes"), i + 1)
      df.join(
          broadcast(bloom.select(col("w").as(s"_w$i"), col("word").as(s"_word$i"))),
          shiftright(pos, 5).cast("int") === col(s"_w$i"), "left")
        .withColumn(s"_hit$i",
          coalesce(col(s"_word$i").bitwiseAND(bloomMask(pos)) =!= 0L, lit(false)))
    }
    val allHit = (0 until kProbes).map(i => col(s"_hit$i")).reduce(_ && _)
    joined.filter(!allHit)
      .select(docs.columns.map(col).toSeq: _*)
  }

  /** Apply dedup decisions: keep exactly one document per near-dup cluster
    * (the minimum id — the cluster label) and every unclustered document.
    * `labels` is [[connectedComponents]] output (node, cluster_id); the
    * drop list is the clustered non-representatives, Σ(cluster−1) rows —
    * tiny relative to the corpus, so at scale this is a broadcast
    * anti-join: a map-only filter pass over the corpus. */
  def applyDedup(
      docs: DataFrame, labels: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val drops = labels.filter(col("node") =!= col("cluster_id")).select("node")
    docs.join(broadcast(drops), docs(idCol) === drops("node"), "left_anti")
  }

  /** Quality-aware dedup apply: keep the BEST-scoring document per
    * near-dup cluster instead of the arbitrary min-id representative —
    * what production pipelines actually do (when near-dups differ in
    * quality, dropping the cleaner copy wastes signal). `scores` carries
    * (idCol, scoreCol); the winner per cluster is argmax(score) with id
    * tiebreak. Same broadcast-anti-join scale shape as [[applyDedup]]:
    * the per-cluster argmax runs over the LABELS frame (Σ cluster sizes —
    * tiny relative to the corpus), never the corpus itself. */
  def applyDedupByQuality(
      docs: DataFrame, labels: DataFrame, scores: DataFrame,
      idCol: String = "doc_id", scoreCol: String = "quality_score"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(desc(scoreCol), asc("node"))
    val drops = labels
      .join(scores.select(col(idCol).as("node"), col(scoreCol)), Seq("node"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") =!= 1)
      .select("node")
    docs.join(broadcast(drops), docs(idCol) === drops("node"), "left_anti")
  }

  /** Driver-side union-find for pair graphs below the adaptive threshold:
    * min-id-rooted (the smaller root becomes the parent, so find() lands on
    * the component's minimum id — identical labels to the distributed
    * propagation) with full path compression. */
  private def unionFindLocal(p: DataFrame): DataFrame = {
    val spark = p.sparkSession
    import spark.implicits._
    val edges = p.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.toSeq.sorted
      .map(n => (n, find(n)))
      .toDF("node", "cluster_id")
  }

  /** Embedding-cosine near-dup pairs over a normalized-embedding collection:
    * (id_a, id_b, cos) with cos >= threshold.
    *
    * ADAPTIVE candidate generation — the threshold decides which physical
    * strategy is even capable of pruning:
    *
    * 1. Near-dup regime (high threshold, multiprobe radius <= 1 — t >=
    *    ~0.89 on 64-d): banded sign-LSH equi-join. Each point's 64-bit
    *    sign signature (`SignPack64`) splits into 8 chunks of 8 bits; side
    *    A emits its 8 (band, chunk) keys, side B multiprobes each key
    *    within Hamming radius `r`. Pigeonhole: a pair differing in at most
    *    8(r+1)-1 sign bits matches on some band, so recall is EXACT up to
    *    that bound; `r` derives from the threshold as cover = E[hamming at
    *    cos=t] + 3σ (binomial, p = arccos(t)/π). A pair survives only at
    *    its FIRST matching band, so each candidate is verified exactly
    *    once. Subquadratic: bucket sizes are bound by near-dup cluster
    *    size, not corpus size.
    *
    * 2. Exact regime (low threshold): at thresholds inside the
    *    random-cosine tail, sign bits carry no signal — measured on the
    *    fixture, qualifying pairs at t=0.45 have sign-Hamming up to 31/64
    *    vs 32 expected for random pairs — so ANY exact method examines
    *    Θ(n²) dot products, and LSH plumbing only adds overhead (radius-4
    *    multiprobe is a 163× row inflation on 8-bit buckets that still
    *    degenerates to all-pairs). The honest physical plan for forced
    *    all-pairs is a BLOCK-SHARDED product: assign each point a block in
    *    [0, B); the left side replicates each point to block-pair keys
    *    (blk, j) for j >= blk, the right side to (i, blk) for i <= blk;
    *    an equi-join on the B(B+1)/2 composite keys then yields every
    *    unordered pair exactly once (diagonal blocks deduped by id order).
    *    No broadcast, no cartesian/nested-loop: every key holds exactly
    *    |block_i| x |block_j| ≈ (N/B)² work and 2N/B rows of state, keys
    *    are hash-uniform (no skew), and replication is (B+1) copies per
    *    point — the communication lower bound shape for exact all-pairs
    *    (Afrati/Ullman "anchor points" / 1-bucket-theorem layout). Size B
    *    so a task's 2N/B rows fit in executor memory; compute per task is
    *    (N/B)² codegen'd dots inside whole-stage codegen. */
  def embeddingCosinePairs(
      points: DataFrame, threshold: Double, blocks: Int = 32): DataFrame = {
    val t = math.max(-1.0, math.min(1.0, threshold))
    val pBit = math.acos(t) / math.Pi // disagreeing-bit rate at cos = t
    val hCover = math.ceil(
      64.0 * pBit + 3.0 * math.sqrt(64.0 * pBit * (1.0 - pBit))).toInt
    // smallest r with 8(r+1)-1 >= hCover (exact recall to hCover sign bits)
    val radius = math.min(8, math.max(0, math.ceil((hCover - 7) / 8.0).toInt))
    val cands =
      if (radius <= 1) lshBandCandidates(points, radius)
      else exactBlockCandidates(points, blocks)
    cands
      .withColumn("cos", round(VectorOps.dot(col("e_a"), col("e_b")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Banded sign-LSH candidate pairs (see embeddingCosinePairs §1): emits
    * (id_a, id_b, e_a, e_b) with id_a < id_b, each candidate exactly once. */
  private def lshBandCandidates(points: DataFrame, radius: Int): DataFrame = {
    val masks = (0 until 256).filter(Integer.bitCount(_) <= radius).map(_.toLong)
    def chunkAt(sig: Column, j: Int): Column =
      shiftrightunsigned(sig, 8 * j).bitwiseAND(lit(255L))
    val sigd = points.select(col("id"),
      graft.plans.VectorExpressions.signPack64(col("embedding")).as("sig"))
    val bandArr = array((0 until 8).map(i => chunkAt(col("sig"), i)): _*)
    val banded = sigd.select(col("id"), col("sig"),
      posexplode(bandArr).as(Seq("band_idx", "bkey")))
    val a = banded.select(col("id").as("id_a"), col("sig").as("sig_a"),
      col("band_idx"), col("bkey"))
    val probes = banded
      .select(col("id").as("id_b"), col("sig").as("sig_b"), col("band_idx"),
        col("bkey"), explode(typedlit(masks)).as("m"))
      .select(col("id_b"), col("sig_b"), col("band_idx"),
        col("bkey").bitwiseXOR(col("m")).as("bkey"))
    val firstBandOnly = (0 until 8).map { j =>
      col("band_idx") <= lit(j) ||
        bit_count(chunkAt(col("sig_a"), j).bitwiseXOR(chunkAt(col("sig_b"), j))) > lit(radius)
    }.reduce(_ && _)
    val cands = a.join(probes, Seq("band_idx", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .filter(firstBandOnly)
      .select("id_a", "id_b")
    val e = points.select(col("id"), col("embedding"))
    cands
      .join(e.select(col("id").as("id_a"), col("embedding").as("e_a")), Seq("id_a"))
      .join(e.select(col("id").as("id_b"), col("embedding").as("e_b")), Seq("id_b"))
  }

  /** Semantic near-dup clusters over embeddings, SemDeDup-style (Abbas et
    * al. 2023, "SemDeDup: Data-efficient learning at web-scale through
    * semantic deduplication" — cluster the corpus with k-means, then dedup
    * WITHIN cells): candidate pairs are generated per IVF cell — the data
    * side sits in its top-1 cell, the query side probes its `nprobe`
    * nearest cells (both map-side, [[graft.plans.TopCentroids]]) — then
    * pairs at rounded cosine >= threshold feed [[connectedComponents]];
    * each cluster keeps its minimum id. The returned frame is one row per
    * multi-document cluster: (cluster_id, n_points, min_id, max_id).
    *
    * Scale: candidate volume is nprobe·N²/C with C sized to bound cells —
    * the subquadratic regime [[embeddingCosinePairs]]'s exact path can't
    * reach; recall is the IVF probe bound (a cross-cell pair is found when
    * either endpoint probes the other's home cell). */
  def semanticClusters(
      points: DataFrame, centroids: DataFrame,
      threshold: Double, nprobe: Int = 2): DataFrame = {
    val rows = centroids.select(col("cid"), col("ce")).orderBy("cid").collect()
    val cids = rows.map(_.getLong(0)).toSeq
    val cents = rows.map(_.getSeq[Double](1)).toSeq
    val data = graft.operators.Ann.ivfAssign(points, centroids)
      .select(col("cid"), col("id"), col("embedding"))
      .repartition(cids.length, col("cid"))
    val queries = points.select(col("id").as("qid"), col("embedding").as("qemb"))
      .withColumn("cid", explode(
        graft.plans.VectorExpressions.topCentroids(col("qemb"), cids, cents, nprobe)))
      .repartition(cids.length, col("cid"))
    val pairs = queries.join(data, Seq("cid"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"),
        round(VectorOps.dot(col("embedding"), col("qemb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
      // a pair can arrive in both orientations (each endpoint probing the
      // other's cell) — normalize and dedupe before clustering
      .select(least(col("qid"), col("id")).as("id_a"),
        greatest(col("qid"), col("id")).as("id_b"))
      .distinct()
    connectedComponents(pairs, "id_a", "id_b")
      .groupBy("cluster_id")
      .agg(count("*").cast("long").as("n_points"),
        min("node").as("min_id"), max("node").as("max_id"))
      .filter(col("n_points") > 1)
      .orderBy("cluster_id")
  }

  /** Block-sharded exact all-pairs (see embeddingCosinePairs §2): emits
    * every unordered pair exactly once as (id_a, id_b, e_a, e_b); ids are
    * normalized so id_a < id_b. The join is a plain equi-join on the
    * (block_i, block_j) composite key — never a cartesian or broadcast
    * nested loop. */
  private def exactBlockCandidates(points: DataFrame, blocks: Int): DataFrame = {
    val pts = points.select(col("id"), col("embedding"))
      .withColumn("blk", pmod(hash(col("id")), lit(blocks)))
    val left = pts.select(col("id").as("id_a"), col("embedding").as("e_a"),
      col("blk").as("bi"), explode(sequence(col("blk"), lit(blocks - 1))).as("bj"))
      // spread the B(B+1)/2 block-pair keys across the cluster: without
      // this, a broadcast-side join keeps the whole quadratic product in
      // the (few) scan partitions; with it, each task gets ~equal key
      // ranges. At scale this IS the exchange a shuffle join needs anyway
      // (ENSURE_REQUIREMENTS reuses it).
      .repartition(col("bi"), col("bj"))
    val right = pts.select(col("id").as("id_b"), col("embedding").as("e_b"),
      explode(sequence(lit(0), col("blk"))).as("bi"), col("blk").as("bj"))
    left.join(right, Seq("bi", "bj"))
      // off-diagonal block pairs carry each unordered pair once (in
      // whichever id order the blocks dictate); diagonal blocks carry both
      // orders plus self-pairs — keep the ascending one only.
      .filter(col("bi") =!= col("bj") || col("id_a") < col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        col("e_a"), col("e_b"))
  }
}
