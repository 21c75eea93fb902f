package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Byte-pair-encoding tokenizer TRAINING and application — the "train
  * the tokenizer on the corpus" step of an LLM data pipeline (Sennrich
  * et al. '16, "Neural Machine Translation of Rare Words with Subword
  * Units": greedily merge the most frequent adjacent symbol pair,
  * weighted by word frequency, starting from characters).
  *
  * Spark shape: BPE training runs on the WORD-FREQUENCY table, not the
  * corpus — the classic trick that makes tokenizer training cheap. One
  * corpus scan builds `vocab(word, n, sym)` (distinct words with counts
  * and character-symbol arrays); each merge round is then
  *   (1) one hash aggregate over adjacent symbol pairs of the vocab
  *       table, weighted by `n` (map-side partial combine, pair-key
  *       shuffle bounded by the SYMBOL-pair vocabulary, not the corpus),
  *   (2) a driver `collect()` of exactly ONE row (the argmax pair —
  *       index metadata, same as the kmeans centroid pulls), and
  *   (3) a map-side array rewrite of the vocab table (localCheckpointed
  *       so the per-round lineage stays flat).
  * At 100 TB the vocab table is the corpus' distinct-word table (~10⁸
  * rows for web text — a small fraction of corpus size), so k merges
  * cost k bounded aggregates over it; the corpus itself is scanned once.
  *
  * Determinism contract: pair counts are exact integer sums; the argmax
  * tie-breaks (count DESC, lhs ASC, rhs ASC). SELF-PAIRS ARE EXCLUDED
  * (lhs != rhs): merging a pair that overlaps itself ("aa" in "aaa")
  * makes the left-to-right rewrite order-sensitive in a way no
  * declarative engine reproduces portably, and a self-merge is a
  * repetition artifact rather than a subword — excluding it keeps the
  * position-based rewrite below exactly reproducible in any engine
  * (documented deviation from the reference algorithm).
  *
  * Rewrite semantics (overlap-free because lhs != rhs): position i of a
  * symbol array matches iff sym[i]=lhs and sym[i+1]=rhs; every matched
  * pair merges simultaneously; a position is dropped iff its predecessor
  * matched. Adjacent matches cannot overlap — (i, i+1) and (i+1, i+2)
  * both matching would force lhs = rhs.
  */
object Bpe {

  final case class Merge(rank: Long, lhs: String, rhs: String, pair_count: Long)

  /** Distinct-word frequency table with character-symbol arrays:
    * (word, n, sym). One scan + one hash aggregate. */
  def vocab(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.words(col("text"))).as("word"))
      // empty tokens (doubled separators) would hit the descending
      // sequence(0,-1) trap below — drop them in BOTH engines
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("sym",
        expr("transform(sequence(0, length(word)-1), i -> substring(word, i+1, 1))"))

  /** Adjacent-pair frequency aggregate over a vocab frame (self-pairs
    * excluded; count weighted by word frequency). */
  private def pairCounts(v: DataFrame): DataFrame =
    v.select(col("n"),
        explode(expr("CASE WHEN size(sym) >= 2 THEN " +
          "transform(sequence(0, size(sym)-2), i -> struct(sym[i] AS lhs, sym[i+1] AS rhs)) " +
          "ELSE CAST(array() AS array<struct<lhs:string,rhs:string>>) END")).as("p"))
      .select(col("p.lhs"), col("p.rhs"), col("n"))
      .filter(col("lhs") =!= col("rhs"))
      .groupBy("lhs", "rhs").agg(sum("n").as("c"))

  /** One merge-rewrite of the symbol arrays: merge every (lhs, rhs)
    * occurrence. Bounds-checked gates precede every element access
    * (ANSI mode throws on out-of-range element_at; `&&` short-circuits). */
  private[graft] def rewrite(sym: Column, lhs: String, rhs: String): Column = {
    val a = lit(lhs); val b = lit(rhs)
    def at(i: Column): Column = element_at(sym, i)
    transform(
      filter(sequence(lit(0), size(sym) - 1),
        i => !(i >= 1 && at(i) === a && at(i + 1) === b)),
      i => when(at(i + 1) === a && i + 1 < size(sym) && at(i + 2) === b,
          concat(at(i + 1), at(i + 2)))
        .otherwise(at(i + 1)))
  }

  /** Learn `nMerges` BPE merges. Returns the merge table (rank order)
    * and the final vocab frame (word, n, sym) for [[tokenize]]. Stops
    * early if no mergeable pair remains. */
  def learn(docs: DataFrame, nMerges: Int): (Seq[Merge], DataFrame) = {
    var v = vocab(docs).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var r = 1L
    var done = false
    while (r <= nMerges && !done) {
      val top = pairCounts(v)
        .orderBy(col("c").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (lhs, rhs, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(r, lhs, rhs, c)
        v = v.withColumn("sym", rewrite(col("sym"), lhs, rhs)).localCheckpoint()
        r += 1
      }
    }
    (merges.result(), v)
  }

  final case class BatchedMerge(
      round: Long, rank: Long, lhs: String, rhs: String, pair_count: Long)

  /** How many ranked pair candidates a batched round scans for disjoint
    * merges: 8× the batch width, a deterministic cap mirrored by the
    * oracle. Candidates skipped for conflicting stay available to later
    * rounds at their recounted frequency. */
  def batchedCandCap(batch: Int): Int = 8 * batch

  /** BATCHED BPE training (VERDICT r9 #3): per round, accept up to
    * `batch` mutually COMMUTING merges from the ranked pair-count table
    * instead of one — the standard scalable-BPE batching. Greedy scan in
    * (count DESC, lhs ASC, rhs ASC) order over the top
    * [[batchedCandCap]] candidates; a candidate conflicts with an
    * already-accepted rule iff they can CHAIN at adjacent positions
    * (one's rhs = the other's lhs — "aba"-style order sensitivity) or a
    * merged product feeds or names the other rule. This is the EXACT
    * order-independence condition: rules merely sharing a same-side
    * symbol — (t,h) and (t,o), or (a,c) and (b,c) — can never compete
    * for an occurrence (one position would need two symbols at once),
    * so the one-pass simultaneous rewrite applies an accepted batch
    * exactly as sequential application in any order would
    * (property-tested in BpeSpec against both orders). The r10 rule
    * (blanket symbol disjointness) was sound but accepted only ~3
    * merges/round on real text — every top pair shares a vowel; the
    * exact condition accepts ~batch, so a vocab of ~1k merges needs
    * ~1000/batch driver rounds (each one bounded pair aggregate + one
    * ≤8·batch-row collect + one rewrite pass), measured in SCALING.md.
    * With `batch = 1` every round is exactly the argmax, so batched
    * training DEGENERATES to [[learn]] — spec-asserted.
    *
    * Runs exactly `nRounds` rounds (stopping early only when no
    * mergeable pair remains); rounds may accept fewer than `batch` when
    * top candidates chain (e.g. (t,h) then (h,e)). The oracle replays
    * every round's greedy selection in SQL — both engines must accept
    * identical merge batches. */
  def learnBatched(docs: DataFrame, nRounds: Int, batch: Int,
      maxMerges: Int = Int.MaxValue)
      : (Seq[BatchedMerge], DataFrame) = {
    require(nRounds >= 1, s"nRounds must be >= 1, got $nRounds")
    require(batch >= 1, s"batch must be >= 1, got $batch")
    require(maxMerges >= 1, s"maxMerges must be >= 1, got $maxMerges")
    val candCap = batchedCandCap(batch)
    var v = vocab(docs).localCheckpoint()
    val out = Seq.newBuilder[BatchedMerge]
    var rank = 0L
    var round = 1
    var done = false
    // vocab-size early stop: whole rounds only (batch semantics — the
    // oracle replays complete rounds), so the result may overshoot
    // `maxMerges` by at most batch−1 merges
    while (round <= nRounds && !done && rank < maxMerges) {
      val cands = pairCounts(v)
        .orderBy(col("c").desc, col("lhs").asc, col("rhs").asc)
        .limit(candCap).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (cands.isEmpty) done = true
      else {
        // EXACT order-independence condition, not blanket symbol
        // disjointness (which accepted only ~3 merges/round on real text
        // — every top pair shares a vowel): two rules commute unless
        // they can CHAIN at adjacent positions (one's rhs is the other's
        // lhs) or one's merged product feeds or names the other. Rules
        // merely sharing a same-side symbol — (t,h) and (t,o), or (a,c)
        // and (b,c) — can never compete for the same occurrence (the
        // shared position would need two different symbols at once), so
        // the simultaneous rewrite still equals sequential application
        // in any order.
        val accL = scala.collection.mutable.Set.empty[String]
        val accR = scala.collection.mutable.Set.empty[String]
        val accP = scala.collection.mutable.Set.empty[String]
        val acc = Seq.newBuilder[(String, String, Long)]
        var taken = 0
        for ((l, rr, c) <- cands if taken < batch) {
          val p = l + rr
          val conflict =
            accR.contains(l) ||     // (x,l) then (l,rr): chains
            accL.contains(rr) ||    // (l,rr) then (rr,y): chains
            accP.contains(l) || accP.contains(rr) || // consumes a product
            accL.contains(p) || accR.contains(p) ||  // product feeds a rule
            accP.contains(p)        // ambiguous product
          if (!conflict) {
            acc += ((l, rr, c))
            accL += l; accR += rr; accP += p; taken += 1
          }
        }
        val accepted = acc.result()
        v = v.withColumn("sym",
          rewriteMulti(col("sym"), accepted.map(t => (t._1, t._2))))
          .localCheckpoint()
        accepted.foreach { case (l, rr, c) =>
          rank += 1
          out += BatchedMerge(round.toLong, rank, l, rr, c)
        }
        round += 1
      }
    }
    (out.result(), v)
  }

  /** One-pass SIMULTANEOUS rewrite of several disjoint merges — the
    * multi-pair generalization of [[rewrite]] (identical gates; the
    * pairs' symbol-disjointness makes the WHEN order irrelevant: no
    * position can match two pairs). */
  private def rewriteMulti(sym: Column, pairs: Seq[(String, String)]): Column = {
    def at(i: Column): Column = element_at(sym, i)
    transform(
      filter(sequence(lit(0), size(sym) - 1),
        i => !(i >= 1 && pairs.map { case (l, r) =>
          at(i) === lit(l) && at(i + 1) === lit(r) }.reduce(_ || _))),
      i => pairs.foldRight(at(i + 1)) { case ((l, r), acc) =>
        when(at(i + 1) === lit(l) && i + 1 < size(sym) && at(i + 2) === lit(r),
          concat(at(i + 1), at(i + 2))).otherwise(acc) })
  }

  /** The learned merge table as a DataFrame (rank, lhs, rhs, pair_count). */
  def mergeTable(docs: DataFrame, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learn(docs, nMerges)._1.toDF().orderBy("rank")
  }

  /** Apply a trained vocabulary to a corpus: per-doc BPE token count and
    * compression stats. The vocab join is a bounded-key equi-join
    * (broadcast when small — AQE's call); everything else fuses into the
    * scan. `chars_per_token` is the tokenizer-fertility signal data
    * pipelines track per language/source. */
  def tokenize(docs: DataFrame, vocabFinal: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("word"))
      .filter(length(col("word")) >= 1)
      .join(vocabFinal.select(col("word"), size(col("sym")).cast("long").as("n_sym")),
        Seq("word"), "left")
      // OOV fallback: character tokens (cannot trigger when the vocab was
      // trained on the same corpus; kept for cross-corpus application)
      .withColumn("n_sym", coalesce(col("n_sym"), length(col("word")).cast("long")))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(col("n_sym")).cast("long").as("n_bpe_tokens"),
        sum(length(col("word")).cast("long")).as("n_word_chars"))
      .withColumn("chars_per_token",
        round(col("n_word_chars").cast("double") / col("n_bpe_tokens"), 6))
      .orderBy("doc_id")
}
