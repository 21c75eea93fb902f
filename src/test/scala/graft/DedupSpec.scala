package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dedup semantics on handcrafted fixtures + cross-variant consistency on
  * the real documents table. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(s"$sf001/documents.parquet").cache()

  private lazy val tiny = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "s1"),
    (2L, "the quick brown fox jumps over the lazy dog", "s1"), // exact dup
    (3L, "the quick brown fox jumps over the lazy cat", "s1"), // near dup
    (4L, "completely different words entirely here now", "s1")
  ).toDF("doc_id", "text", "source")

  test("exact dedup groups identical texts") {
    val g = Dedup.exactGroups(tiny).select("n_docs", "keep_doc_id")
      .as[(Long, Long)].collect()
    assert(g.toSeq == Seq((2L, 1L)))
  }

  test("bloom novel: every seen key caught, survivors are genuinely novel") {
    // seen corpus = 40 real docs; incoming = 30 copies of seen texts
    // (fresh ids) + 40 unseen docs
    val seen = docs.filter($"doc_id" < 40)
    val copies = seen.filter($"doc_id" < 30)
      .withColumn("doc_id", $"doc_id" + 10000)
    val unseen = docs.filter($"doc_id" >= 40 && $"doc_id" < 80)
    val incoming = copies.unionByName(unseen)
    val bloom = Dedup.bloomBuild(seen, mBits = 65536, kProbes = 3)
    val novel = Dedup.bloomNovel(incoming, bloom, mBits = 65536, kProbes = 3)
      .select("doc_id").as[Long].collect().toSet
    // no false negatives: every copy of a seen content key is dropped
    assert(novel.forall(_ < 10000), s"seen copies survived: ${novel.filter(_ >= 10000)}")
    // ground truth by direct key comparison: an unseen doc is truly
    // novel iff its bow key does not occur in the seen corpus. At 65536
    // bits / ~120 set bits the FP probability is ~1e-7 and the bloom is
    // deterministic — so the survivor set must EQUAL the true-novel set
    import graft.functions.TextOps
    def keys(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      TextOps.bagOfWordsKey(TextOps.words(col("text"))).as("bk"))
    val seenKeys = keys(seen).select("bk").as[String].collect().toSet
    val trueNovel = keys(unseen).as[(Long, String)].collect()
      .filterNot { case (_, bk) => seenKeys.contains(bk) }.map(_._1).toSet
    assert(novel == trueNovel,
      s"extra=${novel -- trueNovel} dropped=${trueNovel -- novel}")
    // schema passthrough: output columns = input columns
    assert(Dedup.bloomNovel(incoming, bloom, 65536, 3).columns.toSeq
      == incoming.columns.toSeq)
  }

  test("ngram jaccard: identical docs =1, near dups high, disjoint absent") {
    val pairs = Dedup.ngramJaccardPairs(tiny, n = 3, threshold = 0.1)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 3L)) > 0.5 && pairs((1L, 3L)) < 1.0)
    assert(!pairs.contains((1L, 4L)))
  }

  test("prefix-filtered jaccard equals block-quadratic brute force") {
    import graft.functions.TextOps
    import graft.plans.VectorExpressions
    val t = 0.5
    val sh = docs
      .withColumn("sh", TextOps.shingleHashSet(TextOps.words(col("text")), 3))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"), col("source"))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("source"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("source"))
    val brute = a.join(b, Seq("source")).filter(col("doc_a") < col("doc_b"))
      .withColumn("ic", VectorExpressions.sortedIntersectCount(col("sh_a"), col("sh_b")))
      .withColumn("j", round(
        TextOps.jaccardFromCount(col("ic"), size(col("sh_a")), size(col("sh_b"))), 6))
      .filter(col("j") >= t)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val pref = Dedup.ngramJaccardPairs(docs, n = 3, threshold = t,
      blockOn = Some("source"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pref == brute, s"missing=${brute -- pref} spurious=${pref -- brute}")
  }

  test("minhash LSH finds the same pairs as exact jaccard at threshold 0.7") {
    val lsh = Dedup.minHashLshPairs(docs, n = 3, k = 128, bands = 32, threshold = 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh == exact, s"missing=${exact -- lsh} spurious=${lsh -- exact}")
  }

  test("simhash pairs at radius 3: identical docs have distance 0") {
    val p = Dedup.simHashPairs(tiny, maxHamming = 3)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(p((1L, 2L)) == 0)
  }

  test("simHashClusters ≡ CC over simHashPairs, row for row") {
    // fixture docs (organic near-dups) plus planted exact duplicates —
    // the duplicate-class case whose pair list is quadratic is exactly
    // where the signature-dedup form must still produce identical
    // components
    val planted = spark.range(5)
      .selectExpr("9000 + id AS doc_id", "'copy me twin text' AS text")
    val corpus = docs.select("doc_id", "text").unionByName(planted)
    val viaPairs = Dedup.connectedComponents(
        Dedup.simHashPairs(corpus, maxHamming = 3), "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    val viaSigs = Dedup.simHashClusters(corpus, maxHamming = 3)
      .as[(Long, Long)].collect().toMap
    assert(viaSigs == viaPairs,
      s"missing=${viaPairs.toSet -- viaSigs.toSet} spurious=${viaSigs.toSet -- viaPairs.toSet}")
    // the planted duplicate class collapsed to one cluster
    assert((9000L to 9004L).map(viaSigs).toSet.size == 1)
  }

  test("connected components: chain, separate pair, and isolated node") {
    // chain 1-2-3-4 (transitive cluster), pair 10-11, node 20 not in pairs
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connected components converge on a long path (diameter > 2)") {
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect()
    assert(cc.length == 13 && cc.forall(_._2 == 0L))
  }

  test("distributed CC path agrees with driver union-find") {
    // smallGraphEdges = 0 forces the iterative label-propagation path
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (20L, 21L)).toDF("doc_a", "doc_b")
    val dist = Dedup.connectedComponents(pairs, "doc_a", "doc_b",
      smallGraphEdges = 0L).as[(Long, Long)].collect().toMap
    val local = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(dist == local)
    assert(local == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("star contraction: 1000-node chain converges in log-bounded rounds, labels unchanged") {
    // the adversarial case for label propagation: one component whose
    // DIAMETER is the node count — a path graph
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Dedup.starContraction(chain)
    val got = labels.as[(Long, Long)].collect()
    assert(got.length == 1000, s"every chain node labeled: ${got.length}")
    assert(got.forall(_._2 == 0L), "one component, min label 0")
    assert(got.map(_._1).toSet == (0L until 1000L).toSet)
    // Kiveris et al. bound O(log^2 n); a path collapses much faster —
    // pin a 2*log2(n) working bound so a regression to linear rounds fails
    assert(rounds <= 20, s"rounds $rounds exceeds the log bound for n=1000")
    // and the labels equal the exact union-find path's labels
    val exact = Dedup.connectedComponents(chain, "a", "b")
      .as[(Long, Long)].collect().toSet
    assert(got.toSet == exact)
  }

  test("star contraction with an exhausted round budget still labels correctly (fallback)") {
    // maxIter=1 cannot reach the star-forest fixpoint on a 64-node chain;
    // the partial edge set must NOT be read as labels — the pointer-jump
    // finisher on the contracted edges must produce the exact labels
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, _) = Dedup.starContraction(chain, maxIter = 1)
    val got = labels.as[(Long, Long)].collect()
    assert(got.length == 64, s"every node labeled once: ${got.length}")
    assert(got.forall(_._2 == 0L), "one component, min label 0")
  }

  test("star contraction agrees with union-find on a mixed multi-component graph") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (20L, 21L), (21L, 22L), (22L, 20L)).toDF("a", "b") // chain+chain+cycle
    val stars = Dedup.starContraction(pairs.toDF("a", "b"))._1
      .as[(Long, Long)].collect().toMap
    val local = Dedup.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(stars == local)
  }

  test("applyDedupByQuality keeps the best-scoring doc per cluster, not min id") {
    val docsIds = Seq(1L, 2L, 3L, 10L, 11L, 20L)
      .map(i => (i, s"text $i")).toDF("doc_id", "text")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("node", "cluster_id")
    // cluster {1,2,3}: doc 3 scores highest; cluster {10,11}: tie -> id 10
    val scores = Seq((1L, 0.2), (2L, 0.5), (3L, 0.9), (10L, 0.4), (11L, 0.4),
      (20L, 0.1)).toDF("doc_id", "quality_score")
    val kept = Dedup.applyDedupByQuality(docsIds, labels, scores)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 10L, 20L),
      s"argmax-quality winner per cluster + unclustered survivors: $kept")
  }

  test("applyDedup keeps one doc per cluster plus all unclustered docs") {
    val docsIds = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L)
      .map(i => (i, s"text $i")).toDF("doc_id", "text")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("node", "cluster_id")
    val kept = Dedup.applyDedup(docsIds, labels)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 10L, 20L))
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val pts = graft.operators.Collection.load(spark, sf001)
    val pairs = Dedup.embeddingCosinePairs(pts, 0.45)
      .as[(Long, Long, Double)].collect()
    assert(pairs.forall(t => t._1 < t._2 && t._3 >= 0.45))
  }

  test("high-threshold LSH path matches brute force on planted near-dups") {
    // s=0.97 perturbation puts planted pairs at cos ≈ 0.97; t=0.94 derives
    // multiprobe radius 1, so this exercises the banded sign-LSH path.
    val base = graft.functions.Generators.normalizedEmbeddings(spark, 150, 64)
    val dups = graft.functions.Generators.similarEmbeddings(base, 0.97)
      .select((col("id") + 10000L).as("id"), col("embedding"))
    val pts = base.unionByName(dups)
    val lsh = Dedup.embeddingCosinePairs(pts, 0.94)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val a = pts.select(col("id").as("id_a"), col("embedding").as("e_a"))
    val b = pts.select(col("id").as("id_b"), col("embedding").as("e_b"))
    val brute = a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cos", round(graft.functions.VectorOps.dot(col("e_a"), col("e_b")), 6))
      .filter(col("cos") >= 0.94)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "no planted pairs above threshold — bad fixture")
    assert(lsh == brute, s"missing=${brute -- lsh} spurious=${lsh -- brute}")
  }

  test("embedding near-dup block-exact candidates match brute-force exactly") {
    val pts = graft.operators.Collection.load(spark, sf001)
    val banded = Dedup.embeddingCosinePairs(pts, 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val a = pts.select(col("id").as("id_a"), col("embedding").as("e_a"))
    val b = pts.select(col("id").as("id_b"), col("embedding").as("e_b"))
    val brute = a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cos", round(graft.functions.VectorOps.dot(col("e_a"), col("e_b")), 6))
      .filter(col("cos") >= 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded == brute, s"missing=${brute -- banded} spurious=${banded -- brute}")
  }

  test("semantic clusters: min id labels, multi-point only, subset of exact pairs' nodes") {
    val pts = graft.operators.Collection.load(spark, sf001)
    val cents = graft.operators.Ann.seedCentroids(pts, 16)
    val clusters = Dedup.semanticClusters(pts, cents, threshold = 0.45)
      .as[(Long, Long, Long, Long)].collect()
    assert(clusters.nonEmpty)
    clusters.foreach { case (cid, n, minId, maxId) =>
      assert(cid == minId && n > 1 && minId < maxId)
    }
    // every clustered node must be an endpoint of a true >=0.45 pair
    val exactNodes = Dedup.embeddingCosinePairs(pts, 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    val clusteredSpan = clusters.flatMap(c => Seq(c._3, c._4)).toSet
    assert(clusteredSpan.subsetOf(exactNodes),
      s"IVF produced pairs outside the exact pair graph: ${clusteredSpan -- exactNodes}")
  }

  test("embedding near-dup plan has no cartesian or nested-loop join") {
    val pts = graft.operators.Collection.load(spark, sf001)
    val plan = Dedup.embeddingCosinePairs(pts, 0.45)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "plan contains CartesianProduct")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "plan contains BroadcastNestedLoopJoin")
  }

  test("cross-corpus minhash equals the self-pairs restricted to the boundary") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val cross = Dedup.minHashLshCrossPairs(
        docs.filter($"doc_id" >= 250), docs.filter($"doc_id" < 250),
        n = 3, k = 128, bands = 32, threshold = 0.7)
      .as[(Long, Long, Double)].collect().toSet
    // never an intra-side pair by construction
    assert(cross.forall { case (a, b, _) => a >= 250 && b < 250 })
    // equivalence: the self-join's boundary-crossing pairs, re-oriented
    val self = Dedup.minHashLshPairs(docs, n = 3, k = 128, bands = 32,
        threshold = 0.7)
      .as[(Long, Long, Double)].collect()
      .collect { case (a, b, j) if a < 250 && b >= 250 => (b, a, j) }
      .toSet
    assert(cross == self)
  }
}
