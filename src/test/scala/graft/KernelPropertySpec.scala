package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.functions.{TextOps, VectorOps}
import graft.plans.VectorExpressions

/** Differential property tests: every native kernel must agree exactly with
  * an independent formulation (HOF pipeline or plain Scala) on seeded
  * random inputs — the in-JVM analogue of the DuckDB oracle. */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)
  private def randVec(d: Int): Seq[Double] = Seq.fill(d)(rnd.nextGaussian())

  test("DotProductD == HOF dot == plain Scala on 200 random pairs") {
    val pairs = (0 until 200).map { i =>
      val d = 1 + rnd.nextInt(96)
      (i.toLong, randVec(d), randVec(d))
    }
    val df = pairs.toDF("i", "a", "b")
      .select($"i", VectorOps.dot($"a", $"b").as("native"),
        VectorOps.dotHof($"a", $"b").as("hof"))
      .as[(Long, Double, Double)].collect()
    val expected = pairs.map(p =>
      p._1 -> p._2.zip(p._3).foldLeft(0.0d) { case (acc, (x, y)) => acc + x * y }).toMap
    df.foreach { case (i, native, hof) =>
      assert(native == hof, s"row $i: native $native != hof $hof")
      assert(native == expected(i), s"row $i: native $native != scala ${expected(i)}")
    }
  }

  test("NormalizeL2 equals the HOF normalize formulation exactly") {
    val vecs = (0 until 100).map(i => (i.toLong, randVec(1 + rnd.nextInt(64))))
    val got = vecs.toDF("i", "v")
      .select($"i",
        VectorExpressions.normalizeL2($"v").as("native"),
        VectorOps.normalize($"v").as("hof"))
      .as[(Long, Seq[Double], Seq[Double])].collect()
    got.foreach { case (i, n, h) =>
      assert(n == h, s"row $i differs")
    }
  }

  test("SortedLongIntersectCount == Scala Set intersection on 200 random sets") {
    val sets = (0 until 200).map { i =>
      val a = Seq.fill(rnd.nextInt(50))(rnd.nextInt(100).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(50))(rnd.nextInt(100).toLong).distinct.sorted
      (i.toLong, a, b)
    }
    val got = sets.toDF("i", "a", "b")
      .select($"i", VectorExpressions.sortedIntersectCount($"a", $"b").as("c"))
      .as[(Long, Int)].collect().toMap
    sets.foreach { case (i, a, b) =>
      assert(got(i) == (a.toSet intersect b.toSet).size, s"row $i")
    }
  }

  test("Hash60 equals the md5-hex-prefix formulation for random strings") {
    val strs = (0 until 200).map(i =>
      (i.toLong, Random.alphanumeric.take(rnd.nextInt(30)).mkString + "é日" * rnd.nextInt(3)))
    val got = strs.toDF("i", "s")
      .select($"i", TextOps.hash60($"s").as("native"),
        conv(substring(md5($"s"), 1, 15), 16, 10).cast("long").as("hex"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (i, n, h) => assert(n == h, s"row $i: $n != $h") }
  }

  test("RepetitionCounts equals a naive Scala implementation on 200 random docs") {
    def naive(w: Seq[String]): (Long, Long, Long, Long, Long) = {
      val total = w.map(_.length.toLong).sum
      def top(grams: Seq[String], contentLen: String => Int): Long = {
        val counts = grams.groupBy(identity).view.mapValues(_.size).toMap
        val repeated = counts.filter(_._2 >= 2)
        if (repeated.isEmpty) 0L
        else {
          val (g, c) = repeated.minBy { case (g, c) => (-c, g) }
          c.toLong * contentLen(g)
        }
      }
      val wc = w.groupBy(identity).view.mapValues(_.size).toMap
      val dup = wc.collect { case (g, c) if c > 1 => c.toLong * g.length }.sum
      val bi = w.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val tri = w.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      (total, top(w, _.length), dup,
        top(bi, g => g.length - 1), top(tri, g => g.length - 2))
    }
    val docs = (0 until 200).map { i =>
      val words = Seq.fill(rnd.nextInt(40))(s"w${rnd.nextInt(6)}x${rnd.nextInt(3)}")
      (i.toLong, words)
    }
    val got = docs.toDF("i", "w")
      .select($"i", graft.plans.TextExpressions.repetitionCounts($"w").as("r"))
      .select($"i", $"r.total_chars", $"r.top_word_chars", $"r.dup_word_chars",
        $"r.top_bigram_chars", $"r.top_trigram_chars")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5, t._6)).toMap
    docs.foreach { case (i, w) =>
      assert(got(i) == naive(w), s"doc $i (${w.take(8)}...): ${got(i)} != ${naive(w)}")
    }
  }

  test("ShingleHashSet60 equals the HOF shingle pipeline") {
    val docs = (0 until 100).map { i =>
      val words = Seq.fill(rnd.nextInt(30))(s"w${rnd.nextInt(10)}")
      (i.toLong, words.mkString(" "))
    }
    val ws = TextOps.words($"text")
    val hofPipeline = array_sort(array_distinct(transform(
      TextOps.shingles(ws, 3),
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))))
    val got = docs.toDF("i", "text")
      .select($"i", TextOps.shingleHashSet(ws, 3).as("native"), hofPipeline.as("hof"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    got.foreach { case (i, n, h) => assert(n == h, s"row $i: $n != $h") }
  }
}
