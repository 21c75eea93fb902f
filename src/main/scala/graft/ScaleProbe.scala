package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Collection}

/** Scaling-probe tool for the graph ANN path: builds the graph once on
  * the given fixture, then times (a) one single-query beam search and
  * (b) one BATCHED beam search over `nQueries` evenly-spread stored
  * vectors — the serving design point, where every hop join is shared
  * by the whole batch. Prints one JSON line per phase.
  *
  *   SPARK_GRAFT_KNN_CELLS=320 sbt "runMain graft.ScaleProbe /tmp/graft_scale/sf10 100"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nQueries = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val points = Collection.load(spark, sfDir)
      .select(col("id"), col("embedding"), col("user_id")).cache()
    val n = points.count()
    val cells = sys.env.getOrElse("SPARK_GRAFT_KNN_CELLS", "32").toInt
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val cents = Ann.seedCentroids(points, cells)
    val (graph, buildSecs) = timed {
      Ann.graphBuild(points, cents, graphK = 12, maxDegree = 16)
        .localCheckpoint()
    }
    val seeds = Ann.seedCentroids(points, 32).orderBy("cid").collect()
    val ecids = seeds.map(_.getLong(0)).toSeq
    val ecents = seeds.map(_.getSeq[Double](1).toSeq).toSeq
    def search(q: org.apache.spark.sql.DataFrame): Long =
      Ann.graphBeamSearch(points, graph, q, k = 10, beam = 24, hops = 8,
        entryCids = ecids, entryCents = ecents).count()
    val soloQ = points.filter(col("id") === 0)
      .select(col("id").as("qid"), col("embedding").as("qemb"))
    search(soloQ) // warmup (codegen)
    val (_, soloSecs) = timed(search(soloQ))
    val qids = (0 until nQueries).map(i => i * (n / nQueries))
    val batchQ = points.filter(col("id").isin(qids.map(Long.box): _*))
      .select(col("id").as("qid"), col("embedding").as("qemb"))
    val (rows, batchSecs) = timed(search(batchQ))
    // serving form: bucket-pruned pointer chasing over the persisted graph
    // (always under /tmp — the fixture dir may be read-only)
    val gPath = "/tmp/graft_probe_graphstore_" +
      sfDir.replaceAll("[^A-Za-z0-9]", "_")
    Ann.saveGraphBucketed(graph, gPath, nBuckets = 64)
    val qemb = points.filter(col("id") === 0)
      .select("embedding").head().getSeq[Double](0).toSeq
    def serve(): Long =
      Ann.graphBeamServe(points, gPath, nBuckets = 64, qemb, k = 10,
        beam = 24, hops = 8, entryCids = ecids, entryCents = ecents).count()
    serve() // warmup
    val (_, serveSecs) = timed(serve())
    println(s"""{"probe":"graph_beam","sf":"$sfDir","n":$n,"cells":$cells,""" +
      s""""build_secs":${math.rint(buildSecs * 100) / 100},""" +
      s""""solo_secs":${math.rint(soloSecs * 100) / 100},""" +
      s""""serve_secs":${math.rint(serveSecs * 100) / 100},""" +
      s""""batch_queries":$nQueries,"batch_rows":$rows,""" +
      s""""batch_secs":${math.rint(batchSecs * 100) / 100},""" +
      s""""batch_ms_per_query":${math.rint(batchSecs / nQueries * 1e5) / 100}}""")
    spark.stop()
  }
}
