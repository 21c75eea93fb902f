package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints the executed physical plan of the named
  * queries (or all). Used to audit pushdown (`PushedFilters`), column
  * pruning (`ReadSchema`), join strategies (BroadcastHashJoin vs
  * SortMergeJoin) and top-k (`TakeOrderedAndProject`) after every operator
  * change. `sbt "runMain graft.Explain knn_search tpch_q5_regional_revenue"` */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n========== $name ==========")
      try println(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString.take(6000))
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
