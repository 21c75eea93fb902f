package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions so `spark.sql("SELECT dot_d(a, b) ...")`
  * and the DataFrame API share one implementation.
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object GraftExtensions {
  /** Register the same functions on an already-running session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.GraftBridge.registerFunction
    registerFunction(spark, "dot_d", args => DotProductD(args(0), args(1)))
    registerFunction(spark, "normalize_l2", args => NormalizeL2(args.head))
    registerFunction(spark, "sorted_intersect_count",
      args => SortedLongIntersectCount(args(0), args(1)))
    registerFunction(spark, "hash60", args => Hash60(args.head))
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_d"),
      info("dot_d", "dot_d(a, b) - dot product of two array<double> vectors"),
      (args: Seq[Expression]) => DotProductD(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("normalize_l2"),
      info("normalize_l2", "normalize_l2(v) - L2-normalize array<float|double> to array<double>"),
      (args: Seq[Expression]) => NormalizeL2(args.head)))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - |A∩B| of sorted distinct array<bigint>"),
      (args: Seq[Expression]) => SortedLongIntersectCount(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("hash60"),
      info("hash60", "hash60(s) - first 60 bits of md5(s) as bigint"),
      (args: Seq[Expression]) => Hash60(args.head)))
  }
}
