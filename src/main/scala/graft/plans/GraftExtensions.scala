package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions so `spark.sql("SELECT dot_d(a, b) ...")`
  * and the DataFrame API share one implementation.
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object GraftExtensions {

  /** Capacity/int parameter of a SQL call must be a foldable int literal
    * (it is index metadata baked into the expression, like percentile's
    * percentage argument). */
  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal INT, got $other")
  }

  /** Register the same functions on an already-running session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.GraftBridge.registerFunction
    registerFunction(spark, "dot_d", args => DotProductD(args(0), args(1)))
    registerFunction(spark, "normalize_l2", args => NormalizeL2(args.head))
    registerFunction(spark, "sorted_intersect_count",
      args => SortedLongIntersectCount(args(0), args(1)))
    registerFunction(spark, "hash60", args => Hash60(args.head))
    registerFunction(spark, "nfc", args => NfcNormalize(args.head))
    registerFunction(spark, "sign_pack64", args => SignPack64(args.head))
    registerFunction(spark, "misra_gries",
      args => MisraGriesSketch(args(0), intLit(args(1), "misra_gries capacity")))
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
    ext.injectFunction((
      FunctionIdentifier("nfc"),
      info("nfc", "nfc(s) - Unicode NFC canonical composition of a string"),
      (args: Seq[Expression]) => NfcNormalize(args.head)))
    ext.injectFunction((
      FunctionIdentifier("sign_pack64"),
      info("sign_pack64", "sign_pack64(v) - 64-bit sign signature of array<double>"),
      (args: Seq[Expression]) => SignPack64(args.head)))
    ext.injectFunction((
      FunctionIdentifier("misra_gries"),
      info("misra_gries",
        "misra_gries(col, m) - Misra-Gries heavy-hitters sketch: map<value, count>, at most m entries"),
      (args: Seq[Expression]) =>
        MisraGriesSketch(args(0), GraftExtensions.intLit(args(1), "misra_gries capacity"))))
  }
}
