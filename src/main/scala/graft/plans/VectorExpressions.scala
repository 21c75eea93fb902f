package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

/** Native Catalyst expressions for the hot vector/set kernels.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`/`transform`) are
  * interpreted per element with boxing and are excluded from whole-stage
  * codegen, which makes them the bottleneck of pairwise scoring (measured:
  * 35s for 2M 64-d dots at sf0.1). These expressions generate tight Java
  * loops over `ArrayData` instead — the Spark-native analogue of the
  * reference's fused GPU kernels (src/core/gpu_optimizer.py:126-164).
  *
  * Semantics are IDENTICAL to the HOF formulations used by the DuckDB
  * oracle: left-to-right double accumulation, so results match bitwise.
  */

/** Dot product of two array<double> columns: sum(a[i]*b[i]) over the common
  * prefix, accumulated left-to-right in double. Assumes non-null elements
  * (engine arrays are produced by normalization, which never emits null). */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dot_d expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0d
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}

/** Intersection cardinality of two SORTED distinct long arrays via a merge
  * walk — O(|a|+|b|), no hashing, no boxing. The Jaccard kernel:
  * |A∩B| / (|A|+|B| - |A∩B|). Inputs must be `array_sort(array_distinct(…))`. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val nx = x.numElements(); val ny = y.numElements()
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** One-pass L2 normalization of array<float|double> into array<double>:
  * out[i] = x[i] / max(‖x‖₂, 1e-12) (the reference's epsilon guard,
  * src/core/gpu_optimizer.py:101-104). The HOF formulation is O(d²) after
  * projection collapse inlines the norm into the per-element lambda; this
  * is O(d) and codegen'd. */
case class NormalizeL2(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private lazy val fromFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(org.apache.spark.sql.types.FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"normalize_l2 expects array<float|double>, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = if (fromFloat) x.getFloat(i).toDouble else x.getDouble(i)
      i += 1
    }
    var s = 0.0d; i = 0
    while (i < n) { s += out(i) * out(i); i += 1 }
    val norm = math.max(math.sqrt(s), 1e-12d)
    i = 0
    while (i < n) { out(i) = out(i) / norm; i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val out = ctx.freshName("out")
      val nrm = ctx.freshName("nrm")
      val get = if (fromFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $out[$i] = $get; $s += $out[$i] * $out[$i]; }
         |double $nrm = java.lang.Math.max(java.lang.Math.sqrt($s), 1e-12);
         |for (int $i = 0; $i < $n; $i++) { $out[$i] = $out[$i] / $nrm; }
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeL2 =
    copy(child = newChild)
}

/** Binary quantization: pack the sign bits of an array<double> (≤64 dims)
  * into one bigint — bit i set iff v[i] > 0. The 64-d embedding collapses
  * from 512 bytes to 8: the phase-1 scan of a binary-quantized two-phase
  * search reads 64× less than the float column, and the cheap score is a
  * single XOR+POPCNT. Codegen'd one-pass loop. */
case class SignPack64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_pack64 expects array<double>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), 64)
    var s = 0L
    var i = 0
    while (i < n) { if (x.getDouble(i) > 0.0d) s |= (1L << i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), 64);
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getDouble($i) > 0.0) $s |= (1L << $i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignPack64 =
    copy(child = newChild)
}

/** Map-side IVF assignment: the id of the nearest centroid (max 6dp-rounded
  * dot product; smallest cid on ties — the project determinism rule). The
  * centroid matrix is an index parameter carried INSIDE the expression (a
  * reference object in codegen), so assignment is a pure projection: no
  * crossJoin, no Window, no Exchange — each input row costs C dot products
  * map-side. At C=1024 / 100 TB this is the difference between a scan and a
  * 1000×-inflated shuffle of the exploded (point × centroid) set.
  *
  * Rounding matches Spark's `round(x, 6)` (HALF_UP over
  * BigDecimal.valueOf), so hashes are identical to the former
  * crossJoin+row_number formulation. */
case class NearestCentroid(
    child: Expression, cids: Seq[Long], cents: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(cids.nonEmpty && cids.length == cents.length,
    "nearest_centroid needs a non-empty, aligned (cid, centroid) set")

  // flat row-major copy for tight loops (and a single codegen reference)
  @transient private lazy val dim: Int = cents.head.length
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](cents.length * dim)
    var c = 0
    while (c < cents.length) {
      val v = cents(c); var i = 0
      while (i < dim) { a(c * dim + i) = v(i); i += 1 }
      c += 1
    }
    a
  }
  @transient private lazy val cidArr: Array[Long] = cids.toArray

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<double>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    var best = java.lang.Double.NEGATIVE_INFINITY
    var bestCid = java.lang.Long.MAX_VALUE
    var c = 0
    while (c < cidArr.length) {
      var s = 0.0d; var i = 0
      while (i < n) { s += x.getDouble(i) * flat(c * dim + i); i += 1 }
      val r = Num.round6(s)
      if (r > best || (r == best && cidArr(c) < bestCid)) {
        best = r; bestCid = cidArr(c)
      }
      c += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("centFlat", flat, "double[]")
      val cidRef = ctx.addReferenceObj("centIds", cidArr, "long[]")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val r = ctx.freshName("r"); val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |double $best = java.lang.Double.NEGATIVE_INFINITY;
         |long $bestCid = java.lang.Long.MAX_VALUE;
         |for (int $c = 0; $c < $cidRef.length; $c++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $flatRef[$c * $dim + $i];
         |  }
         |  double $r = graft.plans.Num.round6($s);
         |  if ($r > $best || ($r == $best && $cidRef[$c] < $bestCid)) {
         |    $best = $r; $bestCid = $cidRef[$c];
         |  }
         |}
         |${ev.value} = $bestCid;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** [[NearestCentroid]]'s score twin: the BEST rounded dot product against
  * the embedded centroid set (same round-6/lower-cid argmax walk, but
  * returning the winning score instead of the winning cid) — the
  * per-point assignment-cost input of k-means|| seeding. One flat codegen
  * loop, C dots per row, no join; the former formulation (a per-row
  * `element_at` on a C-entry literal MAP of d-element arrays) rebuilt the
  * whole map per row — measured 6× slower seeding at C=64. */
case class NearestCentroidDot(
    child: Expression, cents: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(cents.nonEmpty, "nearest_centroid_dot needs a non-empty centroid set")

  @transient private lazy val dim: Int = cents.head.length
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](cents.length * dim)
    var c = 0
    while (c < cents.length) {
      val v = cents(c); var i = 0
      while (i < dim) { a(c * dim + i) = v(i); i += 1 }
      c += 1
    }
    a
  }
  @transient private lazy val nCents: Int = cents.length

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid_dot expects array<double>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    var best = java.lang.Double.NEGATIVE_INFINITY
    var c = 0
    while (c < nCents) {
      var s = 0.0d; var i = 0
      while (i < n) { s += x.getDouble(i) * flat(c * dim + i); i += 1 }
      val r = Num.round6(s)
      if (r > best) best = r
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("centFlat", flat, "double[]")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val r = ctx.freshName("r"); val best = ctx.freshName("best")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |double $best = java.lang.Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $nCents; $c++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $flatRef[$c * $dim + $i];
         |  }
         |  double $r = graft.plans.Num.round6($s);
         |  if ($r > $best) $best = $r;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidDot =
    copy(child = newChild)
}

/** Map-side multi-cell probe assignment: the `p` nearest centroid ids
  * (rounded score desc, smallest cid on ties), as an array<bigint> — the
  * query-side counterpart of [[NearestCentroid]] for bulk k-NN joins: each
  * point probes its top-p cells, the data side keeps its top-1, and the
  * candidate join is a plain equi-join on cid. Same embedded-centroid
  * design: a pure projection, C dot products per row, no Exchange. */
case class TopCentroids(
    child: Expression, cids: Seq[Long], cents: Seq[Seq[Double]], p: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(cids.nonEmpty && cids.length == cents.length,
    "top_centroids needs a non-empty, aligned (cid, centroid) set")
  require(p >= 1 && p <= cids.length, s"p=$p out of range 1..${cids.length}")

  @transient private lazy val dim: Int = cents.head.length
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](cents.length * dim)
    var c = 0
    while (c < cents.length) {
      val v = cents(c); var i = 0
      while (i < dim) { a(c * dim + i) = v(i); i += 1 }
      c += 1
    }
    a
  }
  @transient private lazy val cidArr: Array[Long] = cids.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"top_centroids expects array<double>, got ${t.simpleString}")
  }

  private def roundedScores(x: ArrayData): Array[Double] = {
    val n = math.min(x.numElements(), dim)
    val scores = new Array[Double](cidArr.length)
    var c = 0
    while (c < cidArr.length) {
      var s = 0.0d; var i = 0
      while (i < n) { s += x.getDouble(i) * flat(c * dim + i); i += 1 }
      scores(c) = Num.round6(s)
      c += 1
    }
    scores
  }

  override def nullSafeEval(v: Any): Any = {
    val scores = roundedScores(v.asInstanceOf[ArrayData])
    val used = new Array[Boolean](cidArr.length)
    val out = new Array[Long](p)
    var k = 0
    while (k < p) {
      var best = java.lang.Double.NEGATIVE_INFINITY
      var bi = -1
      var c = 0
      while (c < cidArr.length) {
        if (!used(c) && (scores(c) > best ||
          (scores(c) == best && (bi < 0 || cidArr(c) < cidArr(bi))))) {
          best = scores(c); bi = c
        }
        c += 1
      }
      used(bi) = true; out(k) = cidArr(bi)
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("centFlat", flat, "double[]")
      val cidRef = ctx.addReferenceObj("centIds", cidArr, "long[]")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val scores = ctx.freshName("scores"); val used = ctx.freshName("used")
      val out = ctx.freshName("out"); val k = ctx.freshName("k")
      val best = ctx.freshName("best"); val bi = ctx.freshName("bi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |double[] $scores = new double[$cidRef.length];
         |for (int $c = 0; $c < $cidRef.length; $c++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $flatRef[$c * $dim + $i];
         |  }
         |  $scores[$c] = graft.plans.Num.round6($s);
         |}
         |boolean[] $used = new boolean[$cidRef.length];
         |long[] $out = new long[$p];
         |for (int $k = 0; $k < $p; $k++) {
         |  double $best = java.lang.Double.NEGATIVE_INFINITY;
         |  int $bi = -1;
         |  for (int $c = 0; $c < $cidRef.length; $c++) {
         |    if (!$used[$c] && ($scores[$c] > $best ||
         |        ($scores[$c] == $best && ($bi < 0 || $cidRef[$c] < $cidRef[$bi])))) {
         |      $best = $scores[$c]; $bi = $c;
         |    }
         |  }
         |  $used[$bi] = true; $out[$k] = $cidRef[$bi];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TopCentroids =
    copy(child = newChild)
}

object VectorExpressions {
  import org.apache.spark.sql.GraftBridge

  /** Column wrappers. */
  def dotD(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProductD(GraftBridge.expression(a), GraftBridge.expression(b)))
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftBridge.column(SortedLongIntersectCount(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  def normalizeL2(v: Column): Column =
    GraftBridge.column(NormalizeL2(GraftBridge.expression(v)))
  def signPack64(v: Column): Column =
    GraftBridge.column(SignPack64(GraftBridge.expression(v)))
  def nearestCentroid(v: Column, cids: Seq[Long], cents: Seq[Seq[Double]]): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(v), cids, cents))
  def nearestCentroidDot(v: Column, cents: Seq[Seq[Double]]): Column =
    GraftBridge.column(NearestCentroidDot(GraftBridge.expression(v), cents))
  def topCentroids(v: Column, cids: Seq[Long], cents: Seq[Seq[Double]], p: Int): Column =
    GraftBridge.column(TopCentroids(GraftBridge.expression(v), cids, cents, p))
}
