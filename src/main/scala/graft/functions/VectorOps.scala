package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector compute kernels as Catalyst-native higher-order-function column
  * expressions (codegen-friendly, no UDFs).
  *
  * Semantics mirror the reference's GPU/CPU kernels:
  *  - L2 normalize: `x / max(||x||_2, 1e-12)` row-wise
  *    (reference: src/core/gpu_optimizer.py:81-124)
  *  - cosine similarity of pre-normalized vectors = plain dot product
  *    (reference: src/core/gpu_optimizer.py:126-174)
  *
  * All math is carried out in DOUBLE end-to-end (the reference computes in
  * float32; we choose DOUBLE for cross-engine determinism against the DuckDB
  * oracle — SURVEY.md §7.4).
  */
object VectorOps {

  /** Cast an array<float> column to array<double> for stable accumulation. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sum of element-wise products, accumulated left-to-right in DOUBLE.
    * Equivalent of the reference's `np.dot(candidates, query)`
    * (src/core/gpu_optimizer.py:166-174). Backed by the codegen'd
    * [[graft.plans.DotProductD]] — bitwise-identical to the HOF
    * formulation ([[dotHof]]) but ~20x faster (no per-element boxing,
    * participates in whole-stage codegen). Expects array<double>. */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dotD(a, b)

  /** Reference HOF formulation of [[dot]] (kept for differential tests). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(v: Column): Column = dot(v, v)

  /** L2 norm. */
  def l2Norm(v: Column): Column = sqrt(normSq(v))

  /** L2-normalize with the reference's epsilon guard
    * `x / max(norm, 1e-12)` (src/core/gpu_optimizer.py:101-104).
    *
    * NOTE: the norm sub-expression is re-evaluated per element by Catalyst;
    * for hot paths pre-compute the norm once per row with [[normalizeWith]].
    */
  def normalize(v: Column): Column = {
    val d = toDouble(v)
    transform(d, x => x / greatest(sqrt(dot(d, d)), lit(1e-12d)))
  }

  /** L2-normalize given a pre-computed norm column (one norm eval per row —
    * use `df.withColumn("nrm", l2Norm(toDouble(c)))` first). */
  def normalizeWith(v: Column, norm: Column): Column =
    transform(toDouble(v), x => x / greatest(norm, lit(1e-12d)))

  /** Full cosine similarity of arbitrary (non-normalized) vectors. */
  def cosine(a: Column, b: Column): Column = {
    val da = toDouble(a); val db = toDouble(b)
    dot(da, db) / greatest(l2Norm(da) * l2Norm(db), lit(1e-12d))
  }

  /** Euclidean distance (used by IVF centroid assignment). */
  def l2Dist(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, x) => acc + x))
}
