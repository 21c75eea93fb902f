package graft.simd;

import jdk.incubator.vector.DoubleVector;
import jdk.incubator.vector.VectorSpecies;

/**
 * SIMD dot-product kernels over the serving replica's TRANSPOSED block
 * layout (see {@code BatchedServer.FlatReplica}): rows are grouped into
 * blocks of {@link #LANES}, and within a block element (row lane l,
 * dim d) sits at {@code base + d*LANES + l} — so one vector load reads
 * the d-th component of LANES consecutive rows, and each SIMD lane
 * accumulates ONE row's products strictly in dim order.
 *
 * <p>Exactness contract: multiplication and addition are SEPARATE
 * vector ops (no fused multiply-add — FMA rounds once where the scalar
 * kernel rounds twice), so every lane's accumulation is BIT-IDENTICAL
 * to the scalar left-to-right {@code s += emb[d] * q[d]} loop the
 * serving tiers are specified against. The kernel only changes WHICH
 * rows advance together, never any row's rounding path — the same
 * argument the scalar 4-row-blocked kernel makes, verified lane-for-
 * lane in ServingKernelSpec.
 *
 * <p>The incubator module must be present at runtime
 * ({@code --add-modules=jdk.incubator.vector}, wired in build.sbt);
 * {@code SimdSupport} class-loads this class inside a try so its
 * absence degrades to the scalar kernel instead of failing.
 */
public final class SimdDot {

  private static final VectorSpecies<Double> SP = DoubleVector.SPECIES_PREFERRED;

  /** Rows per block = SIMD lanes of the platform's preferred species
   *  (8 on AVX-512, 4 on AVX2, 2 on SSE2/NEON). */
  public static final int LANES = SP.length();

  private SimdDot() {}

  /** Dots of one block (LANES rows) against FOUR queries; results at
   *  {@code out[qi*LANES + lane]}. Queries must have length ≥ dim. */
  public static void block4(double[] t, int base, int dim,
      double[] q0, double[] q1, double[] q2, double[] q3, double[] out) {
    DoubleVector s0 = DoubleVector.zero(SP), s1 = DoubleVector.zero(SP);
    DoubleVector s2 = DoubleVector.zero(SP), s3 = DoubleVector.zero(SP);
    for (int d = 0; d < dim; d++) {
      DoubleVector e = DoubleVector.fromArray(SP, t, base + d * LANES);
      s0 = s0.add(e.mul(q0[d]));
      s1 = s1.add(e.mul(q1[d]));
      s2 = s2.add(e.mul(q2[d]));
      s3 = s3.add(e.mul(q3[d]));
    }
    s0.intoArray(out, 0);
    s1.intoArray(out, LANES);
    s2.intoArray(out, 2 * LANES);
    s3.intoArray(out, 3 * LANES);
  }

  /** Dots of one block against TWO queries; results at
   *  {@code out[qi*LANES + lane]}. */
  public static void block2(double[] t, int base, int dim,
      double[] q0, double[] q1, double[] out) {
    DoubleVector s0 = DoubleVector.zero(SP), s1 = DoubleVector.zero(SP);
    for (int d = 0; d < dim; d++) {
      DoubleVector e = DoubleVector.fromArray(SP, t, base + d * LANES);
      s0 = s0.add(e.mul(q0[d]));
      s1 = s1.add(e.mul(q1[d]));
    }
    s0.intoArray(out, 0);
    s1.intoArray(out, LANES);
  }

  /** Dots of one block against ONE query; results at {@code out[lane]}. */
  public static void block1(double[] t, int base, int dim,
      double[] q0, double[] out) {
    DoubleVector s0 = DoubleVector.zero(SP);
    for (int d = 0; d < dim; d++) {
      DoubleVector e = DoubleVector.fromArray(SP, t, base + d * LANES);
      s0 = s0.add(e.mul(q0[d]));
    }
    s0.intoArray(out, 0);
  }
}
