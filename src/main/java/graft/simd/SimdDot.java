package graft.simd;

import jdk.incubator.vector.ByteVector;
import jdk.incubator.vector.DoubleVector;
import jdk.incubator.vector.IntVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorShape;
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

  // ------------------------------------------------------------------
  // INT8 phase-1 kernel (r15): the quantized tiers' byte-slab scan was a
  // scalar multiply-add loop while the float tier ran the vector kernel
  // — the measured compute-vs-bandwidth crossover penalized int8 in the
  // compute-bound regimes. Integer arithmetic is EXACT, so unlike the
  // float kernels there is no rounding contract to preserve: any
  // evaluation order gives the bit-identical sum.
  // ------------------------------------------------------------------

  private static final VectorSpecies<Integer> SPI =
      IntVector.SPECIES_PREFERRED;
  // byte species with exactly SPI.length() lanes, so one byte load
  // widens (B2I) into one full int vector. Needs >= 256-bit int vectors
  // (a 128-bit platform would want a 32-bit byte shape, which the API
  // does not define) — INT8_OK gates the dispatch, scalar otherwise.
  public static final boolean INT8_OK = SPI.vectorBitSize() >= 256;
  private static final VectorSpecies<Byte> SPB = INT8_OK
      ? VectorSpecies.of(byte.class,
          VectorShape.forBitSize(SPI.vectorBitSize() / 4))
      : ByteVector.SPECIES_64;

  /** Exact integer dot of {@code len} int8 codes against a quantized
   *  query, both sign-extended to 32-bit lanes (widen, multiply,
   *  accumulate). Per-lane partial sums stay far inside int range for
   *  any realistic dim (|code·q| ≤ 127² = 16,129; at dim 2,048 a lane
   *  accumulates ≤ 256 products ≈ 4.1M). Callers must ensure
   *  {@code q.length >= len}. */
  public static long dotBytes(byte[] codes, int off, int len, byte[] q) {
    int d = 0;
    long s = 0;
    if (INT8_OK) {
      IntVector acc = IntVector.zero(SPI);
      int L = SPI.length();
      for (; d + L <= len; d += L) {
        IntVector c = (IntVector) ByteVector.fromArray(SPB, codes, off + d)
            .convertShape(VectorOperators.B2I, SPI, 0);
        IntVector qq = (IntVector) ByteVector.fromArray(SPB, q, d)
            .convertShape(VectorOperators.B2I, SPI, 0);
        acc = acc.add(c.mul(qq));
      }
      s = acc.reduceLanes(VectorOperators.ADD);
    }
    for (; d < len; d++) s += codes[off + d] * q[d];
    return s;
  }
}
