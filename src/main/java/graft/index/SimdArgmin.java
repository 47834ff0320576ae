package graft.index;

import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.VectorMask;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * SIMD (jdk.incubator.vector) float pass of the exact nearest-centroid
 * kernel: computes every float distance qn + cn - 2*q.c over the flat
 * row-major centroid matrix and collects the candidate set within an error
 * margin of the float minimum. The EXACT winner is then chosen by the
 * caller ({@link FlatCentroids}) with the reference double left-to-right
 * re-score, so float arithmetic here can never change a result - only
 * shrink how much of the matrix the exact loop has to touch.
 *
 * Scalar code cannot reach this shape on the JVM: C2 refuses to vectorize
 * float reductions (reassociation), measured at ~0.3k rows/s per core at
 * nlist 91k, d 64, vs ~3k rows/s for this kernel on 512-bit vectors.
 *
 * The class touches the incubator module only in method bodies; callers
 * gate on {@link #selfTest()} and fall back to the scalar kernel when the
 * module is absent at runtime (e.g. an executor launched without
 * --add-modules=jdk.incubator.vector).
 */
public final class SimdArgmin {
  private static final VectorSpecies<Float> S = FloatVector.SPECIES_PREFERRED;

  private SimdArgmin() {}

  /** Exercises the vector path end-to-end; throws if the module is absent. */
  public static boolean selfTest() {
    float[] flat = {1f, 0f, 0f, 1f};
    float[] cn = {1f, 1f};
    float[] dist = new float[2];
    int[] cand = new int[4];
    float[] q = {1f, 0f};
    int c = candidates(flat, cn, 2, 2, q, 1f, 0.01f, dist, cand);
    return c == 1 && cand[0] == 0;
  }

  /**
   * One SIMD pass filling distScratch with float distances (tracking the
   * minimum), then a scalar sweep collecting ascending indices with
   * dist <= min + margin into cand. Returns the candidate count, 0 for
   * degenerate inputs (NaN/Inf -> no float distance comparable), or -1 on
   * cand overflow - both of which the caller answers with the exact full
   * scan.
   */
  public static int candidates(float[] flat, float[] cNormSq, int n, int d,
                               float[] qf, float qn, float margin,
                               float[] distScratch, int[] cand) {
    int ub = S.loopBound(d);
    float minF = Float.MAX_VALUE;
    for (int c = 0; c < n; c++) {
      FloatVector acc = FloatVector.zero(S);
      int off = c * d;
      int j = 0;
      for (; j < ub; j += S.length())
        acc = FloatVector.fromArray(S, flat, off + j)
            .fma(FloatVector.fromArray(S, qf, j), acc);
      float dot = acc.reduceLanes(VectorOperators.ADD);
      for (; j < d; j++) dot += flat[off + j] * qf[j];
      float dist = qn + cNormSq[c] - 2f * dot;
      distScratch[c] = dist;
      if (dist < minF) minF = dist;
    }
    if (!(minF < Float.MAX_VALUE)) return 0;
    float thr = minF + margin;
    int cnt = 0;
    for (int c = 0; c < n; c++) {
      if (distScratch[c] <= thr) {
        if (cnt == cand.length) return -1;
        cand[cnt++] = c;
      }
    }
    return cnt;
  }

  /**
   * One SIMD pass filling distScratch with every float distance
   * qn + cn - 2*q.c (no candidate collection - the caller does its own
   * selection, e.g. top-k probe selection). Returns false when the
   * minimum never became comparable (NaN/Inf inputs) - the caller must
   * fall back to its exact scalar path.
   */
  public static boolean distances(float[] flat, float[] cNormSq, int n, int d,
                                  float[] qf, float qn, float[] distScratch) {
    int ub = S.loopBound(d);
    float minF = Float.MAX_VALUE;
    for (int c = 0; c < n; c++) {
      FloatVector acc = FloatVector.zero(S);
      int off = c * d;
      int j = 0;
      for (; j < ub; j += S.length())
        acc = FloatVector.fromArray(S, flat, off + j)
            .fma(FloatVector.fromArray(S, qf, j), acc);
      float dot = acc.reduceLanes(VectorOperators.ADD);
      for (; j < d; j++) dot += flat[off + j] * qf[j];
      float dist = qn + cNormSq[c] - 2f * dot;
      distScratch[c] = dist;
      if (dist < minF) minF = dist;
    }
    return minF < Float.MAX_VALUE;
  }

  /** Lane count of the preferred species - the tile width of
   * {@link #candidatesTile}. */
  public static int lanes() { return S.length(); }

  /**
   * One tile of B = lanes() queries with EACH QUERY IN ITS OWN LANE - the
   * shape that removes the per-centroid reduceLanes of the single-query
   * kernel entirely (measured: reduce-bound 0.4k rows/s -> multi-k rows/s
   * at nlist 91k, d 64). qT is the d x B column-major query tile; per
   * centroid one broadcast-FMA chain over d dims (4 independent
   * accumulators to break the FMA latency chain) yields the 16 dots at
   * once. Distances go to distScratch (n*B) and the lane-min is tracked;
   * pass 2 collects each lane's candidates within min + margin into
   * candIdx[t*maxCand..] (candCnt[t] = -1 on overflow, 0 for degenerate
   * NaN/Inf lanes - caller exact-scans those queries).
   */
  public static void candidatesTile(float[] flat, float[] cNormSq, int n, int d,
                                    float[] qT, float[] qn, float[] margin,
                                    float[] distScratch, int[] candIdx,
                                    int maxCand, int[] candCnt) {
    int B = S.length();
    FloatVector minV = FloatVector.broadcast(S, Float.MAX_VALUE);
    FloatVector qnV = FloatVector.fromArray(S, qn, 0);
    int d4 = d - (d & 3);
    for (int c = 0; c < n; c++) {
      int off = c * d;
      FloatVector a0 = FloatVector.zero(S), a1 = FloatVector.zero(S),
          a2 = FloatVector.zero(S), a3 = FloatVector.zero(S);
      int j = 0;
      for (; j < d4; j += 4) {
        a0 = FloatVector.fromArray(S, qT, j * B).fma(FloatVector.broadcast(S, flat[off + j]), a0);
        a1 = FloatVector.fromArray(S, qT, (j + 1) * B).fma(FloatVector.broadcast(S, flat[off + j + 1]), a1);
        a2 = FloatVector.fromArray(S, qT, (j + 2) * B).fma(FloatVector.broadcast(S, flat[off + j + 2]), a2);
        a3 = FloatVector.fromArray(S, qT, (j + 3) * B).fma(FloatVector.broadcast(S, flat[off + j + 3]), a3);
      }
      for (; j < d; j++)
        a0 = FloatVector.fromArray(S, qT, j * B).fma(FloatVector.broadcast(S, flat[off + j]), a0);
      FloatVector dot = a0.add(a1).add(a2.add(a3));
      FloatVector distV = qnV.add(cNormSq[c]).sub(dot.add(dot));
      distV.intoArray(distScratch, c * B);
      minV = minV.min(distV);
    }
    FloatVector thrV = minV.add(FloatVector.fromArray(S, margin, 0));
    java.util.Arrays.fill(candCnt, 0, B, 0);
    for (int c = 0; c < n; c++) {
      FloatVector dv = FloatVector.fromArray(S, distScratch, c * B);
      VectorMask<Float> m = dv.compare(VectorOperators.LE, thrV);
      if (m.anyTrue()) {
        long bits = m.toLong();
        while (bits != 0) {
          int t = Long.numberOfTrailingZeros(bits);
          bits &= bits - 1;
          int cnt = candCnt[t];
          if (cnt >= 0) {
            if (cnt >= maxCand) candCnt[t] = -1;
            else { candIdx[t * maxCand + cnt] = c; candCnt[t] = cnt + 1; }
          }
        }
      }
    }
  }
}
