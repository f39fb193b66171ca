package graft.expressions;

import org.apache.spark.sql.catalyst.util.ArrayData;
import org.apache.spark.sql.catalyst.util.GenericArrayData;

/**
 * Tight-loop kernels behind {@link VectorDot} / {@link VectorL2Sq} /
 * {@link PqEncode} — the r19 optimization round's replacement for the
 * higher-order-function spellings of the similarity hot paths.
 *
 * WHY: Spark's higher-order functions (transform/aggregate/zip_with) are
 * CodegenFallback — every lambda step is an interpreted Catalyst eval with
 * boxing, so a 64-dim dot product costs ~200 interpreted node evaluations
 * per call, and PQ coding costs m·k of those folds PER ROW. These kernels
 * run the identical arithmetic as one static Java call that whole-stage
 * codegen can inline (the StringKernels pattern, SURVEY.md §7.5 risk 5).
 *
 * BIT-EXACTNESS CONTRACT (the cross-engine determinism rules depend on it):
 * every loop accumulates in ascending index order from the same initial
 * value as the fold it replaces, so each result is the identical IEEE-754
 * value the aggregate(zip_with(...)) expression produced — including the
 * null semantics: zip_with pads a length mismatch with null and a null
 * element poisons the fold, hence the null returns below.
 */
public final class VectorKernels {
  private VectorKernels() {}

  /** Sequential-fold dot product; bit-identical to
   * {@code aggregate(zip_with(a,b,(x,y)->x*y), 0.0d, +)}. */
  public static Double dot(ArrayData a, ArrayData b) {
    int n = a.numElements();
    if (b.numElements() != n) return null;
    double s = 0.0;
    for (int i = 0; i < n; i++) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null;
      s += a.getDouble(i) * b.getDouble(i);
    }
    return s;
  }

  /** Sequential-fold squared L2 distance; bit-identical to
   * {@code aggregate(zip_with(a,b,(x,y)->(x-y)*(x-y)), 0.0d, +)}. */
  public static Double l2sq(ArrayData a, ArrayData b) {
    int n = a.numElements();
    if (b.numElements() != n) return null;
    double s = 0.0;
    for (int i = 0; i < n; i++) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null;
      double d = a.getDouble(i) - b.getDouble(i);
      s += d * d;
    }
    return s;
  }

  /** PQ codes; bit-identical to the Pq.codesFor fold: per subspace the
   * FIRST strict-&lt; argmin over the codebook by the sequential-fold l2sq
   * of the subvector slice. A slice that runs off the vector end, or one
   * carrying a null element, made every per-centroid distance null in the
   * fold (zip_with padding), so no centroid ever updated the accumulator —
   * mirrored here as "never update", leaving the fold's initial cid −1.
   * NaN distances also never update (NaN &lt; best is false both ways). */
  public static ArrayData pqEncode(ArrayData v, double[][][] cbs, int subDim) {
    int m = cbs.length;
    int[] codes = new int[m];
    int vn = v.numElements();
    for (int s = 0; s < m; s++) {
      double best = Double.POSITIVE_INFINITY;
      int cid = -1;
      int off = s * subDim;
      if (off + subDim <= vn) {
        boolean hasNull = false;
        for (int j = 0; j < subDim && !hasNull; j++) hasNull = v.isNullAt(off + j);
        if (!hasNull) {
          double[][] cb = cbs[s];
          for (int c = 0; c < cb.length; c++) {
            double[] cv = cb[c];
            double d = 0.0;
            for (int j = 0; j < subDim; j++) {
              double x = v.getDouble(off + j) - cv[j];
              d += x * x;
            }
            if (d < best) { best = d; cid = c; }
          }
        }
      }
      codes[s] = cid;
    }
    return new GenericArrayData(codes);
  }
}
