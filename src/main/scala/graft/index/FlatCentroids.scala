package graft.index

/** Flat row-major centroid matrix + the EXACT nearest-centroid kernel of
  * the encode stage — the train bottleneck at the reference's tested
  * ceiling (35M×64, nlist ≈ 91k: profiled 9,042 s dominated by this argmin,
  * EVAL_r09 `scale_run_35m`).
  *
  * Result contract (what every caller and the DuckDB oracle replay assume):
  * identical to the reference brute loop — left-to-right double summation
  * per centroid, strict `<`, first(lowest)-index wins ties. Two execution
  * paths, both honoring it exactly:
  *
  *  - SIMD (default where `jdk.incubator.vector` is present, detected per
  *    JVM): one [[SimdArgmin]] float pass computes all distances via
  *    qn + cn − 2·q·c on 512/256-bit lanes, then the few candidates within
  *    a conservative float-error margin (1e-4 relative vs ≤ ~1e-5 true
  *    worst-case eval error — float math can only ADD candidates, never
  *    drop the exact winner) are re-scored with the reference double loop.
  *    Measured ~10× the scalar path at nlist 91k, d 64.
  *  - scalar fallback: the same flat matrix scanned sequentially with the
  *    partial-sum early exit (memory-local form of the brute loop; the
  *    shape a cluster executor without the incubator module runs).
  *
  * A triangle-inequality parent-pruned variant was built and measured
  * first: at the target geometry (d 64, clustered corpus, nlist 91k) the
  * annulus bound prunes only ~7% of centroids and its id-indirection
  * breaks cache locality — 0.5× brute, a regression. Flat + SIMD replaces
  * it on measurement (EncodeBench), not intuition.
  *
  * Ships to executors as ONE broadcast: n·d floats + n norms.
  */
final class FlatCentroids private (
    val n: Int, val d: Int,
    val flat: Array[Float], val cNormSq: Array[Float],
    cnMax: Float) extends Serializable {

  /** Component j of centroid c (the nested-array layout, flattened). */
  @inline def value(c: Int, j: Int): Float = flat(c * d + j)

  // per-thread SIMD scratch (distances + candidate ids) — executor task
  // threads share the broadcast instance
  @transient private lazy val scratch =
    new ThreadLocal[(Array[Float], Array[Int])] {
      override def initialValue(): (Array[Float], Array[Int]) =
        (new Array[Float](n), new Array[Int](FlatCentroids.MaxCands))
    }

  // tile scratch for the batched path: qT (d×B col-major), qn, margin,
  // dist matrix (n×B — e.g. 5.8 MB at nlist 91k on 16 lanes), candidates.
  // Per executor thread, lazily allocated, reused across every tile.
  @transient private lazy val tileScratch =
    new ThreadLocal[(Array[Float], Array[Float], Array[Float], Array[Float], Array[Int], Array[Int])] {
      override def initialValue() = {
        val b = SimdArgmin.lanes()
        (new Array[Float](d * b), new Array[Float](b), new Array[Float](b),
          new Array[Float](n * b), new Array[Int](b * FlatCentroids.MaxCands),
          new Array[Int](b))
      }
    }

  /** Exact argmin_c ‖q − centroid_c‖² (brute semantics, see class doc). */
  def nearest(q: Array[Double]): Int =
    if (FlatCentroids.simdAvailable) {
      val (dists, cand) = scratch.get()
      val qf = new Array[Float](d)
      var qnd = 0.0
      var j = 0
      while (j < d) { val v = q(j); qf(j) = v.toFloat; qnd += v * v; j += 1 }
      val qn = qnd.toFloat
      val margin = 1e-4f * (qn + cnMax + 1f)
      val cnt = SimdArgmin.candidates(flat, cNormSq, n, d, qf, qn, margin, dists, cand)
      if (cnt > 0) rescore(cand, 0, cnt, q) else nearestScalar(q)
    } else nearestScalar(q)

  /** Exact argmin for a batch of queries — the encode-pass form. On the
    * SIMD path each [[SimdArgmin.lanes]]-query tile runs with one query
    * per vector lane (no per-centroid lane reduction, the single-query
    * kernel's bottleneck); per-query exact double re-score picks the
    * final winner, so results are identical to calling [[nearest]] per
    * row — the specs assert it.
    */
  def nearestBatch(qs: Array[Array[Double]], out: Array[Int]): Unit = {
    if (!FlatCentroids.simdAvailable) {
      var i = 0
      while (i < qs.length) { out(i) = nearestScalar(qs(i)); i += 1 }
      return
    }
    val b = SimdArgmin.lanes()
    val (qT, qn, margin, dists, candIdx, candCnt) = tileScratch.get()
    var s = 0
    while (s < qs.length) {
      val live = math.min(b, qs.length - s)
      var t = 0
      while (t < b) {
        // pad trailing lanes of a ragged final tile with the first live
        // query — computed but never read back
        val q = qs(s + math.min(t, live - 1))
        require(q.length == d, s"query dim ${q.length} != $d")
        var qnd = 0.0
        var j = 0
        while (j < d) { val v = q(j); qT(j * b + t) = v.toFloat; qnd += v * v; j += 1 }
        qn(t) = qnd.toFloat
        margin(t) = 1e-4f * (qn(t) + cnMax + 1f)
        t += 1
      }
      SimdArgmin.candidatesTile(flat, cNormSq, n, d, qT, qn, margin,
        dists, candIdx, FlatCentroids.MaxCands, candCnt)
      t = 0
      while (t < live) {
        val cnt = candCnt(t)
        out(s + t) =
          if (cnt > 0) rescore(candIdx, t * FlatCentroids.MaxCands, cnt, qs(s + t))
          else nearestScalar(qs(s + t))
        t += 1
      }
      s += b
    }
  }

  /** The scalar path (public so the no-SIMD shape stays benchmarkable and
    * spec-gated on any JVM).
    */
  def nearestScalar(q: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < n) {
      val off = c * d
      var s = 0.0
      var j = 0
      while (j < d && s < bestD) { val df = q(j) - flat(off + j); s += df * df; j += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  // exact double re-score of the (ascending) candidate ids — the reference
  // loop restricted to survivors, so ties resolve to the lowest index
  private def rescore(cand: Array[Int], from: Int, cnt: Int, q: Array[Double]): Int = {
    var best = cand(from)
    var bestD = Double.MaxValue
    var i = from
    while (i < from + cnt) {
      val c = cand(i)
      val off = c * d
      var s = 0.0
      var j = 0
      while (j < d && s < bestD) { val df = q(j) - flat(off + j); s += df * df; j += 1 }
      if (s < bestD) { bestD = s; best = c }
      i += 1
    }
    best
  }
}

object FlatCentroids {

  /** Candidate-buffer cap; an overflow (pathologically flat geometry)
    * falls back to the exact full scan rather than growing.
    */
  val MaxCands = 128

  /** Per-JVM feature detection — driver and each executor decide
    * independently, so a mixed cluster degrades per-node.
    */
  val simdAvailable: Boolean =
    try SimdArgmin.selfTest()
    catch { case _: Throwable => false }

  def build(centroids: Array[Array[Float]]): FlatCentroids = {
    val n = centroids.length
    require(n > 0, "FlatCentroids over empty centroid list")
    val d = centroids(0).length
    val flat = new Array[Float](n * d)
    val cNormSq = new Array[Float](n)
    var cnMax = 0f
    var i = 0
    while (i < n) {
      val c = centroids(i)
      require(c.length == d, s"ragged centroid dim at $i: ${c.length} != $d")
      System.arraycopy(c, 0, flat, i * d, d)
      var s = 0.0
      var j = 0
      while (j < d) { val v = c(j).toDouble; s += v * v; j += 1 }
      cNormSq(i) = s.toFloat
      if (cNormSq(i) > cnMax) cnMax = cNormSq(i)
      i += 1
    }
    new FlatCentroids(n, d, flat, cNormSq, cnMax)
  }

  /** The reference brute loop over the nested layout — the semantic ground
    * truth the specs compare both paths against.
    */
  def brute(cs: Array[Array[Float]], arr: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      val cc = cs(c)
      var s = 0.0
      var j = 0
      while (j < cc.length && s < bestD) {
        val df = arr(j) - cc(j); s += df * df; j += 1
      }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }
}
