package graft.index

/** Exact nearest-centroid search with triangle-inequality pruning.
  *
  * The encode stage visits every row of the corpus and runs
  * `argmin_c ‖v − centroid_c‖` over the full IVF list. At the reference's
  * tested ceiling (35M vectors, nlist ≈ 91k — README.md:64 +
  * training_utils.py:5-9 heuristic) that brute-force argmin is the train
  * bottleneck: profiled at 9,042 s dominated by `Coder.nearest`
  * (EVAL_r09 `scale_run_35m` jstack evidence). This index prunes it
  * WITHOUT changing a single result:
  *
  *  - group the nlist centroids under kP ≈ √nlist parents (a seeded local
  *    k-means over the centroids themselves — quality only affects speed,
  *    never results);
  *  - per query x, compute the kP parent distances, then visit parents in
  *    ascending d(x,p) order; within a parent, children are sorted by
  *    d(p,c), so only the annulus |d(x,p) − d(p,c)| ≤ best survives the
  *    triangle inequality d(x,c) ≥ |d(x,p) − d(p,c)|;
  *  - a child that survives the bound is scored with the SAME left-to-right
  *    double summation as the brute loop, and ties resolve to the LOWEST
  *    centroid index — bit-for-bit the brute-force (and the DuckDB oracle's
  *    `list_position(dl, list_min(dl))`) semantics. Bounds carry a relative
  *    epsilon several orders above double rounding error so floating-point
  *    slack can only ADMIT extra candidates, never wrongly prune one.
  *
  * Expected visit count per query: kP parents + a few annuli of ~n/kP
  * children — O(√n·d) against the brute O(n·d). Below [[CentroidIndex
  * .BruteThreshold]] the structure is skipped entirely (build cost would
  * exceed the savings) and `nearest` IS the brute loop.
  *
  * The whole structure is deterministic from the centroid array (seeded
  * parent fit, lowest-index tie-breaks), cheap relative to one full-data
  * pass (one k-means over nlist points + one nlist×kP assignment,
  * parallelized across cores), and ships to executors as ONE broadcast.
  */
final class CentroidIndex private (
    val centroids: Array[Array[Float]],
    parents: Array[Array[Float]],          // null => brute fallback
    childIds: Array[Array[Int]],           // per parent, sorted by (dist, id)
    childDists: Array[Array[Double]],      // d(parent, child), same order
    maxRadius: Array[Double],              // per parent max child dist
    globalMaxRadius: Double) extends Serializable {

  /** Exact argmin over the centroid list; identical result (including
    * lowest-index tie resolution) to the brute-force scan.
    */
  def nearest(arr: Array[Double]): Int = {
    if (parents == null) return CentroidIndex.brute(centroids, arr)
    val kP = parents.length
    val pd = new Array[Double](kP)
    var p = 0
    while (p < kP) { pd(p) = math.sqrt(CentroidIndex.distSq(arr, parents(p))); p += 1 }
    // ascending-parent-distance visit order (kP is ~√n, a few hundred)
    val order = CentroidIndex.sortedIndices(pd)

    var bestIdx = -1
    var bestDSq = Double.MaxValue
    var bestDist = Double.MaxValue
    var oi = 0
    while (oi < kP) {
      val pi = order(oi)
      val dp = pd(pi)
      // parents are visited in ascending dp: once even the loosest child
      // bound over ALL remaining parents exceeds best, stop
      if (bestDist < Double.MaxValue &&
          dp - globalMaxRadius > bestDist + CentroidIndex.eps(dp, globalMaxRadius, bestDist)) {
        oi = kP
      } else {
        if (!(bestDist < Double.MaxValue) ||
            dp - maxRadius(pi) <= bestDist + CentroidIndex.eps(dp, maxRadius(pi), bestDist)) {
          val ids = childIds(pi)
          val dists = childDists(pi)
          // entry point: first child whose d(p,c) could fall in the annulus
          var lo =
            if (bestDist < Double.MaxValue)
              CentroidIndex.lowerBound(dists, dp - bestDist - CentroidIndex.eps(dp, bestDist, 0.0))
            else 0
          var continue = true
          while (continue && lo < ids.length) {
            val dpc = dists(lo)
            val slack = CentroidIndex.eps(dp, dpc, bestDist)
            if (dpc > dp + bestDist + slack && bestDist < Double.MaxValue) {
              continue = false // children only get farther from p
            } else {
              if (math.abs(dp - dpc) <= bestDist + slack || !(bestDist < Double.MaxValue)) {
                val ci = ids(lo)
                val cc = centroids(ci)
                val d = cc.length
                var s = 0.0
                var j = 0
                // same summation order as the brute loop; exit once the
                // partial sum can no longer win OR tie-win
                while (j < d && s <= bestDSq) {
                  val df = arr(j) - cc(j); s += df * df; j += 1
                }
                if (j == d && (s < bestDSq || (s == bestDSq && (bestIdx < 0 || ci < bestIdx)))) {
                  bestDSq = s
                  bestIdx = ci
                  bestDist = math.sqrt(s)
                }
              }
              lo += 1
            }
          }
        }
        oi += 1
      }
    }
    // Degenerate queries (NaN/Inf components) fail every partial-sum
    // acceptance, so no candidate ever lands: fall back to the brute loop
    // so pruned and brute paths agree (brute returns 0 for such inputs).
    if (bestIdx < 0) CentroidIndex.brute(centroids, arr) else bestIdx
  }

  /** Number of centroids indexed. */
  def size: Int = centroids.length
}

object CentroidIndex {

  /** Below this list size the brute scan wins — no parent structure. */
  val BruteThreshold = 2048

  /** Relative slack added to every triangle-inequality bound: ~1e-9 of the
    * magnitudes involved, vs double summation error of ~1e-13 relative —
    * wide enough that rounding can only admit extra candidates (which the
    * exact re-score then rejects), never prune a true winner.
    */
  private def eps(a: Double, b: Double, c: Double): Double = {
    val cc = if (c < Double.MaxValue) c else 0.0
    1e-9 * (a + b + cc + 1.0)
  }

  def build(centroids: Array[Array[Float]]): CentroidIndex = {
    val n = centroids.length
    require(n > 0, "CentroidIndex over empty centroid list")
    if (n < BruteThreshold)
      return new CentroidIndex(centroids, null, null, null, null, 0.0)

    val kP = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
    // deterministic stride sample for the parent fit (the fit's quality
    // only moves the prune rate, so a modest sample + few iters suffice)
    val sampleN = math.min(n, 32 * kP)
    val stride = math.max(1, n / sampleN)
    val sample = Array.tabulate(math.min(sampleN, (n + stride - 1) / stride))(i => centroids(i * stride))
    val parents = LocalKMeans.fit(sample, kP, iters = 6, seed = 42L)

    // assign every centroid to its nearest parent (parallel across cores;
    // per-centroid independent, lowest-index ties — deterministic)
    val assign = new Array[Int](n)
    val threads = math.max(1, Runtime.getRuntime.availableProcessors())
    val chunk = (n + threads - 1) / threads
    // a worker failure (e.g. ragged centroid dims) must fail the build,
    // not silently leave its chunk assigned to parent 0
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val workers = (0 until threads).map { t =>
      val from = t * chunk
      val until = math.min(n, from + chunk)
      new Thread(() => {
        try {
          var i = from
          while (i < until) {
            assign(i) = bruteF(parents, centroids(i))
            i += 1
          }
        } catch { case e: Throwable => failure.compareAndSet(null, e) }
      })
    }
    workers.foreach(_.start()); workers.foreach(_.join())
    if (failure.get() != null) throw failure.get()

    val groups = Array.fill(kP)(scala.collection.mutable.ArrayBuffer.empty[(Double, Int)])
    var i = 0
    while (i < n) {
      val p = assign(i)
      groups(p) += ((math.sqrt(distSqF(parents(p), centroids(i))), i))
      i += 1
    }
    val childIds = new Array[Array[Int]](kP)
    val childDists = new Array[Array[Double]](kP)
    val maxR = new Array[Double](kP)
    var p = 0
    var gMax = 0.0
    while (p < kP) {
      val sorted = groups(p).sortBy(t => (t._1, t._2)).toArray
      childIds(p) = sorted.map(_._2)
      childDists(p) = sorted.map(_._1)
      maxR(p) = if (sorted.isEmpty) 0.0 else sorted.last._1
      if (maxR(p) > gMax) gMax = maxR(p)
      p += 1
    }
    new CentroidIndex(centroids, parents, childIds, childDists, maxR, gMax)
  }

  /** The reference brute loop (early-exit partial sums, first-lowest-index
    * wins) — the semantics [[CentroidIndex.nearest]] reproduces exactly.
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

  private def bruteF(cs: Array[Array[Float]], v: Array[Float]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      val cc = cs(c)
      var s = 0.0
      var j = 0
      while (j < cc.length && s < bestD) {
        val df = v(j).toDouble - cc(j); s += df * df; j += 1
      }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  private def distSq(arr: Array[Double], c: Array[Float]): Double = {
    var s = 0.0
    var j = 0
    while (j < c.length) { val df = arr(j) - c(j); s += df * df; j += 1 }
    s
  }

  private def distSqF(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var j = 0
    while (j < a.length) { val df = a(j).toDouble - b(j); s += df * df; j += 1 }
    s
  }

  /** First index with `a(idx) >= key` (a is ascending). */
  private def lowerBound(a: Array[Double], key: Double): Int = {
    var lo = 0
    var hi = a.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a(mid) < key) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Indices of `a` in ascending (value, index) order. EXACT ordering is
    * load-bearing: the visit loop's global early-stop assumes every
    * remaining parent has dp ≥ the current one. O(kP log kP) — the
    * insertion-sort predecessor was O(kP²), which at nlist ≈ 1M
    * (kP ≈ 1000) rivaled the parent-distance pass itself.
    */
  private def sortedIndices(a: Array[Double]): Array[Int] = {
    val boxed = new Array[Integer](a.length)
    var i = 0
    while (i < boxed.length) { boxed(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(boxed, (x: Integer, y: Integer) => {
      val c = java.lang.Double.compare(a(x.intValue), a(y.intValue))
      if (c != 0) c else Integer.compare(x.intValue, y.intValue)
    })
    val idx = new Array[Int](a.length)
    i = 0
    while (i < idx.length) { idx(i) = boxed(i).intValue; i += 1 }
    idx
  }
}
