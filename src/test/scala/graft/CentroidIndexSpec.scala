package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.CentroidIndex

/** Bit-for-bit equivalence of the triangle-inequality-pruned argmin with
  * the brute scan — the property the pruning's correctness rests on, over
  * list sizes that actually take the pruned path (BruteThreshold = 2048
  * means small-nlist engine tests never do). Centroid sets include exact
  * duplicates so (dist, lowest-index) tie resolution is exercised, and the
  * query stream includes centroids themselves (zero-distance ties),
  * near-misses, and degenerate NaN/Inf inputs.
  */
class CentroidIndexSpec extends AnyFunSuite {

  private val dim = 16

  /** Clustered centroids (realistic IVF geometry — pruning actually fires)
    * with every 97th centroid an exact duplicate of another.
    */
  private def makeCentroids(n: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    val nCenters = math.max(4, n / 64)
    val centers = Array.fill(nCenters, dim)((rnd.nextDouble() * 10 - 5).toFloat)
    val cs = Array.tabulate(n) { i =>
      val c = centers(rnd.nextInt(nCenters))
      Array.tabulate(dim)(j => c(j) + (rnd.nextGaussian() * 0.3).toFloat)
    }
    var i = 97
    while (i < n) { cs(i) = cs(rnd.nextInt(i)).clone(); i += 97 }
    cs
  }

  private def queries(cs: Array[Array[Float]], count: Int, seed: Long): Iterator[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Iterator.tabulate(count) { i =>
      if (i % 3 == 0) {
        // exactly on a centroid (often a duplicated one) → 0-distance tie
        cs(rnd.nextInt(cs.length)).map(_.toDouble)
      } else if (i % 3 == 1) {
        // tiny perturbation off a centroid → close races between twins
        val c = cs(rnd.nextInt(cs.length))
        c.map(_.toDouble + rnd.nextGaussian() * 1e-4)
      } else {
        Array.fill(dim)(rnd.nextDouble() * 12 - 6)
      }
    }
  }

  test("pruned nearest == brute, thousands of queries over 4096 clustered centroids") {
    val cs = makeCentroids(4096, seed = 7L)
    val idx = CentroidIndex.build(cs)
    queries(cs, 3000, seed = 11L).zipWithIndex.foreach { case (q, i) =>
      val p = idx.nearest(q)
      val b = CentroidIndex.brute(cs, q)
      assert(p == b, s"query $i: pruned=$p brute=$b")
    }
  }

  test("equivalence at BruteThreshold-adjacent sizes (2047 brute / 2048 / 2049 pruned)") {
    for (n <- Seq(CentroidIndex.BruteThreshold - 1, CentroidIndex.BruteThreshold,
                  CentroidIndex.BruteThreshold + 1)) {
      val cs = makeCentroids(n, seed = n.toLong)
      val idx = CentroidIndex.build(cs)
      queries(cs, 800, seed = n + 1L).foreach { q =>
        assert(idx.nearest(q) == CentroidIndex.brute(cs, q), s"n=$n")
      }
    }
  }

  test("degenerate NaN/Inf queries agree with the brute loop (no -1, no throw)") {
    val cs = makeCentroids(4096, seed = 3L)
    val idx = CentroidIndex.build(cs)
    val bads = Seq(
      Array.fill(dim)(Double.NaN),
      Array.fill(dim)(Double.PositiveInfinity),
      Array.fill(dim)(Double.NegativeInfinity),
      Array.tabulate(dim)(j => if (j == 5) Double.NaN else 1.0),
      Array.tabulate(dim)(j => if (j == 0) Double.PositiveInfinity else -2.0))
    bads.foreach { q =>
      val p = idx.nearest(q)
      val b = CentroidIndex.brute(cs, q)
      assert(p == b && p >= 0, s"pruned=$p brute=$b")
    }
  }

  test("uniform (non-clustered) geometry also exact") {
    val rnd = new scala.util.Random(19L)
    val cs = Array.fill(2500, dim)((rnd.nextDouble() * 2 - 1).toFloat)
    val idx = CentroidIndex.build(cs)
    queries(cs, 1500, seed = 23L).foreach { q =>
      assert(idx.nearest(q) == CentroidIndex.brute(cs, q))
    }
  }

  test("build propagates worker failure instead of masking it") {
    val cs = makeCentroids(4096, seed = 29L)
    cs(4000) = Array(1.0f, 2.0f) // ragged dim, outside the parent-fit sample
    assertThrows[ArrayIndexOutOfBoundsException](CentroidIndex.build(cs))
  }
}
