package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.FlatCentroids

/** Bit-for-bit equivalence of both FlatCentroids paths (SIMD
  * filter+rescore, scalar flat scan) with the reference brute loop — the
  * contract the encode stage, the t12 oracle row, and the trained-path
  * replay all assume. Centroid sets include exact duplicates so
  * (dist, lowest-index) tie resolution is exercised; the query stream
  * includes centroids themselves (zero-distance ties), tiny perturbations
  * (near-ties racing the float filter's margin), and degenerate NaN/Inf
  * inputs.
  */
class FlatCentroidsSpec extends AnyFunSuite {

  private val dim = 16

  /** Clustered centroids (IVF geometry) with every 97th an exact
    * duplicate of an earlier one.
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
      if (i % 3 == 0) cs(rnd.nextInt(cs.length)).map(_.toDouble)
      else if (i % 3 == 1) {
        val c = cs(rnd.nextInt(cs.length))
        c.map(_.toDouble + rnd.nextGaussian() * 1e-4)
      } else Array.fill(dim)(rnd.nextDouble() * 12 - 6)
    }
  }

  test("SIMD path is active on this JVM (build ships --add-modules)") {
    assert(FlatCentroids.simdAvailable,
      "jdk.incubator.vector absent — scalar fallback would hide the SIMD path from every other test")
  }

  test("all paths == brute over thousands of queries, clustered + duplicates") {
    val cs = makeCentroids(4096, seed = 7L)
    val fc = FlatCentroids.build(cs)
    val qArr = queries(cs, 3000, seed = 11L).toArray
    val batchOut = new Array[Int](qArr.length)
    fc.nearestBatch(qArr, batchOut)
    qArr.zipWithIndex.foreach { case (q, i) =>
      val b = FlatCentroids.brute(cs, q)
      assert(fc.nearest(q) == b, s"query $i: simd path diverged")
      assert(fc.nearestScalar(q) == b, s"query $i: scalar path diverged")
      assert(batchOut(i) == b, s"query $i: batched tile path diverged")
    }
  }

  test("batched path: ragged final tile and degenerate lanes mixed in") {
    val cs = makeCentroids(2100, seed = 13L)
    val fc = FlatCentroids.build(cs)
    // 37 queries: not a multiple of any lane width; lane 5 is NaN, lane 20 Inf
    val qArr = queries(cs, 37, seed = 17L).toArray
    qArr(5) = Array.fill(dim)(Double.NaN)
    qArr(20) = Array.fill(dim)(Double.PositiveInfinity)
    val out = new Array[Int](qArr.length)
    fc.nearestBatch(qArr, out)
    qArr.zipWithIndex.foreach { case (q, i) =>
      assert(out(i) == FlatCentroids.brute(cs, q), s"query $i")
    }
  }

  test("small lists (engine-test nlist) also exact") {
    for (n <- Seq(1, 2, 150, 500)) {
      val cs = makeCentroids(math.max(4, n), seed = n.toLong).take(n)
      val fc = FlatCentroids.build(cs)
      queries(cs, 400, seed = n + 1L).foreach { q =>
        assert(fc.nearest(q) == FlatCentroids.brute(cs, q), s"n=$n")
      }
    }
  }

  test("degenerate NaN/Inf queries agree with brute (index 0, no throw)") {
    val cs = makeCentroids(4096, seed = 3L)
    val fc = FlatCentroids.build(cs)
    val bads = Seq(
      Array.fill(dim)(Double.NaN),
      Array.fill(dim)(Double.PositiveInfinity),
      Array.fill(dim)(Double.NegativeInfinity),
      Array.tabulate(dim)(j => if (j == 5) Double.NaN else 1.0),
      Array.tabulate(dim)(j => if (j == 0) Double.PositiveInfinity else -2.0),
      Array.fill(dim)(1e200)) // overflows the float filter, not the double loop
    bads.foreach { q =>
      val b = FlatCentroids.brute(cs, q)
      assert(fc.nearest(q) == b && fc.nearestScalar(q) == b)
    }
  }

  test("pathologically flat geometry (all centroids equidistant twins) stays exact") {
    // 4096 copies of two points: the float filter's candidate buffer
    // overflows -> exact full-scan fallback; ties resolve to index 0/1
    val a = Array.fill(dim)(1.0f)
    val b = Array.fill(dim)(-1.0f)
    val cs = Array.tabulate(4096)(i => if (i % 2 == 0) a.clone() else b.clone())
    val fc = FlatCentroids.build(cs)
    assert(fc.nearest(Array.fill(dim)(0.9)) == 0)
    assert(fc.nearest(Array.fill(dim)(-0.9)) == 1)
    assert(fc.nearest(Array.fill(dim)(0.0)) == 0) // exact tie -> lowest index
  }

  test("ragged centroid dims fail the build loudly") {
    val cs = makeCentroids(64, seed = 29L)
    cs(50) = Array(1.0f, 2.0f)
    assertThrows[IllegalArgumentException](FlatCentroids.build(cs))
  }

  // -------------------------------------------- top-k probe selection (r11)

  /** The probe-selection ground truth: full sort under the contract
    * arithmetic (FLOAT per-dim subtract/square, left-to-right double
    * accumulation) by (dist asc, id asc) — what the engine's original
    * scalar heap computed and every trained oracle replay hashes against.
    */
  private def bruteTopK(cs: Array[Array[Float]], qp: Array[Float],
                        k: Int): Seq[Int] =
    cs.zipWithIndex.map { case (c, i) =>
      var s = 0.0; var j = 0
      while (j < c.length) { val df = qp(j) - c(j); s += df * df; j += 1 }
      (s, i)
    }.sortBy(identity)(Ordering.Tuple2(Ordering.Double.TotalOrdering,
      Ordering.Int)).take(math.min(k, cs.length)).map(_._2).toSeq

  test("nearestKFloat (SIMD) and nearestKScalar == brute top-k, ties included") {
    val cs = makeCentroids(4096, seed = 31L)
    val fc = FlatCentroids.build(cs)
    val rnd = new scala.util.Random(37L)
    queries(cs, 400, seed = 41L).zipWithIndex.foreach { case (qd, i) =>
      val qp = qd.map(_.toFloat)
      val k = Seq(1, 7, 64, 500, 4096, 9999)(i % 6)
      val exp = bruteTopK(cs, qp, k)
      assert(fc.nearestKFloat(qp, k).toSeq == exp, s"query $i k=$k: SIMD top-k diverged")
      if (i % 10 == 0) // scalar heap is slow; spot-check it
        assert(fc.nearestKScalar(qp, k).toSeq == exp, s"query $i k=$k: scalar top-k diverged")
      if (i % 25 == 0) { // tie-heavy: query ON a duplicated centroid
        val dup = cs(97 * (1 + rnd.nextInt(40)))
        val qq = dup.clone()
        assert(fc.nearestKFloat(qq, 32).toSeq == bruteTopK(cs, qq, 32))
      }
    }
  }

  test("nearestKFloat degenerate inputs fall back and match the scalar heap") {
    val cs = makeCentroids(512, seed = 43L)
    val fc = FlatCentroids.build(cs)
    val bads = Seq(
      Array.fill(dim)(Float.NaN),
      Array.fill(dim)(Float.PositiveInfinity),
      Array.tabulate(dim)(j => if (j == 3) Float.NaN else 1.0f))
    bads.foreach { q =>
      assert(fc.nearestKFloat(q, 10).toSeq == fc.nearestKScalar(q, 10).toSeq)
    }
    // flat-twin geometry: every float distance ties — margin admits all,
    // exact re-score + (dist, id) sort must still match brute
    val a = Array.fill(dim)(1.0f); val b = Array.fill(dim)(-1.0f)
    val twins = Array.tabulate(1024)(i => if (i % 2 == 0) a.clone() else b.clone())
    val ft = FlatCentroids.build(twins)
    val q0 = Array.fill(dim)(0.0f)
    assert(ft.nearestKFloat(q0, 6).toSeq == bruteTopK(twins, q0, 6))
    assert(ft.nearestKFloat(Array.fill(dim)(0.9f), 5).toSeq ==
      bruteTopK(twins, Array.fill(dim)(0.9f), 5))
  }
}
