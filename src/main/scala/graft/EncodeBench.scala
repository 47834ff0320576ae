package graft

import scala.util.Random

import graft.index.FlatCentroids

/** Single-thread micro-benchmark of the encode-stage argmin at the
  * geometry of the 35M scale run (nlist ≈ 91k, d = 64 — EVAL_r09
  * `scale_run_35m`, whose train was profiled as dominated by this exact
  * loop). Times the three semantically identical forms:
  *
  *  - `brute`: the original nested-array reference loop (the engine's
  *    pre-round-10 path),
  *  - `scalar`: [[FlatCentroids.nearestScalar]] — flat layout, early exit
  *    (the no-incubator-module executor fallback),
  *  - `simd`: [[FlatCentroids.nearest]] — the shipped path (float SIMD
  *    filter + exact double re-score).
  *
  * Historical note, measured here before the round-10 rewrite: a
  * triangle-inequality parent-pruned structure reached only 0.5× brute at
  * this geometry (annulus bound prunes ~7%, id-indirection breaks
  * locality) and was removed on that evidence.
  *
  * Prints ONE JSON line. Env: GRAFT_EB_NLIST (91008), GRAFT_EB_D (64),
  * GRAFT_EB_QUERIES (20000).
  */
object EncodeBench {
  def main(args: Array[String]): Unit = {
    val nlist = sys.env.getOrElse("GRAFT_EB_NLIST", "91008").toInt
    val d = sys.env.getOrElse("GRAFT_EB_D", "64").toInt
    val nQ = sys.env.getOrElse("GRAFT_EB_QUERIES", "20000").toInt
    val rnd = new Random(42L)

    // centroid geometry mirroring the scale run: k-means centroids of a
    // clustered-Gaussian corpus sit near the corpus's natural centers
    val numCenters = math.max(10, nlist / 2)
    val centers = Array.fill(numCenters, d)(rnd.nextGaussian().toFloat)
    val centroids = Array.tabulate(nlist) { i =>
      val c = centers(i % numCenters)
      Array.tabulate(d)(j => c(j) + 0.2f * rnd.nextGaussian().toFloat)
    }
    // queries = corpus rows (center + in-cluster noise), the encode input
    val queries = Array.fill(nQ) {
      val c = centers(rnd.nextInt(numCenters))
      Array.tabulate(d)(j => c(j).toDouble + 0.35 * rnd.nextGaussian())
    }

    val t0 = System.nanoTime()
    val fc = FlatCentroids.build(centroids)
    val buildS = (System.nanoTime() - t0) / 1e9

    def time(warm: Int, n: Int, f: Int => Int, out: Array[Int]): Double = {
      var i = 0
      while (i < warm) { f(i); i += 1 }
      val t = System.nanoTime()
      i = 0
      while (i < n) { out(i) = f(i); i += 1 }
      n / ((System.nanoTime() - t) / 1e9)
    }

    val slowN = math.min(nQ, 2000)
    val bruteOut = new Array[Int](slowN)
    val scalarOut = new Array[Int](slowN)
    val simdOut = new Array[Int](nQ)
    val bruteRows = time(100, slowN, i => FlatCentroids.brute(centroids, queries(i)), bruteOut)
    val scalarRows = time(100, slowN, i => fc.nearestScalar(queries(i)), scalarOut)
    val simdRows = time(200, nQ, i => fc.nearest(queries(i)), simdOut)

    val batchOut = new Array[Int](nQ)
    fc.nearestBatch(queries.take(256), new Array[Int](256)) // JIT warm
    val tB = System.nanoTime()
    fc.nearestBatch(queries, batchOut)
    val batchRows = nQ / ((System.nanoTime() - tB) / 1e9)

    val equal = (0 until slowN).forall(i =>
      bruteOut(i) == scalarOut(i) && bruteOut(i) == simdOut(i) &&
        bruteOut(i) == batchOut(i))
    println(s"""{"metric":"encode_argmin","nlist":$nlist,"d":$d,"queries":$nQ,""" +
      s""""simd_available":${FlatCentroids.simdAvailable},"build_sec":${f"$buildS%.2f"},""" +
      s""""brute_rows_per_sec":${f"$bruteRows%.0f"},"scalar_rows_per_sec":${f"$scalarRows%.0f"},""" +
      s""""simd_rows_per_sec":${f"$simdRows%.0f"},"batch_rows_per_sec":${f"$batchRows%.0f"},""" +
      s""""speedup_vs_brute":${f"${batchRows / bruteRows}%.1f"},"results_equal":$equal,""" +
      s""""cpu_canary_ms":${Canary.cpuCanaryMs()},""" +
      s""""kernel_canary_rows_per_sec":${Canary.kernelCanaryRowsPerSec()}}""")
  }
}
