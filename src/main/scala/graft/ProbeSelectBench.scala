package graft

import scala.util.Random

import graft.index.FlatCentroids

/** Single-thread micro-benchmark of PROBE SELECTION (Q2's top-nprobe
  * nearest centroids, run on the driver once per query) at the 100M
  * heuristic ceiling — nlist 200,000 (training_utils.py:5-9 for n = 100M),
  * PCA dim 256, nprobe 6,000 — where VERDICT r10 flagged the scalar
  * O(nlist·p) loop as a contributor to the 516 ms prepared p50.
  *
  * Times the original bounded-heap scalar loop
  * ([[FlatCentroids.nearestKScalar]], the engine's pre-r11 path) against
  * the SIMD distance-pass + margin re-score ([[FlatCentroids
  * .nearestKFloat]], the shipped path) and asserts the probe lists are
  * identical. Prints ONE JSON line. Env: GRAFT_PSB_NLIST (200000),
  * GRAFT_PSB_D (256), GRAFT_PSB_NPROBE (6000), GRAFT_PSB_QUERIES (50).
  */
object ProbeSelectBench {
  def main(args: Array[String]): Unit = {
    val nlist = sys.env.getOrElse("GRAFT_PSB_NLIST", "200000").toInt
    val d = sys.env.getOrElse("GRAFT_PSB_D", "256").toInt
    val nprobe = sys.env.getOrElse("GRAFT_PSB_NPROBE", "6000").toInt
    val nQ = sys.env.getOrElse("GRAFT_PSB_QUERIES", "50").toInt
    val rnd = new Random(42L)

    val numCenters = math.max(10, nlist / 2)
    val centers = Array.fill(numCenters, d)(rnd.nextGaussian().toFloat)
    val centroids = Array.tabulate(nlist) { i =>
      val c = centers(i % numCenters)
      Array.tabulate(d)(j => c(j) + 0.2f * rnd.nextGaussian().toFloat)
    }
    val queries = Array.fill(nQ) {
      val c = centers(rnd.nextInt(numCenters))
      Array.tabulate(d)(j => c(j) + 0.35f * rnd.nextGaussian().toFloat)
    }
    val fc = FlatCentroids.build(centroids)

    def time(n: Int, warm: Int, f: Int => Array[Int]): (Double, Array[Array[Int]]) = {
      var i = 0
      while (i < warm) { f(i % n); i += 1 }
      val out = new Array[Array[Int]](n)
      val t = System.nanoTime()
      i = 0
      while (i < n) { out(i) = f(i); i += 1 }
      ((System.nanoTime() - t) / 1e6 / n, out)
    }

    val scalarN = math.min(nQ, 10) // the slow side: a few reps suffice
    val (scalarMs, scalarOut) = time(scalarN, 2, i => fc.nearestKScalar(queries(i), nprobe))
    val (simdMs, simdOut) = time(nQ, 5, i => fc.nearestKFloat(queries(i), nprobe))
    val equal = (0 until scalarN).forall(i => scalarOut(i).sameElements(simdOut(i)))

    println(s"""{"metric":"probe_select","nlist":$nlist,"d":$d,"nprobe":$nprobe,""" +
      s""""queries":$nQ,"simd_available":${FlatCentroids.simdAvailable},""" +
      s""""scalar_ms_per_query":${f"$scalarMs%.2f"},"simd_ms_per_query":${f"$simdMs%.2f"},""" +
      s""""speedup":${f"${scalarMs / simdMs}%.1f"},"probe_lists_equal":$equal,""" +
      s""""cpu_canary_ms":${Canary.cpuCanaryMs()},""" +
      s""""kernel_canary_rows_per_sec":${Canary.kernelCanaryRowsPerSec()}}""")
  }
}
