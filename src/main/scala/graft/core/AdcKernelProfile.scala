package graft.core

import java.util.Random

import graft.core.Engine.IndexModel
import graft.index.{PcaModel, PqModel}
import graft.operators.PreparedANN
import graft.operators.PreparedANN.ClusterBlock

/** Microbench attributing the prepared ADC scan's per-row cost at the
  * 35M serving geometry (nlist 91,008 / nprobe 3,561 / ~385 rows per
  * probed cluster / prelimK 500): scaleeval_35m_r18g/h measured
  * ~163–167 ms of task occupancy per query ≈ 120 ns/row, which is far
  * above the ~20–30 ns a bounded scalar fused loop should cost — this
  * main separates the product kernel's cost into layers so the next
  * kernel decision (SIMD/LUT with FP reordering + a regrouped oracle,
  * vs structural fixes that keep bit-identity) is measured, not
  * guessed.
  *
  * Variants (each timed over the same synthetic blocks, min of reps):
  *  - `product`:   [[PreparedANN.servePartition]] verbatim — the real
  *                 serving cost including heap + rerank of survivors.
  *  - `scan`:      the fused per-block-bounded loop with a FIXED bound
  *                 and no heap — pure scan arithmetic + branch shape.
  *  - `scan_full`: no early exit (all m blocks every row) — what the
  *                 exit saves.
  *  - `lut`:       per-cluster ADC lookup table (m·256·subDim build,
  *                 then m lookups+adds per row) — FP-REORDERED, NOT
  *                 bit-identical; diagnostic for what the classic LUT
  *                 form would buy at this rows-per-cluster geometry.
  *
  * Synthetic data, fixed seed; results are only for RELATIVE
  * attribution on this box (bracketed by the kernel canary).
  */
object AdcKernelProfile {

  def main(args: Array[String]): Unit = {
    val nClusters = sys.env.getOrElse("GRAFT_AKP_CLUSTERS", "3561").toInt
    val rowsPer = sys.env.getOrElse("GRAFT_AKP_ROWS", "385").toInt
    val d = sys.env.getOrElse("GRAFT_AKP_D", "64").toInt
    val m = sys.env.getOrElse("GRAFT_AKP_M", "8").toInt
    val prelimK = sys.env.getOrElse("GRAFT_AKP_PRELIMK", "500").toInt
    val reps = sys.env.getOrElse("GRAFT_AKP_REPS", "5").toInt
    val subDim = d / m
    val rnd = new Random(17)

    val centroids = Array.fill(nClusters)(Array.fill(d)(rnd.nextFloat()))
    val codebooks = Array.fill(m, 256, subDim)((rnd.nextFloat() - 0.5f) * 0.1f)
    val model = IndexModel(graft.index.Pca.identity(d), centroids,
      PqModel(m, subDim, codebooks))
    val blocks: Map[Int, ClusterBlock] = (0 until nClusters).map { cid =>
      val ids = Array.tabulate(rowsPer)(r => cid.toLong * rowsPer + r)
      val codes = new Array[Byte](rowsPer * m)
      rnd.nextBytes(codes)
      val vecs = Array.fill(rowsPer * d)(rnd.nextFloat())
      cid -> new ClusterBlock(ids, codes, vecs, new Array[String](rowsPer))
    }.toMap
    val probes = (0 until nClusters).toArray
    val qp = Array.fill(d)(rnd.nextFloat())
    val totalRows = nClusters.toLong * rowsPer

    def bestOf(body: => Unit): Double = {
      var best = Double.MaxValue
      var r = 0
      while (r < reps) {
        val t0 = System.nanoTime()
        body
        best = math.min(best, (System.nanoTime() - t0) / 1e6)
        r += 1
      }
      best
    }

    // warm every path once before timing
    PreparedANN.servePartition(blocks, model, probes, qp, qp, prelimK,
      Array.emptyLongArray)

    val productMs = bestOf {
      PreparedANN.servePartition(blocks, model, probes, qp, qp, prelimK,
        Array.emptyLongArray)
    }

    // fixed bound ≈ the product run's admit threshold so the scan
    // variants early-exit at a realistic rate
    val survivors = PreparedANN.servePartition(blocks, model, probes, qp, qp,
      prelimK, Array.emptyLongArray)
    val bound = survivors.map(_.adcDist).max
    @volatile var sink = 0L

    def scanVariant(earlyExit: Boolean): Double = bestOf {
      var kept = 0L
      var pi = 0
      while (pi < probes.length) {
        val blk = blocks(probes(pi))
        val cc = centroids(probes(pi))
        val n = blk.size
        var row = 0
        while (row < n) {
          val base = row * m
          var dist = 0.0
          var j = 0
          while (j < m && (!earlyExit || dist <= bound)) {
            val cb = codebooks(j)(blk.codes(base + j) & 0xFF)
            val off = j * subDim
            var t = 0
            while (t < subDim) {
              val df = qp(off + t) - (cc(off + t).toDouble + cb(t))
              dist += df * df
              t += 1
            }
            j += 1
          }
          if (dist <= bound) kept += 1
          row += 1
        }
        pi += 1
      }
      sink = kept
    }
    val scanMs = scanVariant(earlyExit = true)
    val scanFullMs = scanVariant(earlyExit = false)

    // LUT diagnostic (FP-reordered — NOT the product grouping): build
    // the per-cluster table once, then m lookups + adds per row
    val lut = new Array[Double](m * 256)
    val lutMs = bestOf {
      var kept = 0L
      var pi = 0
      while (pi < probes.length) {
        val blk = blocks(probes(pi))
        val cc = centroids(probes(pi))
        var j = 0
        while (j < m) {
          val off = j * subDim
          var e = 0
          while (e < 256) {
            val cb = codebooks(j)(e)
            var s = 0.0
            var t = 0
            while (t < subDim) {
              val df = qp(off + t) - (cc(off + t).toDouble + cb(t))
              s += df * df
              t += 1
            }
            lut(j * 256 + e) = s
            e += 1
          }
          j += 1
        }
        val n = blk.size
        var row = 0
        while (row < n) {
          val base = row * m
          var dist = 0.0
          var jj = 0
          while (jj < m && dist <= bound) {
            dist += lut(jj * 256 + (blk.codes(base + jj) & 0xFF))
            jj += 1
          }
          if (dist <= bound) kept += 1
          row += 1
        }
        pi += 1
      }
      sink = kept
    }

    // pairwise-tree grouping (DETERMINISTIC, hardware-independent):
    // partial_j = ((s0+s1)+(s2+s3)) + ((s4+s5)+(s6+s7)) — breaks the
    // 8-deep serial FP-add chain into depth 3; would need the oracle's
    // adc CTE regrouped the same way (NOT bit-identical to today's
    // sequential fold)
    val scanTreeMs = if (subDim != 8) -1.0 else bestOf {
      var kept = 0L
      var pi = 0
      while (pi < probes.length) {
        val blk = blocks(probes(pi))
        val cc = centroids(probes(pi))
        val n = blk.size
        var row = 0
        while (row < n) {
          val base = row * m
          var dist = 0.0
          var j = 0
          while (j < m && dist <= bound) {
            val cb = codebooks(j)(blk.codes(base + j) & 0xFF)
            val off = j * subDim
            val d0 = qp(off) - (cc(off).toDouble + cb(0))
            val d1 = qp(off + 1) - (cc(off + 1).toDouble + cb(1))
            val d2 = qp(off + 2) - (cc(off + 2).toDouble + cb(2))
            val d3 = qp(off + 3) - (cc(off + 3).toDouble + cb(3))
            val d4 = qp(off + 4) - (cc(off + 4).toDouble + cb(4))
            val d5 = qp(off + 5) - (cc(off + 5).toDouble + cb(5))
            val d6 = qp(off + 6) - (cc(off + 6).toDouble + cb(6))
            val d7 = qp(off + 7) - (cc(off + 7).toDouble + cb(7))
            dist += ((d0 * d0 + d1 * d1) + (d2 * d2 + d3 * d3)) +
              ((d4 * d4 + d5 * d5) + (d6 * d6 + d7 * d7))
            j += 1
          }
          if (dist <= bound) kept += 1
          row += 1
        }
        pi += 1
      }
      sink = kept
    }

    // SIMD variant: lanewise sub/mul are bit-exact per element; the
    // lane sum uses reduceLanes(ADD) here purely as a SPEED diagnostic
    // (its grouping is implementation-defined — a product version would
    // extract lanes and apply the explicit tree above)
    import jdk.incubator.vector._
    val FSP = FloatVector.SPECIES_256
    val DSP = DoubleVector.SPECIES_512
    val scanSimdMs = if (subDim != 8) -1.0 else bestOf {
      var kept = 0L
      var pi = 0
      while (pi < probes.length) {
        val blk = blocks(probes(pi))
        val cc = centroids(probes(pi))
        val n = blk.size
        var row = 0
        while (row < n) {
          val base = row * m
          var dist = 0.0
          var j = 0
          while (j < m && dist <= bound) {
            val cb = codebooks(j)(blk.codes(base + j) & 0xFF)
            val off = j * subDim
            val qv = FloatVector.fromArray(FSP, qp, off)
              .convertShape(VectorOperators.F2D, DSP, 0)
              .asInstanceOf[DoubleVector]
            val cv = FloatVector.fromArray(FSP, cc, off)
              .convertShape(VectorOperators.F2D, DSP, 0)
              .asInstanceOf[DoubleVector]
            val bv = FloatVector.fromArray(FSP, cb, 0)
              .convertShape(VectorOperators.F2D, DSP, 0)
              .asInstanceOf[DoubleVector]
            val df = qv.sub(cv.add(bv))
            dist += df.mul(df).reduceLanes(VectorOperators.ADD)
            j += 1
          }
          if (dist <= bound) kept += 1
          row += 1
        }
        pi += 1
      }
      sink = kept
    }

    def nsPerRow(ms: Double): Double =
      math.rint(ms * 1e6 / totalRows * 10) / 10
    println(
      s"""{"clusters":$nClusters,"rows_per_cluster":$rowsPer,"d":$d,"m":$m,""" +
        s""""prelim_k":$prelimK,"total_rows":$totalRows,""" +
        s""""product_ms":${"%.1f".format(productMs)},""" +
        s""""product_ns_per_row":${nsPerRow(productMs)},""" +
        s""""scan_ms":${"%.1f".format(scanMs)},""" +
        s""""scan_ns_per_row":${nsPerRow(scanMs)},""" +
        s""""scan_full_ms":${"%.1f".format(scanFullMs)},""" +
        s""""scan_full_ns_per_row":${nsPerRow(scanFullMs)},""" +
        s""""lut_ms":${"%.1f".format(lutMs)},""" +
        s""""lut_ns_per_row":${nsPerRow(lutMs)},""" +
        s""""scan_tree_ms":${"%.1f".format(scanTreeMs)},""" +
        s""""scan_tree_ns_per_row":${nsPerRow(scanTreeMs)},""" +
        s""""scan_simd_ms":${"%.1f".format(scanSimdMs)},""" +
        s""""scan_simd_ns_per_row":${nsPerRow(scanSimdMs)},""" +
        s""""sink":$sink,""" +
        s""""cpu_canary_ms":${graft.Canary.cpuCanaryMs()},""" +
        s""""kernel_canary_rows_per_sec":${graft.Canary.kernelCanaryRowsPerSec()}}""")
  }
}
