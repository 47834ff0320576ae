package graft.index

import breeze.linalg.{svd, DenseMatrix}

/** OPQ — Optimized Product Quantization (Ge et al., CVPR 2013; the Faiss
  * OPQMatrix stage of the reference's index chain,
  * training_utils.py:34-56 `PCA{p},OPQ{m}_{o},IVF,PQ{m}`): learn an
  * orthonormal rotation+reduction R (o×p) that minimizes PQ quantization
  * error, by alternating (1) fit PQ codebooks on the rotated sample and
  * (2) solve the orthogonal Procrustes problem R = U·Vᵀ from the SVD of
  * X̂·Xᵀ (reconstructions × inputs).
  *
  * Fit is driver-local over the same 64·256-row sample PQ trains on; the
  * learned R is composed into the PCA projection matrix
  * ([[Pca.compose]]), so every downstream pass (assignment, encode, query
  * projection) stays a single mat-vec — no extra stage anywhere.
  */
object Opq {

  /** @param sample rows in PCA space (p-dim float)
    * @param outDim o — the OPQ output dimension (≤ p)
    * @param m      PQ subquantizer count (inner fits)
    * @return R, an o×p matrix with orthonormal rows
    */
  def fit(sample: Array[Array[Float]], outDim: Int, m: Int,
          outerIters: Int = 8, innerPqIters: Int = 4,
          seed: Long = 42L): Array[Array[Double]] = {
    require(sample.nonEmpty, "opq fit on empty sample")
    val p = sample(0).length
    require(outDim <= p, s"opq outDim $outDim > input dim $p")
    require(outDim % m == 0, s"opq: dim $outDim not divisible by m=$m")
    val n = sample.length

    // Learn a FULL p×p rotation with reconstructions zero-padded to p
    // dims (the Faiss OPQMatrix treatment of d_out < d_in): ‖R·x‖ is then
    // invariant in R, so the orthogonal-Procrustes update R = U·Vᵀ is the
    // exact minimizer, and the alternation pushes quantizable structure
    // into the kept dims while dropped-dim energy counts in the objective.
    // Init = identity: input is already PCA'd (energy-sorted).
    var rFull = Array.tabulate(p)(i =>
      Array.tabulate(p)(j => if (i == j) 1.0 else 0.0))

    for (_ <- 0 until outerIters) {
      val rTop = rFull.take(outDim)
      // (1) project to the kept dims, fit PQ there
      val y = sample.map(x => applyR(rTop, x))
      val pq = ProductQuantizer.fit(y, m, iters = innerPqIters, seed = seed)
      // (2) Procrustes on padded reconstructions: M = Σ x̂ᵢ_pad·xᵢᵀ (p×p,
      // rows ≥ outDim are zero) → R = U·Vᵀ from M's SVD
      val mMat = DenseMatrix.zeros[Double](p, p)
      var i = 0
      while (i < n) {
        val xhat = pq.decode(pq.encodeLocal(y(i)))
        val x = sample(i)
        var a = 0
        while (a < outDim) {
          val xa = xhat(a).toDouble
          var b = 0
          while (b < p) { mMat(a, b) += xa * x(b); b += 1 }
          a += 1
        }
        i += 1
      }
      val svd.SVD(u, _, vt) = svd.reduced(mMat)
      val newR = Array.ofDim[Double](p, p)
      var a = 0
      while (a < p) {
        var b = 0
        while (b < p) {
          var s = 0.0
          var k = 0
          while (k < p) { s += u(a, k) * vt(k, b); k += 1 }
          newR(a)(b) = s
          b += 1
        }
        a += 1
      }
      rFull = newR
    }
    rFull.take(outDim)
  }

  /** Mean TOTAL squared reconstruction error of `sample` under rotation
    * `r` (the OPQ objective): kept-dim PQ quantization error plus the
    * energy lost in the dropped dims (‖x‖² − ‖R_top·x‖², since R_full is
    * orthonormal). Diagnostics/tests.
    */
  def quantizationError(sample: Array[Array[Float]], r: Array[Array[Double]],
                        m: Int, pqIters: Int = 4, seed: Long = 42L): Double = {
    val y = sample.map(x => applyR(r, x))
    val pq = ProductQuantizer.fit(y, m, iters = pqIters, seed = seed)
    var err = 0.0
    var i = 0
    while (i < sample.length) {
      val v = y(i)
      val xhat = pq.decode(pq.encodeLocal(v))
      var kept = 0.0
      var yNorm = 0.0
      var j = 0
      while (j < v.length) {
        val d = v(j) - xhat(j); kept += d * d
        yNorm += v(j).toDouble * v(j); j += 1
      }
      var xNorm = 0.0
      val x = sample(i)
      j = 0
      while (j < x.length) { xNorm += x(j).toDouble * x(j); j += 1 }
      err += kept + (xNorm - yNorm)
      i += 1
    }
    err / sample.length
  }

  private def applyR(r: Array[Array[Double]], x: Array[Float]): Array[Float] = {
    val out = new Array[Float](r.length)
    var i = 0
    while (i < r.length) {
      val row = r(i)
      var s = 0.0
      var j = 0
      while (j < row.length) { s += row(j) * x(j); j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    out
  }
}
