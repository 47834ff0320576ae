package graft.index

import breeze.linalg.{eigSym, DenseMatrix, DenseVector}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** PCA dimensionality reduction (reference T10: the Faiss PCAMatrix stage
  * of the index chain, two_level_clustering.py:119-140 — fit on a random
  * sample of 100·d vectors, then chain-applied to every vector).
  *
  * Fit is driver-local over a Spark-sampled matrix (O(sample·d + d²)
  * memory, d ≤ a few thousand — the same driver-sized footprint the
  * reference uses). Apply is a pure Catalyst projection: the projection
  * matrix enters the plan as a literal and each output component is a
  * codegen'd dot product — no UDF, no shuffle, scales with the scan.
  */
final case class PcaModel(mean: Array[Double], components: Array[Array[Double]]) {

  def outputDim: Int = components.length

  /** True for the no-reduction model (pcaDim == d): apply is a plain cast,
    * not a matmul. Detected structurally so it survives IndexStore round-trips.
    */
  lazy val isIdentity: Boolean =
    components.length == mean.length &&
      mean.forall(_ == 0.0) &&
      components.zipWithIndex.forall { case (row, i) =>
        row.zipWithIndex.forall { case (x, j) => x == (if (i == j) 1.0 else 0.0) }
      }

  /** Driver-side apply for query vectors (O(d·p), no Spark job); the
    * full-pass column form is Coder.pcaApplyCol (broadcast, not literal).
    */
  def applyLocal(x: Array[Float]): Array[Float] = {
    val c = new Array[Double](mean.length)
    var i = 0
    while (i < mean.length) { c(i) = x(i) - mean(i); i += 1 }
    components.map { row =>
      var s = 0.0; var j = 0
      while (j < row.length) { s += row(j) * c(j); j += 1 }
      s.toFloat
    }
  }
}

object Pca {

  /** Compose a learned OPQ rotation R (o×p) onto a PCA model W (p×d):
    * z = R·W·(x−μ) — one effective projection matrix, so the whole
    * PCA→OPQ chain stays a single mat-vec everywhere downstream (and
    * IndexStore round-trips it with no new artifact).
    */
  def compose(base: PcaModel, r: Array[Array[Double]]): PcaModel = {
    val w = base.components // p×d
    val o = r.length
    val dIn = if (w.isEmpty) 0 else w(0).length
    val composed = Array.ofDim[Double](o, dIn)
    var a = 0
    while (a < o) {
      var b = 0
      while (b < dIn) {
        var s = 0.0
        var k = 0
        while (k < w.length) { s += r(a)(k) * w(k)(b); k += 1 }
        composed(a)(b) = s
        b += 1
      }
      a += 1
    }
    PcaModel(base.mean, composed)
  }

  /** Identity model (pcaDim == d and no reduction wanted). */
  def identity(d: Int): PcaModel =
    PcaModel(new Array[Double](d), Array.tabulate(d)(i =>
      Array.tabulate(d)(j => if (i == j) 1.0 else 0.0)))

  /** Fit on ~`sampleSize` rows sampled from `df` (reference uses 100·d).
    * One cheap `sample()` pass — never a global sort-by-rand. `totalRows`
    * sizes the fraction without an extra count when the caller knows it.
    */
  def fit(df: DataFrame, vecCol: String, d: Int, outDim: Int,
          sampleSize: Int, seed: Long = 42L, totalRows: Long = -1L): PcaModel = {
    val n = if (totalRows > 0) totalRows else df.count()
    val frac = math.min(1.0, sampleSize * 1.1 / math.max(1L, n))
    val rows = df.select(vecCol)
      .sample(withReplacement = false, frac, seed)
      .limit(sampleSize)
      .collect().map(_.getSeq[Float](0).toArray)
    fitLocal(rows, outDim)
  }

  /** Eigendecomposition of the sample covariance; components sorted by
    * descending eigenvalue. Deterministic.
    */
  def fitLocal(rows: Array[Array[Float]], outDim: Int): PcaModel = {
    val n = rows.length
    val d = rows(0).length
    require(outDim <= d, s"pca outDim $outDim > input dim $d")
    val mean = new Array[Double](d)
    rows.foreach { r => var j = 0; while (j < d) { mean(j) += r(j); j += 1 } }
    var j = 0
    while (j < d) { mean(j) /= n; j += 1 }

    val m = DenseMatrix.zeros[Double](n, d)
    var i = 0
    while (i < n) {
      j = 0
      while (j < d) { m(i, j) = rows(i)(j) - mean(j); j += 1 }
      i += 1
    }
    val cov = (m.t * m) /:/ math.max(n - 1, 1).toDouble
    val es = eigSym(cov)
    // eigSym returns ascending eigenvalues; take the top outDim, descending
    val order = es.eigenvalues.toArray.zipWithIndex.sortBy(-_._1).map(_._2).take(outDim)
    val comps = order.map { c =>
      val v: DenseVector[Double] = es.eigenvectors(::, c)
      v.toArray
    }
    PcaModel(mean, comps)
  }
}
