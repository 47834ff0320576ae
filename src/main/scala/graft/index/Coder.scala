package graft.index

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** Broadcast-backed index-math columns for the hot full-table passes.
  *
  * The index artifacts (IVF centroids, PQ codebooks, PCA matrix) must NOT
  * enter the plan as literals: at the reference's own heuristic scale
  * (nlist = 200k, pcaDim 256 — training_utils.py:5-9) a
  * `typedLit` centroid array is ~400 MB serialized into every task binary.
  * Here each artifact ships once per executor as a broadcast variable and
  * the per-row math runs as a tight primitive loop — plan size O(1) in
  * nlist/m/d, and the loops (early-exit argmin, fused
  * assign+residual+encode) are faster than the equivalent boxed Catalyst
  * array-lambda chain.
  *
  * Reference semantics: nearest-centroid assignment
  * (two_level_clustering.py:11-21), residual PQ encode (Faiss IVFPQ
  * add_with_ids, train.py:112-132), ADC scan (mindb.py:417).
  */
object Coder {

  /** Named struct for the fused assign+encode kernel (field names survive
    * into the Catalyst schema, unlike a bare Tuple2's `_1`/`_2`).
    */
  final case class AssignedCode(cluster_id: Int, code: Array[Int])

  /** argmin_c ‖v − centroid_c‖² as a column (0-based id), over an
    * already-created broadcast. Caller owns the broadcast lifecycle —
    * iterative fitters must `destroy()` it after the pass collects.
    * The [[CentroidIndex]] prunes the argmin exactly (triangle
    * inequality); at small nlist it degrades to the brute loop.
    */
  def nearestCentroidCol(bc: Broadcast[CentroidIndex], vec: Column): Column = {
    val f = udf { (v: Seq[Double]) => bc.value.nearest(v.toArray) }
    f(vec)
  }

  /** One-shot convenience overload; the broadcast is cleaned up by Spark's
    * ContextCleaner once the plan is GC'd.
    */
  def nearestCentroidCol(spark: SparkSession, centroids: Array[Array[Float]],
                         vec: Column): Column =
    nearestCentroidCol(spark.sparkContext.broadcast(CentroidIndex.build(centroids)), vec)

  /** Fused assign + residual + PQ-encode in one pass over the PCA-space
    * vector: returns `struct(cluster_id int, code array<int>)`. One scan,
    * no intermediate residual column materialized.
    */
  def assignEncodeCol(spark: SparkSession, centroids: Array[Array[Float]],
                      pq: PqModel, vec: Column): Column = {
    val bcC = spark.sparkContext.broadcast(CentroidIndex.build(centroids))
    val bcB = spark.sparkContext.broadcast(pq.codebooks)
    val m = pq.m
    val subDim = pq.subDim
    val f = udf { (v: Seq[Double]) =>
      val arr = v.toArray
      val ci = bcC.value
      val cid = ci.nearest(arr)
      val cc = ci.centroids(cid)
      val cbs = bcB.value
      val codes = new Array[Int](m)
      var j = 0
      while (j < m) {
        val cb = cbs(j)
        val off = j * subDim
        var best = 0
        var bestD = Double.MaxValue
        var k = 0
        while (k < cb.length) {
          val e = cb(k)
          var s = 0.0
          var t = 0
          while (t < subDim) {
            val df = (arr(off + t) - cc(off + t)) - e(t)
            s += df * df
            t += 1
          }
          if (s < bestD) { bestD = s; best = k }
          k += 1
        }
        codes(j) = best
        j += 1
      }
      AssignedCode(cid, codes)
    }
    f(vec)
  }

  /** Assigned residual `v − centroid(argmin)` — the PQ-codebook training
    * input (Faiss IVFPQ trains PQ on residuals; train.py:112-132).
    */
  def residualCol(spark: SparkSession, centroids: Array[Array[Float]],
                  vec: Column): Column = {
    val bc = spark.sparkContext.broadcast(CentroidIndex.build(centroids))
    val f = udf { (v: Seq[Double]) =>
      val arr = v.toArray
      val cc = bc.value.centroids(bc.value.nearest(arr))
      val out = new Array[Double](arr.length)
      var i = 0
      while (i < arr.length) { out(i) = arr(i) - cc(i); i += 1 }
      out
    }
    f(vec)
  }

  /** PCA apply y = W·(x−μ) as a broadcast-backed column (the full-pass
    * projection in train/add; the d×p matrix never enters the plan).
    */
  def pcaApplyCol(spark: SparkSession, pca: PcaModel, vec: Column): Column = {
    val bc = spark.sparkContext.broadcast((pca.mean, pca.components))
    val f = udf { (v: Seq[Double]) =>
      val (mean, comps) = bc.value
      val c = new Array[Double](mean.length)
      var i = 0
      while (i < mean.length) { c(i) = v(i) - mean(i); i += 1 }
      val out = new Array[Double](comps.length)
      i = 0
      while (i < comps.length) {
        val row = comps(i)
        var s = 0.0
        var j = 0
        while (j < row.length) { s += row(j) * c(j); j += 1 }
        out(i) = s
        i += 1
      }
      out
    }
    f(vec)
  }
}
