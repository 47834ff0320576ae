package graft.index

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types.{ArrayType, IntegerType}

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
    * [[FlatCentroids]] runs the exact argmin on its SIMD path where the
    * JVM has `jdk.incubator.vector`, scalar flat scan otherwise.
    */
  def nearestCentroidCol(bc: Broadcast[FlatCentroids], vec: Column): Column = {
    val f = udf { (v: Seq[Double]) => bc.value.nearest(v.toArray) }
    f(vec)
  }

  /** One-shot convenience overload; the broadcast is cleaned up by Spark's
    * ContextCleaner once the plan is GC'd.
    */
  def nearestCentroidCol(spark: SparkSession, centroids: Array[Array[Float]],
                         vec: Column): Column =
    nearestCentroidCol(spark.sparkContext.broadcast(FlatCentroids.build(centroids)), vec)

  /** Rows buffered per [[FlatCentroids.nearestBatch]] call in the batched
    * passes — enough to fill many SIMD tiles, small enough that a chunk of
    * rows (ids + vectors + metadata) is trivially bounded in memory.
    */
  private val BatchRows = 1024

  /** Appends `outCol` = exact nearest-centroid id, computed BATCHED: rows
    * stream through `mapPartitions` in [[BatchRows]] chunks so the SIMD
    * tile kernel gets one query per vector lane instead of a per-row UDF
    * call (the per-row path pays a lane reduction per centroid — measured
    * 5× slower at nlist 91k). Results are identical to
    * [[nearestCentroidCol]]; all other columns pass through untouched.
    */
  def withNearestBatched(df: DataFrame, vecCol: String, outCol: String,
                         bc: Broadcast[FlatCentroids]): DataFrame = {
    val vecIdx = df.schema.fieldIndex(vecCol)
    val outSchema = df.schema.add(outCol, IntegerType, nullable = false)
    df.mapPartitions { rows =>
      rows.grouped(BatchRows).flatMap { chunk =>
        val qs = chunk.iterator.map(_.getSeq[Double](vecIdx).toArray).toArray
        val out = new Array[Int](qs.length)
        bc.value.nearestBatch(qs, out)
        chunk.iterator.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ out(i))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Batched fused assign + residual + PQ-encode: appends `cluster_id` and
    * `code` in one `mapPartitions` pass. The argmin runs on the SIMD tile
    * kernel (the full-corpus encode bottleneck at 35M×91k); the per-row PQ
    * code (m·256·subDim flops — ~2 orders smaller) stays scalar. Same
    * results as the [[assignEncodeCol]] column form.
    */
  def assignEncodeBatched(df: DataFrame, vecCol: String,
                          centroids: Array[Array[Float]], pq: PqModel): DataFrame = {
    val spark = df.sparkSession
    val bcC = spark.sparkContext.broadcast(FlatCentroids.build(centroids))
    val bcB = spark.sparkContext.broadcast(pq.codebooks)
    val m = pq.m
    val subDim = pq.subDim
    val vecIdx = df.schema.fieldIndex(vecCol)
    val outSchema = df.schema
      .add("cluster_id", IntegerType, nullable = false)
      .add("code", ArrayType(IntegerType, containsNull = false), nullable = false)
    df.mapPartitions { rows =>
      rows.grouped(BatchRows).flatMap { chunk =>
        val ci = bcC.value
        val cbs = bcB.value
        val qs = chunk.iterator.map(_.getSeq[Double](vecIdx).toArray).toArray
        val cids = new Array[Int](qs.length)
        ci.nearestBatch(qs, cids)
        chunk.iterator.zipWithIndex.map { case (r, i) =>
          val arr = qs(i)
          val base = cids(i) * ci.d
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
                val df0 = (arr(off + t) - ci.flat(base + off + t)) - e(t)
                s += df0 * df0
                t += 1
              }
              if (s < bestD) { bestD = s; best = k }
              k += 1
            }
            codes(j) = best
            j += 1
          }
          Row.fromSeq(r.toSeq :+ cids(i) :+ codes.toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Fused assign + residual + PQ-encode in one pass over the PCA-space
    * vector: returns `struct(cluster_id int, code array<int>)`. One scan,
    * no intermediate residual column materialized.
    */
  def assignEncodeCol(spark: SparkSession, centroids: Array[Array[Float]],
                      pq: PqModel, vec: Column): Column = {
    val bcC = spark.sparkContext.broadcast(FlatCentroids.build(centroids))
    val bcB = spark.sparkContext.broadcast(pq.codebooks)
    val m = pq.m
    val subDim = pq.subDim
    val f = udf { (v: Seq[Double]) =>
      val arr = v.toArray
      val ci = bcC.value
      val cid = ci.nearest(arr)
      val base = cid * ci.d
      val cFlat = ci.flat
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
            val df = (arr(off + t) - cFlat(base + off + t)) - e(t)
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
    val bc = spark.sparkContext.broadcast(FlatCentroids.build(centroids))
    val f = udf { (v: Seq[Double]) =>
      val arr = v.toArray
      val ci = bc.value
      val base = ci.nearest(arr) * ci.d
      val out = new Array[Double](arr.length)
      var i = 0
      while (i < arr.length) { out(i) = arr(i) - ci.flat(base + i); i += 1 }
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
