package graft.index

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Engine.IndexModel

/** Persistence for the small index artifacts (reference S11: the Faiss
  * index file, mindb.py:492-504 — here three tiny Parquet tables under
  * `index/v<N>/`):
  *
  *   - `pca/`       (idx int, vec array<double>)  idx = -1 → mean row
  *   - `centroids/` (cid int, centroid array<float>)   IVF quantizer, PCA space
  *   - `codebooks/` (subspace int, code int, centroid array<float>)
  *
  * The coded table (`coded/`, partitioned by `cluster_id`) is written by
  * the engine's build pass, not here.
  */
object IndexStore {

  def saveModel(spark: SparkSession, dir: String, model: IndexModel): Unit = {
    import spark.implicits._
    val pcaRows = (-1, model.pca.mean.toSeq) +:
      model.pca.components.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
    pcaRows.toDF("idx", "vec").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/pca")

    model.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cid", "centroid").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")

    val cb = for {
      j <- model.pq.codebooks.indices
      c <- 0 until 256
    } yield (j, c, model.pq.codebooks(j)(c).toSeq)
    cb.toDF("subspace", "code", "centroid").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/codebooks")
  }

  def loadModel(spark: SparkSession, dir: String): IndexModel = {
    val pcaRows = spark.read.parquet(s"$dir/pca").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val mean = pcaRows(-1)
    val comps = (0 until pcaRows.size - 1).map(pcaRows(_)).toArray
    val pca = PcaModel(mean, comps)

    val centroids = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
    val cArr = Array.tabulate(centroids.size)(centroids(_))

    val cbRows = spark.read.parquet(s"$dir/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2).toArray).toMap
    val m = cbRows.keys.map(_._1).max + 1
    val subDim = cbRows((0, 0)).length
    val codebooks = Array.tabulate(m)(j => Array.tabulate(256)(c => cbRows((j, c))))
    IndexModel(pca, cArr, PqModel(m, subDim, codebooks))
  }
}
