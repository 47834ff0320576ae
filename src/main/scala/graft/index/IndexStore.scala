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

  // The three artifact tables are independent single-file writes/reads
  // of driver-held arrays — run their Spark jobs CONCURRENTLY (guide
  // §2.6 overlap-independent-jobs; the s10_count pattern): three tiny
  // sequential jobs were pure scheduling latency (~0.2-0.4 s per
  // save/load) on every train and every cold model load. Same files,
  // same bytes, same values — only the job submission overlaps.
  private def inParallel[T](work: Seq[() => T]): Seq[T] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(Future.sequence(work.map(f => Future(f()))), 10.minutes)
  }

  def saveModel(spark: SparkSession, dir: String, model: IndexModel): Unit = {
    import spark.implicits._
    inParallel(Seq(
      () => {
        val pcaRows = (-1, model.pca.mean.toSeq) +:
          model.pca.components.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
        pcaRows.toDF("idx", "vec").repartition(1)
          .write.mode("overwrite").parquet(s"$dir/pca")
      },
      () => {
        model.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
          .toDF("cid", "centroid").repartition(1)
          .write.mode("overwrite").parquet(s"$dir/centroids")
      },
      () => {
        val cb = for {
          j <- model.pq.codebooks.indices
          c <- 0 until 256
        } yield (j, c, model.pq.codebooks(j)(c).toSeq)
        cb.toDF("subspace", "code", "centroid").repartition(1)
          .write.mode("overwrite").parquet(s"$dir/codebooks")
      }))
    ()
  }

  def loadModel(spark: SparkSession, dir: String): IndexModel = {
    val loaded = inParallel[Any](Seq(
      () => spark.read.parquet(s"$dir/pca").collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap,
      () => spark.read.parquet(s"$dir/centroids").collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap,
      () => spark.read.parquet(s"$dir/codebooks").collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2).toArray).toMap))
    val pcaRows = loaded(0).asInstanceOf[Map[Int, Array[Double]]]
    val mean = pcaRows(-1)
    val comps = (0 until pcaRows.size - 1).map(pcaRows(_)).toArray
    val pca = PcaModel(mean, comps)

    val centroids = loaded(1).asInstanceOf[Map[Int, Array[Float]]]
    val cArr = Array.tabulate(centroids.size)(centroids(_))

    val cbRows = loaded(2).asInstanceOf[Map[(Int, Int), Array[Float]]]
    val m = cbRows.keys.map(_._1).max + 1
    val subDim = cbRows((0, 0)).length
    val codebooks = Array.tabulate(m)(j => Array.tabulate(256)(c => cbRows((j, c))))
    IndexModel(pca, cArr, PqModel(m, subDim, codebooks))
  }
}
