package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.Heuristics

/** Index-scale proof for [[graft.operators.SimilarityJoin]] — the
  * 1M×1M corpus-vs-corpus cosine top-k sweep at the HEURISTIC cluster
  * count (1M → nlist 6324, the reference's own golden regime,
  * tests/unit/test_utils.py:8-12), where centroids shipping as plan
  * literals was the round-7/8 scale-killer: at this nlist the literal
  * array is ~3 MB re-serialized into every task and ~100 MB at the 200k
  * ceiling; the broadcast form ships once per executor and the plan stays
  * O(1) in nlist.
  *
  * The corpus is a deterministic clustered-Gaussian table generated
  * DISTRIBUTED (no driver matrix); the generating centers double as the
  * IVF centroids, so the run isolates the JOIN operator from a k-means
  * fit. Sampled ground truth: exact brute-force top-k for a handful of
  * query rows via the bounded-heap TopK kernel.
  *
  * Env: GRAFT_SJ_N (1000000), GRAFT_SJ_D (64), GRAFT_SJ_K (5),
  * GRAFT_SJ_NPROBE (4 — a dedup-sweep fan-out; serving-style fan-outs use
  * the engine's trained path, not the join), SPARK_GRAFT_CPUS (32).
  * Prints ONE JSON line.
  */
object SimJoinScale {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_SJ_N", "1000000").toLong
    val d = sys.env.getOrElse("GRAFT_SJ_D", "64").toInt
    val k = sys.env.getOrElse("GRAFT_SJ_K", "5").toInt
    val nProbe = sys.env.getOrElse("GRAFT_SJ_NPROBE", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val seed = 42L
    val nlist = Heuristics.numClusters(n) // 1M → 6324
    val rnd = new Random(seed)
    val centers = Array.fill(nlist, d)(rnd.nextGaussian().toFloat)
    val bcCenters = spark.sparkContext.broadcast(centers)

    // distributed generation; persisted so the self-join's two sides and
    // the sampled ground truth read one materialization
    val corpus = spark.range(0L, n, 1L, 64)
      .map(i => (i, ScaleEval.rowVector(i, bcCenters.value, d, seed).toSeq))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count()

    val centroids: Array[(Int, Seq[Double])] =
      centers.zipWithIndex.map { case (c, i) => i -> c.map(_.toDouble).toSeq }

    val t0 = System.nanoTime()
    val out = graft.operators.SimilarityJoin.cosineTopK(
      corpus, corpus, "vec_id", "embedding", centroids, k, nProbe)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outRows = out.count()
    val joinSec = (System.nanoTime() - t0) / 1e9

    // sampled exact ground truth: 8 query rows, brute force over the
    // corpus through the bounded-heap kernel (excluding self like the join)
    val sampleIds = Array.tabulate(8)(i => (i.toLong * 117101L) % n)
    val qs = sampleIds.map { id =>
      id -> ScaleEval.rowVector(id, centers, d, seed)
    }
    val gt = graft.operators.TopK.topKPerQuery(
      corpus.filter(!col("vec_id").isin(sampleIds.map(Long.box).toIndexedSeq: _*))
        .select(col("vec_id").as("id"), col("embedding").as("vector")),
      qs, k)
      .select("query_id", "id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = out.filter(col("query_id")
        .isin(sampleIds.map(Long.box).toIndexedSeq: _*))
      .select("query_id", "item_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recall = sampleIds.map { id =>
      got.getOrElse(id, Set.empty).count(gt(id).contains).toDouble / k
    }.sum / sampleIds.length

    println(
      s"""{"n":$n,"d":$d,"nlist":$nlist,"nprobe":$nProbe,"k":$k,""" +
        s""""join_sec":${"%.1f".format(joinSec)},"out_rows":$outRows,""" +
        s""""per_query_us":${"%.1f".format(joinSec * 1e6 / n)},""" +
        s""""sampled_recall_${k}_at_$nProbe":${"%.3f".format(recall)}}""")
    spark.stop()
  }
}
