package graft.index

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Two-level k-means (reference two_level_clustering.py — the adaptation of
  * Faiss's memory-bounded clustering): instead of one k-means with
  * k = nlist over everything, fit √nlist coarse centroids on a sample,
  * assign every vector to its coarse cluster, split the nlist budget
  * across coarse clusters proportionally to their population, then run an
  * independent small k-means inside each coarse cluster and concatenate
  * the sub-centroids.
  *
  * Spark shape: the coarse fit is driver-local over a ≤256·k sample
  * (two_level_clustering.py:64-82); the assignment is a shuffle-free
  * codegen projection; the per-cluster sub-fits run in parallel inside
  * executors via `flatMapGroups`, each over a ≤64·k_sub member sample
  * (:47-49) so every group is bounded regardless of total data size —
  * this is the piece that makes nlist=200k index builds feasible at
  * 100 TB without a giant global k-means.
  */
object TwoLevelClustering {

  /** @param totalRows caller-known row count (train already counted);
    *                   pass < 0 to count here.
    */
  def fit(projected: DataFrame, vecCol: String, d: Int, nlist: Int,
          iters: Int = 25, seed: Long = 42L,
          totalRows: Long = -1L): Array[Array[Float]] = {
    val spark = projected.sparkSession
    import spark.implicits._

    // 1. coarse fit: k = ceil(sqrt(nlist)) on a ≤256·k sample (driver-local)
    val kCoarse = math.max(1, math.ceil(math.sqrt(nlist.toDouble)).toInt)
    val total = if (totalRows >= 0) totalRows else projected.count()
    val sampleN = math.min(total, 256L * kCoarse)
    val coarseSample = projected
      .sample(withReplacement = false, math.min(1.0, sampleN * 1.05 / total), seed)
      .limit(sampleN.toInt)
      .select(vecCol).collect().map(_.getSeq[Double](0).map(_.toFloat).toArray)
    val coarse = LocalKMeans.fit(coarseSample, kCoarse, iters, seed)

    // 2. assign all → coarse_id (pure projection, no shuffle; coarse
    // centroids ship as a broadcast, not a plan literal). Persisted: the
    // histogram pass and the sub-sample pass both read it, and without the
    // cache the PCA-projection + assignment kernel would run the full scan
    // twice — two complete passes over the data at 100 TB where one does.
    val assigned = Coder.withNearestBatched(
        projected.select(col(vecCol)), vecCol, "coarse_id",
        spark.sparkContext.broadcast(FlatCentroids.build(coarse)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    try {
      // 3. histogram + proportional split of the nlist budget
      //    (two_level_clustering.py:95-107: cumsum * nlist // total, diffed)
      val hist = assigned.groupBy("coarse_id").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val counts = Array.tabulate(kCoarse)(i => hist.getOrElse(i, 0L))
      val cum = counts.scanLeft(0L)(_ + _).tail
      val grand = math.max(1L, cum.last)
      val cumBudget = cum.map(c => (c * nlist.toLong / grand).toInt)
      val budgets = cumBudget.zip(0 +: cumBudget.dropRight(1)).map { case (b, a) => b - a }

      // 4. per-coarse-cluster sub-k-means over a bounded member sample
      val budgetLit = typedLit(budgets.toSeq)
      val sampled = assigned
        // sample ≤ 64·k_sub members per group *before* grouping so every
        // group fits in executor memory (SURVEY §7.4 risk 3)
        .withColumn("r", rand(seed + 1))
        .withColumn("keep_p", least(lit(1.0),
          element_at(budgetLit, col("coarse_id") + 1) * 64.0 * 1.2 /
            greatest(lit(1.0), typedLit(counts.toSeq).getItem(col("coarse_id")).cast("double"))))
        .filter(col("r") <= col("keep_p"))
        .select(col("coarse_id"), col(vecCol))

      val subCentroids = sampled.as[(Int, Seq[Double])]
        .groupByKey(_._1)
        .flatMapGroups { (cid, it) =>
          val budget = budgets(cid)
          if (budget <= 0) Iterator.empty
          else {
            val pts = it.map(_._2.map(_.toFloat).toArray).take(64 * budget).toArray
            if (pts.isEmpty) Iterator.empty
            else LocalKMeans.fit(pts, math.min(budget, pts.length), iters, seed + cid)
              .iterator.map(c => (cid, c.toSeq))
          }
        }
        .collect()

      // deterministic order: by coarse id, then centroid content — a bare
      // sortBy(cid) would leave within-group order at collect() arrival order
      val out = subCentroids
        .sortBy { case (cid, v) => (cid, v.mkString(",")) }
        .map(_._2.toArray)
      // top up if rounding/empty groups produced fewer than nlist centroids
      if (out.length >= nlist) out.take(nlist)
      else out ++ coarse.take(nlist - out.length)
    } finally assigned.unpersist()
  }
}
