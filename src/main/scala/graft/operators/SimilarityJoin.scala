package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Distributed IVF-bucketed cosine top-k similarity JOIN — the
  * two-big-tables form of ANN search that corpus-vs-corpus dedup or a
  * retrieval sweep needs at 100 TB. [[TopK.topKPerQuery]] (and the
  * engine's `queryBatchTrained`) require a driver-resident query batch;
  * here BOTH sides are arbitrary DataFrames and NOTHING is collected —
  * the only driver-sized object is the centroid table.
  *
  * Plan shape (reference has no counterpart — its serving path is
  * one-query-at-a-time over Faiss, mindb.py:368-442):
  *
  *  1. items are assigned to their nearest centroid: a SHUFFLE-FREE
  *     argmin projection over the centroid array (the T12 kernel).
  *  2. query rows replicate to their `nProbe` nearest centroids via an
  *     in-row argsort (array_sort over (dist, cid) structs, slice
  *     nProbe) — output is q·nProbe rows, never q·nlist, and still no
  *     shuffle.
  *  3. ONE equi-join on cluster id — candidate volume is
  *     Σ_q Σ_probed |cluster|, i.e. ≈ n·q·(nProbe/nlist), never the n·q
  *     cross product.
  *  4. per-query top-k: rank over (sim desc, id) with the filter Spark 4
  *     pushes below the shuffle as a WindowGroupLimit partial — each
  *     map task forwards at most k rows per query.
  *
  * Distances are rounded to 9dp before every argmin/argsort tie-break
  * (ties then break on cluster/item id) so cross-engine float noise
  * cannot flip assignments — the whole operator replays exactly in the
  * SQL oracle.
  *
  * Centroids ship as plan literals here (fine for nlist ≲ thousands); at
  * index scale the same shape holds with the model broadcast BatchANN
  * uses — the join/rank stages are unchanged.
  */
object SimilarityJoin {

  /** Top-`k` most-cosine-similar `items` rows for every `queries` row.
    * Both frames need (`idCol`, `vecCol`); output is
    * (query_id, item_id, rank, raw_sim) with raw (unrounded) similarity —
    * callers round for display. Self-pairs (same id) are excluded so a
    * self-join dedup sweep doesn't return each row as its own neighbor.
    */
  def cosineTopK(items: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String,
                 centroids: Array[(Int, Seq[Double])],
                 k: Int, nProbe: Int): DataFrame = {
    require(nProbe >= 1 && nProbe <= centroids.length,
      s"nProbe $nProbe out of range 1..${centroids.length}")
    val cLit = typedLit(centroids.map(_._2).toSeq)
    val cidLit = typedLit(centroids.map(_._1).toSeq)
    val dists = transform(cLit, c => round(l2DistSq(c, col(vecCol)), 9))

    // 1. item → nearest centroid (first min = lowest cid on ties)
    val idx = array_position(dists, array_min(dists))
    val assigned = items.select(
      col(idCol).as("item_id"), col(vecCol).as("item_vec"),
      element_at(cidLit, idx.cast("int")).as("cid"))

    // 2. query → nProbe nearest centroids, in-row argsort (struct order =
    // (rounded dist, cid), matching the oracle's ORDER BY round(d2,9),cid)
    val sorted = array_sort(arrays_zip(dists.as("d"), cidLit.as("c")))
    val probeCids = transform(slice(sorted, 1, nProbe), s => s.getField("c"))
    val probed = queries.select(
        col(idCol).as("query_id"), col(vecCol).as("query_vec"),
        explode(probeCids).as("cid"))

    // 3+4. one equi-join on cid, codegen dot, per-query bounded rank
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("raw_sim").desc, col("item_id"))
    probed.join(assigned, Seq("cid"))
      .filter(col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"),
        dot(col("item_vec"), col("query_vec")).as("raw_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "rank", "raw_sim")
  }
}
