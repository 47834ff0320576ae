package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** SemDeDup-style cluster-scoped semantic deduplication (Abbas et al.,
  * 2023): assign every embedding to its nearest coarse centroid, then
  * compare pairs ONLY within a cluster — the pruning that makes semantic
  * dedup tractable where a corpus-wide all-pairs cosine is n². An item is
  * marked a duplicate iff some LOWER-id item in its cluster is within the
  * cosine threshold (deterministic keep-lowest-id rule; the paper's
  * keep-farthest-from-centroid is one ORDER BY swap away).
  *
  * Complements the hash-family near-dup passes: MinHash/SimHash catch
  * lexical overlap, hyperplane-LSH ([[EmbeddingLSH]]) catches cosine
  * neighbors probabilistically — this pass is EXACT within each cluster,
  * the fidelity SemDeDup needs to prune paraphrases at a fixed threshold.
  *
  * Scale shape: assignment is a shuffle-free per-row argmin over the
  * broadcast centroid array (same kernel as T12); the pair stage is one
  * equi-join on cluster id, so candidates ∝ Σ cᵢ² over cluster sizes —
  * bounded by growing nlist with the corpus exactly as the IVF index
  * does (cluster size ~n/nlist stays constant), never n². A pathological
  * giant cluster is a skew key like any other: AQE skew-join splits it,
  * or cap cluster size upstream. Cosines are rounded to 9 dp before the
  * threshold on both engines so float noise cannot flip a pair.
  *
  * Reference provenance: clustering kernel parity with
  * two_level_clustering.py:64-116; cosine contract query_utils.py:3-8.
  */
object SemanticDedup {

  /** Marks per item: cluster id, how many lower-id in-cluster items sit
    * within `tau` cosine (`n_dups`), the max such cosine, and the keep
    * flag (`n_dups` == 0).
    *
    * `centroids`: (cluster id, centroid) — broadcast-small, cid-sorted.
    */
  def semanticDedup(items: DataFrame, idCol: String, vecCol: String,
                    centroids: Array[(Int, Seq[Double])],
                    tau: Double): DataFrame = {
    val cLit = typedLit(centroids.map(_._2).toSeq)
    val cidLit = typedLit(centroids.map(_._1).toSeq)
    val dists = transform(cLit, c => round(VectorFunctions.l2DistSq(c, col(vecCol)), 9))
    val idx = array_position(dists, array_min(dists)) // first min → lowest cid on ties
    val assigned = items.select(col(idCol), col(vecCol),
      element_at(cidLit, idx.cast("int")).as("cid"))
    // per-vector norm hoisted out of the in-cluster pair join (same
    // rationale and bit-identity argument as EmbeddingLSH.verifyCosine:
    // dot/(na·nb) is cosine's exact double op sequence)
    val a = assigned.select(col(idCol).as("id_a"), col("cid"),
      col(vecCol).as("va"), VectorFunctions.l2Norm(col(vecCol)).as("na"))
    val b = assigned.select(col(idCol).as("id_b"), col("cid"),
      col(vecCol).as("vb"), VectorFunctions.l2Norm(col(vecCol)).as("nb"))
    val marks = a.join(b, "cid")
      .filter(col("id_a") < col("id_b"))
      .withColumn("c9", round(VectorFunctions.dot(col("va"), col("vb")) /
        (col("na") * col("nb")), 9))
      .filter(col("c9") >= tau)
      // the HIGHER id of each near pair carries the mark → the lowest id
      // of every duplicate neighborhood is kept by construction
      .groupBy(col("id_b").as(idCol))
      .agg(count(lit(1)).as("n_dups"), max(col("c9")).as("mx"))
    assigned.select(col(idCol), col("cid"))
      .join(marks, Seq(idCol), "left")
      .select(col(idCol), col("cid"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        round(coalesce(col("mx"), lit(0.0)), 6).as("max_dup_sim"),
        col("n_dups").isNull.as("keep"))
  }
}
