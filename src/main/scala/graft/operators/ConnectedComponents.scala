package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: near-dup detection yields PAIRS, but a
  * dedup pass needs one keeper per duplicate CLUSTER — the connected
  * component of the pair graph (a≈b, b≈c ⇒ {a,b,c} is one group even if
  * a≉c directly). Each node gets the minimum doc id reachable from it as
  * its canonical id; keep rows where doc_id == canonical_id.
  *
  * Algorithm: iterative min-label propagation (the simple alternating
  * form of the large-star/small-star map-reduce CC algorithm): every
  * node starts as its own label and repeatedly takes the min of its
  * neighbors' labels until a fixpoint. Iterations = component diameter;
  * near-dup clusters are shallow (dups of dups of one original), so this
  * converges in a handful of rounds. Each round is one equi-join +
  * groupBy over the PAIR graph only — the corpus itself is never
  * touched, and the pair graph is small by construction (near-dups, not
  * all-pairs).
  */
object ConnectedComponents {

  /** (id, canonical_id) for every node of the pair graph, where
    * canonical_id = min id in the node's connected component. Exact: runs
    * to fixpoint (loudly fails if `maxIters` rounds don't converge —
    * a diameter that size means the input is not a near-dup pair set).
    *
    * One Spark job per round: the `moved` flag is computed inside the
    * propagation select, so the action that fills the round's cache is the
    * same action that counts changes — no separate join-and-count pass.
    * The result is local-checkpointed (lineage truncated, materialized)
    * so every loop cache can be released before returning; the returned
    * frame owns its own blocks and is cleaned up when the caller drops it.
    */
  def canonicalIds(pairs: DataFrame, aCol: String, bCol: String,
                   maxIters: Int = 25): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist()
    try {
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < maxIters) {
        val neighborMin = edges
          .join(labels.select(col("id").as("src"), col("label")), Seq("src"))
          .groupBy(col("dst").as("id"))
          .agg(min(col("label")).as("nmin"))
        val next = labels.select(col("id"), col("label"))
          .join(neighborMin, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
            coalesce(col("nmin") < col("label"), lit(false)).as("moved"))
          .persist()
        changed = next.agg(count(when(col("moved"), true))).first().getLong(0)
        labels.unpersist()
        labels = next
        iter += 1
      }
      require(changed == 0, s"connected components did not converge in $maxIters rounds")
      labels.select(col("id"), col("label").as("canonical_id"))
        .localCheckpoint(eager = true)
    } finally {
      edges.unpersist()
      labels.unpersist()
    }
  }
}
