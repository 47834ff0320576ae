package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: near-dup detection yields PAIRS, but a
  * dedup pass needs one keeper per duplicate CLUSTER — the connected
  * component of the pair graph (a≈b, b≈c ⇒ {a,b,c} is one group even if
  * a≉c directly). Each node gets the minimum doc id reachable from it as
  * its canonical id; keep rows where doc_id == canonical_id.
  *
  * ADAPTIVE execution: the pair graph's size is known (it was just
  * produced by the banded near-dup join), and the two regimes want
  * different algorithms —
  *
  *   - collect-small graphs (≤ `driverMaxPairs`, i.e. ≲ tens of MB):
  *     union-find with path compression on the driver. One collect job;
  *     Spark's per-round job overhead (~1 s/round locally) would dominate
  *     an iterative plan many times over for a graph this size.
  *   - larger graphs: iterative min-label propagation over the
  *     distributed pair graph (the simple alternating form of the
  *     large-star/small-star map-reduce CC algorithm) — every node starts
  *     as its own label and repeatedly takes the min of its neighbors'
  *     labels until a fixpoint. Iterations = component diameter; near-dup
  *     clusters are shallow, so this converges in a handful of rounds.
  *     Each round is one equi-join + groupBy over the PAIR graph only —
  *     the corpus itself is never touched.
  *
  * Both paths compute the same exact fixpoint (min reachable id); the
  * cutover only trades latency, never semantics — NearDupSpec asserts
  * set-equality of the two paths on the same graph.
  */
object ConnectedComponents {

  /** (id, canonical_id) for every node of the pair graph, where
    * canonical_id = min id in the node's connected component. Exact on
    * both paths (the distributed path loudly fails if `maxIters` rounds
    * don't converge — a diameter that size means the input is not a
    * near-dup pair set).
    */
  def canonicalIds(pairs: DataFrame, aCol: String, bCol: String,
                   maxIters: Int = 25,
                   driverMaxPairs: Long = 2L * 1000 * 1000): DataFrame = {
    val idType = pairs.schema(pairs.schema.fieldIndex(aCol)).dataType
    val p = pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    // ONE size probe doubles as the collect: take(max+1) either hands the
    // whole graph to the driver (≤ tens of MB by the bound) or proves it
    // is too big and the distributed path re-evaluates from source — no
    // separate persist+count round for the common collect-small case
    val taken = p.take(driverMaxPairs.toInt + 1)
    val out =
      if (taken.length <= driverMaxPairs) driverCanonical(p.sparkSession, taken)
      else {
        val pp = p.persist()
        try propagate(pp, maxIters) finally pp.unpersist()
      }
    out.select(col("id").cast(idType).as("id"),
      col("canonical_id").cast(idType).as("canonical_id"))
  }

  /** Driver union-find (path compression + union-by-min-root: linking the
    * larger root under the smaller keeps every root the minimum id of its
    * set, so the final root IS the canonical id). Bounded by
    * `driverMaxPairs` collected (src, dst) longs — tens of MB.
    */
  private def driverCanonical(spark: org.apache.spark.sql.SparkSession,
                              rows: Array[org.apache.spark.sql.Row]): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    rows.foreach { row =>
      val a = row.getLong(0); val b = row.getLong(1)
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.toSeq.sorted.map(id => (id, find(id))).toDF("id", "canonical_id")
  }

  /** Distributed min-label propagation. One Spark job per round: the
    * `moved` flag is computed inside the propagation select, so the action
    * that fills the round's cache is the same action that counts changes —
    * no separate join-and-count pass. The result is local-checkpointed
    * (lineage truncated, materialized) so every loop cache can be released
    * before returning; the returned frame owns its own blocks and is
    * cleaned up when the caller drops it.
    */
  private def propagate(p: DataFrame, maxIters: Int): DataFrame = {
    val edges = p
      .union(p.select(col("dst").as("src"), col("src").as("dst")))
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
