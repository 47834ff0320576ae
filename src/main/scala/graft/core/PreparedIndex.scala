package graft.core

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession

import graft.catalog.CatalogDoc
import graft.core.Engine.IndexModel
import graft.operators.PreparedANN
import graft.operators.PreparedANN.{Cand, ClusterBlock}

/** A pinned, memory-resident serving handle for one trained database —
  * the low-latency complement to `Engine.query` (which stays the right
  * path for batches and for ad-hoc queries against a moving table).
  *
  * `query` returns exactly what `Engine.query(...).collect()` returns
  * for the same arguments (modulo row type), but as ONE Spark job over
  * cached partition-local blocks: no per-query Catalyst planning, no
  * candidate-fetch join round-trip. Staleness is handled conservatively:
  *
  *  - removes: pending deletes are re-collected (one small job) only
  *    when the pinned count drifts, then applied in-kernel before the
  *    ADC heap — the regular path's anti-join-before-ADC, same place;
  *  - adds / train / compact (maxId or a version moved): the handle
  *    transparently falls back to the regular engine path for that
  *    query, so results are ALWAYS current — `isStale` tells the caller
  *    it is time to `close()` and re-prepare.
  *
  * Thread-safe: concurrent `query` calls share the cached RDD and run
  * as independent jobs (FAIR scheduling applies, same as the regular
  * path).
  */
object PreparedIndex {
  /** One result row, rank-ordered — the collected shape of
    * `Engine.query`'s (rank, id, metadata, cosine_similarity).
    */
  final case class Hit(rank: Int, id: Long, metadata: String,
                       cosineSimilarity: Double)
}

final class PreparedIndex private[core] (
    engine: Engine,
    spark: SparkSession,
    val pinned: CatalogDoc,
    blocks: RDD[Map[Int, ClusterBlock]],
    bcModel: Broadcast[IndexModel],
    collectDeleted: CatalogDoc => Array[Long]) {

  import PreparedIndex.Hit

  // pending-delete snapshot: (count we saw, broadcast sorted ids) — a
  // broadcast so the set ships once per executor on refresh, not per-task
  // in every query's closure (pending deletes are bounded by the
  // compaction threshold, which can still be millions of ids at scale).
  // Refreshed under the lock when the catalog count drifts.
  @volatile private var deletedSnapshot: (Long, Broadcast[Array[Long]]) =
    (pinned.numPendingDeletes,
      spark.sparkContext.broadcast(collectDeleted(pinned)))
  private val refreshLock = new Object
  @volatile private var closed = false

  private def model: IndexModel = bcModel.value

  /** True when the underlying db changed shape (adds, train, compact,
    * drop) in a way the pinned blocks can't serve; `query` falls back to
    * the regular path until the caller re-prepares.
    */
  def isStale: Boolean = {
    val cur = engine.load(pinned.name)
    cur.indexVersion != pinned.indexVersion ||
      cur.dataVersion != pinned.dataVersion || cur.maxId != pinned.maxId
  }

  /** Two-stage ANN query (Q1-Q9 semantics, mindb.py:368-442), served
    * from the prepared blocks in one job. Result rows are ordered by
    * rank, identical to `Engine.query(name, q, prelimK, finalK)`.
    */
  def query(q: Array[Float], preliminaryTopK: Int = 500,
            finalTopK: Int = 100): Array[Hit] = {
    require(!closed, s"prepared index for '${pinned.name}' is closed")
    val cur = engine.load(pinned.name)
    require(cur.vectorDimension <= 0 || q.length == cur.vectorDimension,
      s"query dim ${q.length} != ${cur.vectorDimension}")
    if (cur.indexVersion != pinned.indexVersion ||
        cur.dataVersion != pinned.dataVersion || cur.maxId != pinned.maxId)
      return fallback(q, preliminaryTopK, finalTopK)

    if (cur.numPendingDeletes != deletedSnapshot._1) refreshLock.synchronized {
      if (cur.numPendingDeletes != deletedSnapshot._1) {
        val old = deletedSnapshot._2
        deletedSnapshot = (cur.numPendingDeletes,
          spark.sparkContext.broadcast(collectDeleted(cur)))
        old.unpersist(blocking = false)
      }
    }
    val bcDeleted = deletedSnapshot._2

    val qn = {
      var s = 0.0; var i = 0
      while (i < q.length) { s += q(i).toDouble * q(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0) q else q.map(x => (x / n).toFloat)
    }
    val qp = model.pca.applyLocal(qn)
    val probes = model.nearestClusters(qp, cur.nProbe)
    val bc = bcModel // avoid capturing `this` in the job closure
    val bcDel = bcDeleted
    val parts: Array[Array[Cand]] = spark.sparkContext.runJob(
      blocks,
      (it: Iterator[Map[Int, ClusterBlock]]) =>
        if (it.hasNext)
          PreparedANN.servePartition(it.next(), bc.value, probes, qp, qn,
            preliminaryTopK, bcDel.value)
        else Array.empty[Cand])
    PreparedANN.merge(parts, preliminaryTopK, finalTopK).zipWithIndex.map {
      case (c, i) => Hit(i + 1, c.id, c.meta, c.sim)
    }
  }

  private def fallback(q: Array[Float], prelimK: Int,
                       finalK: Int): Array[Hit] =
    engine.query(pinned.name, q, prelimK, finalK).collect().map { r =>
      Hit(r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2), r.getDouble(3))
    }

  /** Release the cached blocks (the model broadcast is engine-owned and
    * stays — it serves the regular path too).
    */
  def close(): Unit = {
    closed = true
    blocks.unpersist(blocking = false)
    deletedSnapshot._2.unpersist(blocking = false)
  }
}
