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
  *     argmin projection against the centroid BROADCAST (the T12 kernel
  *     pattern, Coder.scala) — the centroids ship once per executor, so
  *     the plan stays O(1) in nlist. At the reference's heuristic ceiling
  *     (nlist = 200k, training_utils.py:5-9) a `typedLit` centroid array
  *     would be a ~100 MB literal serialized into every task binary and
  *     walked by the analyzer — the round-7/8 scale-killer this shape
  *     replaces.
  *  2. query rows replicate to their `nProbe` nearest centroids via a
  *     bounded-heap top-nProbe over the same broadcast — output is
  *     q·nProbe rows, never q·nlist, still no shuffle.
  *  3. ONE equi-join on cluster id — candidate volume is
  *     Σ_q Σ_probed |cluster|, i.e. ≈ n·q·(nProbe/nlist), never the n·q
  *     cross product.
  *  4. per-query top-k: rank over (sim desc, id) with the filter Spark 4
  *     pushes below the shuffle as a WindowGroupLimit partial — each
  *     map task forwards at most k rows per query.
  *
  * Distances are rounded to 9dp before every argmin/top-nProbe tie-break
  * (ties then break on centroid id) so cross-engine float noise cannot
  * flip assignments — the whole operator replays exactly in the SQL
  * oracle: the kernel's `BigDecimal.setScale(9, HALF_UP)` is the same
  * rounding Spark's `round(_, 9)` and DuckDB's `round(_, 9)` apply, and
  * the left-to-right double Σ(x−c)² matches the codegen `l2DistSq`
  * bit-for-bit.
  */
object SimilarityJoin {

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def distSq(v: Seq[Double], c: Array[Double]): Double = {
    var s = 0.0; var j = 0
    while (j < c.length) { val d = v(j) - c(j); s += d * d; j += 1 }
    s
  }

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
    val spark = items.sparkSession
    val bc = spark.sparkContext.broadcast(
      centroids.map { case (cid, c) => (cid, c.toArray) })

    // 1. item → nearest centroid by (9dp-rounded dist, cid)
    val assignU = udf { (v: Seq[Double]) =>
      val cs = bc.value
      var bestCid = Int.MaxValue
      var bestD = Double.MaxValue
      var i = 0
      while (i < cs.length) {
        val d = round9(distSq(v, cs(i)._2))
        val cid = cs(i)._1
        if (d < bestD || (d == bestD && cid < bestCid)) { bestD = d; bestCid = cid }
        i += 1
      }
      bestCid
    }

    // 2. query → nProbe nearest centroids by (9dp-rounded dist, cid):
    // bounded max-heap selection, O(nlist·log nProbe), heap-worst first
    // out so the result is ascending (matches ORDER BY round(d2,9), cid)
    val probeOrd = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int)
    val probeU = udf { (v: Seq[Double]) =>
      val cs = bc.value
      val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](probeOrd)
      var i = 0
      while (i < cs.length) {
        val e = (round9(distSq(v, cs(i)._2)), cs(i)._1)
        if (heap.size < nProbe) heap.enqueue(e)
        else if (probeOrd.lt(e, heap.head)) { heap.dequeue(); heap.enqueue(e) }
        i += 1
      }
      val out = new Array[Int](heap.size)
      var w = heap.size - 1
      while (w >= 0) { out(w) = heap.dequeue()._2; w -= 1 }
      out
    }

    val assigned = items.select(
      col(idCol).as("item_id"), col(vecCol).as("item_vec"),
      assignU(col(vecCol).cast("array<double>")).as("cid"))
    val probed = queries.select(
        col(idCol).as("query_id"), col(vecCol).as("query_vec"),
        explode(probeU(col(vecCol).cast("array<double>"))).as("cid"))

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
