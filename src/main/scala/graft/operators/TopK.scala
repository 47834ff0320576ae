package graft.operators

import scala.collection.mutable.PriorityQueue

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batched per-query top-k over a vector table — the throughput shape of
  * the reference's rerank stage (minDB mindb.py:424-428) generalized to
  * many query vectors per job.
  *
  * Scale contract: the naive plan (cross join then
  * `Window.partitionBy(query_id)` rank) shuffles the entire n·q scored
  * cross product. Here each input partition keeps a bounded heap per query
  * (size k) and emits only its local top-k, so the shuffle is
  * O(partitions · q · k) regardless of table size; a final window rank
  * over that small candidate set gives the exact global answer. Results
  * are identical to the naive plan (same dot-product fold order, same
  * (sim desc, id asc) tie-break).
  */
object TopK {

  /** Exact top-k rows per query: returns `(query_id, id, rank, sim)`.
    *
    * @param table   source with `idCol: long` and `vecCol: array<float|double>`
    * @param queries broadcast-small (query_id, query vector) pairs
    */
  def topKPerQuery(table: DataFrame, queries: Array[(Long, Array[Float])],
                   k: Int, idCol: String = "id", vecCol: String = "vector"): DataFrame = {
    val spark = table.sparkSession
    val bc = spark.sparkContext.broadcast(queries)
    val src = table.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))

    // weakest candidate = smallest sim, then largest id → heap head
    val weakestFirst: Ordering[(Double, Long)] =
      Ordering.by { case (sim, id) => (-sim, id) }

    val partialRdd = src.rdd.mapPartitions { it =>
      val qs = bc.value
      val heaps = Array.fill(qs.length)(PriorityQueue.empty[(Double, Long)](weakestFirst))
      it.foreach { r =>
        if (!r.isNullAt(0) && !r.isNullAt(1)) {
          val id = r.getLong(0)
          val v = r.getSeq[Float](1)
          var qi = 0
          while (qi < qs.length) {
            val q = qs(qi)._2
            var s = 0.0
            var j = 0
            while (j < q.length) { s += v(j).toDouble * q(j).toDouble; j += 1 }
            val h = heaps(qi)
            if (h.size < k) h.enqueue((s, id))
            else {
              val (ws, wid) = h.head
              if (s > ws || (s == ws && id < wid)) { h.dequeue(); h.enqueue((s, id)) }
            }
            qi += 1
          }
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        val qid = bc.value(qi)._1
        h.iterator.map { case (s, id) => Row(qid, id, s) }
      }
    }

    val partial = spark.createDataFrame(partialRdd, StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField(idCol, LongType, nullable = false),
      StructField("sim", DoubleType, nullable = false))))

    // exact global merge over the ≤ partitions·q·k candidate rows
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col(idCol))
    partial.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("rank"), col("sim"))
  }
}
