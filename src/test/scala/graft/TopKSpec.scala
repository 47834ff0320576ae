package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dot
import graft.operators.TopK

/** TopK.topKPerQuery must be row-identical to the naive cross-join +
  * window-rank plan (same dot fold order, same (sim desc, id asc)
  * tie-break) — it only changes the shuffle shape.
  */
class TopKSpec extends SparkSpec {

  test("bounded-heap top-k equals window-rank plan on embeddings") {
    val e = sf("sf0.001", "embeddings")
    val qs = e.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)

    val heap = TopK.topKPerQuery(e, qs, 7, idCol = "vec_id", vecCol = "embedding")
      .select("query_id", "vec_id", "rank", "sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3))

    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    val naive = e.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        dot(col("embedding"), col("qvec")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3), r.getDouble(2)))
      .sortBy(t => (t._1, t._3))

    assert(heap.toSeq == naive.toSeq)
  }

  test("tie-break: duplicate vectors rank by ascending id") {
    import spark.implicits._
    val v = Array(1.0f, 0.0f)
    val dup = Seq((10L, v.toSeq), (3L, v.toSeq), (7L, v.toSeq), (1L, Seq(0.0f, 1.0f)))
      .toDF("id", "vector")
    val res = TopK.topKPerQuery(dup, Array((0L, v)), 3)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(res == Seq(3L, 7L, 10L))
  }

  test("k larger than table returns all rows ranked") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, 0f)), (2L, Seq(0f, 1.0f))).toDF("id", "vector")
    val res = TopK.topKPerQuery(df, Array((0L, Array(1.0f, 0f))), 10)
    assert(res.count() == 2)
  }
}
