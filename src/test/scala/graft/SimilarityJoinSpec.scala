package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{dot, l2DistSq}
import graft.operators.SimilarityJoin

/** SimilarityJoin.cosineTopK must equal the naive plan restricted to the
  * probed clusters: assign every item to its nearest centroid (rounded
  * tie-break), give every query its nProbe nearest centroids, score the
  * cross of each query with its probed clusters' items, rank. The
  * operator only changes the plan shape (bucket equi-join instead of a
  * cross product); the result set is identical by construction.
  */
class SimilarityJoinSpec extends SparkSpec {

  private def centroids() = {
    val e = sf("sf0.001", "embeddings")
    val dims = (0 until 64).map(i => avg(col("embedding")(i)).as(s"m$i"))
    e.groupBy(col("label").as("cid")).agg(dims.head, dims.tail: _*)
      .select(col("cid"), array((0 until 64).map(i => col(s"m$i")): _*).as("centroid"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1)
  }

  test("bucketed similarity join equals naive probed cross-join") {
    val e = sf("sf0.001", "embeddings")
    val cents = centroids()
    val k = 5
    val nProbe = 2

    val got = SimilarityJoin.cosineTopK(e, e.filter(col("vec_id") < 20),
        "vec_id", "embedding", cents, k, nProbe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3))

    // naive: same assignment/probe math, cross join, post-filter on probes
    val cLit = typedLit(cents.map(_._2).toSeq)
    val cidLit = typedLit(cents.map(_._1).toSeq)
    val dists = transform(cLit, c => round(l2DistSq(c, col("embedding")), 9))
    val assignIdx = array_position(dists, array_min(dists))
    val items = e.select(col("vec_id").as("item_id"),
      col("embedding").as("item_vec"),
      element_at(cidLit, assignIdx.cast("int")).as("icid"))
    val sortedCids = transform(
      array_sort(arrays_zip(dists.as("d"), cidLit.as("c"))), s => s.getField("c"))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"),
        slice(sortedCids, 1, nProbe).as("probes"))
    val w = Window.partitionBy("query_id").orderBy(col("raw_sim").desc, col("item_id"))
    val naive = queries.crossJoin(items)
      .filter(array_contains(col("probes"), col("icid")) &&
        col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"),
        dot(col("item_vec"), col("query_vec")).as("raw_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3), r.getDouble(2)))
      .sortBy(t => (t._1, t._3))

    assert(got.nonEmpty)
    assert(got.toSeq == naive.toSeq)
  }

  test("every query returns exactly k ranked rows when candidates suffice") {
    val e = sf("sf0.001", "embeddings")
    val out = SimilarityJoin.cosineTopK(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", centroids(), 3, 2)
      .groupBy("query_id").agg(count(lit(1)).as("n"), max("rank").as("maxr"))
      .collect()
    assert(out.length == 10)
    assert(out.forall(r => r.getLong(1) == 3L && r.getInt(2) == 3))
  }
}
