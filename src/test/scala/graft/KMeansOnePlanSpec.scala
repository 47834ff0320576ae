package graft

import org.apache.spark.sql.functions._
import graft.index.{Coder, FlatCentroids, KMeansDF}

/** Pins the r19 shuffle-free Lloyd update (per-partition partial sums
  * collected to the driver and merged in partition order — a
  * single-stage job per iteration) to the per-iteration-plan
  * groupBy/avg loop it replaced on the small-partials path: same
  * centroids, bit for bit. (A plan-REUSE variant over the shuffled
  * aggregation was tried first and is exactly what this spec exists to
  * catch: the reused shuffle dependency made Spark skip the map stage
  * on iterations 2+, freezing the centroids at iteration 1.)
  */
class KMeansOnePlanSpec extends SparkSpec {

  /** The pre-r19 loop, verbatim: fresh plan + broadcast per iteration. */
  private def fitPerIterationPlan(df: org.apache.spark.sql.DataFrame,
                                  vecCol: String, d: Int, k: Int,
                                  iters: Int, seed: Long): Array[Array[Float]] = {
    val sparkS = df.sparkSession
    val work = df.select(col(vecCol)).persist()
    val n = work.count()
    require(n > 0)
    val sampled = work
      .sample(withReplacement = false, math.min(1.0, (k * 4.0 + 64.0) / math.max(1L, n)), seed)
      .collect().map(_.getSeq[Double](0))
    val distinctSorted = sampled.distinct
      .sortBy(v => (v.hashCode(), v.mkString(",")))
    var centroids: Array[Array[Float]] =
      (if (distinctSorted.length >= k) distinctSorted.take(k)
       else {
         work.distinct().orderBy(hash(col(vecCol)), col(vecCol).cast("string"))
           .limit(k).collect().map(_.getSeq[Double](0))
       }).map(_.map(_.toFloat).toArray).toArray
    if (centroids.length < k) {
      val rnd = new scala.util.Random(seed)
      centroids = Array.tabulate(k) { i =>
        if (i < centroids.length) centroids(i)
        else centroids(i % math.max(1, centroids.length))
          .map(x => x + (rnd.nextFloat() - 0.5f) * 1e-4f)
      }
    }
    try {
      for (_ <- 0 until iters) {
        val bc = sparkS.sparkContext.broadcast(FlatCentroids.build(centroids))
        val aggs = (0 until d).map(i => avg(col(vecCol)(i)).as(s"c$i"))
        val updated =
          try Coder.withNearestBatched(work, vecCol, "cluster", bc)
            .groupBy("cluster").agg(aggs.head, aggs.tail: _*)
            .collect()
            .map(r => r.getInt(0) -> Array.tabulate(d)(i => r.getDouble(i + 1).toFloat))
            .toMap
          finally bc.destroy()
        centroids = Array.tabulate(centroids.length)(c =>
          updated.getOrElse(c, centroids(c)))
      }
      centroids
    } finally { work.unpersist(); () }
  }

  test("one-plan Lloyd loop is bit-equal to the per-iteration-plan loop") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val d = 8
    val rows = Seq.tabulate(300)(i =>
      (i.toLong, Seq.fill(d)(rnd.nextDouble() * 2 - 1)))
      .toDF("id", "pvec")
    for (k <- Seq(3, 16)) {
      val a = fitPerIterationPlan(rows, "pvec", d, k, iters = 5, seed = 11L)
      val b = KMeansDF.fitDistributed(rows, "pvec", d, k, iters = 5, seed = 11L)
      assert(a.length == b.length)
      a.indices.foreach { i =>
        assert(java.util.Arrays.equals(a(i), b(i)), s"centroid $i differs (k=$k)")
      }
    }
  }

  test("holder re-capture: two sequential fits see their own centroids") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = Seq.tabulate(120)(i =>
      (i.toLong, Seq.fill(4)(rnd.nextDouble()))).toDF("id", "pvec")
    val a1 = KMeansDF.fitDistributed(rows, "pvec", 4, 4, iters = 3, seed = 5L)
    val a2 = KMeansDF.fitDistributed(rows, "pvec", 4, 4, iters = 3, seed = 5L)
    a1.indices.foreach { i =>
      assert(java.util.Arrays.equals(a1(i), a2(i)), s"determinism broke at $i")
    }
  }
}
