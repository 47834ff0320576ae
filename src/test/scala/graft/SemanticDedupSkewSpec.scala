package graft

import org.apache.spark.sql.functions._

import graft.operators.SemanticDedup

/** Skew proof for the SemDeDup pair stage (VERDICT r12 ask #7): the
  * operator's 100-TB contract says a pathological giant cluster "is a
  * skew key like any other: AQE skew-join splits it". This spec builds
  * that pathology — ONE cluster holding 60% of all rows — and proves
  * both halves of the claim on the executed plan:
  *
  *  - the pair stage's self-join really is handled by AQE's skew split
  *    (the final adaptive plan shows `SortMergeJoin(skew=true)`), so the
  *    giant key's quadratic pair work is spread across tasks instead of
  *    serializing on one;
  *  - the skew-handled result is ROW-IDENTICAL to the same fixture with
  *    skew handling off (AQE's m×n sub-split of a both-sides-skewed
  *    inner join must not duplicate or drop pairs).
  *
  * The quadratic WORK itself (Σ cᵢ² pairs) is inherent to SemDeDup's
  * cluster-scoped compare — the contract for that is growing nlist with
  * the corpus (cluster size ~n/nlist constant) or capping cluster size
  * upstream, per the operator doc; what AQE removes is the single-task
  * straggler.
  */
class SemanticDedupSkewSpec extends SparkSpec {

  // 4 well-separated unit centroids in d=8 (axis-aligned)
  private val centroids: Array[(Int, Seq[Double])] = Array(
    0 -> Seq(1.0, 0, 0, 0, 0, 0, 0, 0),
    1 -> Seq(0, 1.0, 0, 0, 0, 0, 0, 0),
    2 -> Seq(0, 0, 1.0, 0, 0, 0, 0, 0),
    3 -> Seq(0, 0, 0, 1.0, 0, 0, 0, 0))

  /** n rows, `giantShare` of them in cluster 0, the rest striped over
    * clusters 1-3; deterministic tiny per-row jitter on one off-axis
    * coordinate so in-cluster cosines vary but stay near 1.
    */
  private def fixture(n: Int, giantShare: Double) = {
    import spark.implicits._
    val nGiant = (n * giantShare).toInt
    (0 until n).map { i =>
      val cid = if (i < nGiant) 0 else 1 + (i % 3)
      val base = centroids(cid)._2.toArray
      val j = (cid + 4) % 8
      base(j) = 0.001 * ((i * 31) % 97)  // jitter: cosine ~0.995-1.0
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getDouble(3), r.getBoolean(4))).sortBy(_._1).toSeq

  test("giant cluster (60% of rows): AQE splits the pair join; results identical to unsplit") {
    val items = fixture(6000, 0.6).cache()
    items.count()
    try withConfs(
      // force the shuffled path (at corpus scale neither side broadcasts)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // test-sized skew thresholds: the giant cid partition is ~100s of
      // KB, the median a few KB — the default 256 MB threshold would
      // never see it
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2") {
      val df = SemanticDedup.semanticDedup(items, "vec_id", "embedding",
        centroids, tau = 0.9)
      val skewed = rows(df)
      // the FINAL adaptive plan (post-execution) must mark the pair join
      // as skew-handled
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"pair join was not skew-split by AQE:\n$plan")
      // equality vs the same fixture with skew handling off
      val unsplit = withConfsValue(
        "spark.sql.adaptive.skewJoin.enabled" -> "false") {
        rows(SemanticDedup.semanticDedup(items, "vec_id", "embedding",
          centroids, tau = 0.9))
      }
      assert(skewed == unsplit,
        "skew-split join changed the dedup result")
      // sanity on the fixture: the giant cluster really dominates and
      // really dedups (every cluster keeps exactly one survivor per
      // distinct jitter neighborhood; with tau=0.9 and near-1 cosines,
      // only the lowest id in each cluster survives)
      val perCluster = skewed.groupBy(_._2).view.mapValues(_.size).toMap
      assert(perCluster(0) >= 3600 - 1 && perCluster(0) <= 3600)
      assert(skewed.count(_._5) == 4, "one survivor per cluster expected")
    } finally items.unpersist()
  }

  private def withConfsValue[A](pairs: (String, String)*)(body: => A): A = {
    var out: Option[A] = None
    withConfs(pairs: _*) { out = Some(body) }
    out.get
  }
}
