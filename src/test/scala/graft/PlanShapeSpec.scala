package graft

/** Physical-plan regression guards for the shapes PLANS.md documents —
  * a plan that silently degrades (lost pushdown, surprise cartesian,
  * corpus-sized single-partition window) fails here long before a bench
  * or a 100× scale-up would surface it.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q6_filter_agg: all predicates pushed to the scan, pruned read schema") {
    val p = plan("q6_filter_agg")
    assert(p.contains("PushedFilters: ["), "no pushed filters at the scan")
    assert(p.contains("l_shipdate"), "shipdate range must reach the scan")
    assert(!p.contains("l_comment"), "read schema must prune unused columns")
  }

  test("no plan degenerates to a cartesian or broadcast nested loop") {
    for (q <- Seq("bm25_topk", "hybrid_rrf", "semantic_dedup", "seq_pack",
        "mixture_sample", "bigram_logprob", "dsir_weights", "sim_join_topk",
        "range_join_count", "asof_join", "tfidf_topk", "dup_spans")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: nested-loop join")
    }
  }

  test("bm25_topk: final top-k is TakeOrdered, not a global sort") {
    val p = plan("bm25_topk")
    assert(p.contains("TakeOrderedAndProject"), "top-k must be TakeOrdered")
  }

  test("seq_pack: the cumulative window is per-partition, never global") {
    val p = plan("seq_pack")
    // a lost pid-partitioning shows up as an empty partition spec
    // (windowspecdefinition() with no partition keys) feeding the sum
    assert(!p.contains("windowspecdefinition(n_toks"),
      "window must be partitioned by pid")
    assert(p.contains("pid"), "partition-id column missing from the plan")
  }

  test("mixture_sample is a pure scan-speed projection (no joins, no shuffles)") {
    val p = plan("mixture_sample")
    assert(!p.contains("Join"), "mixture decisions must not join")
    assert(!p.contains("Exchange"), "mixture decisions must not shuffle")
  }

  test("partitioned sink: a partition-column filter prunes directories at the scan") {
    import spark.implicits._
    val staged = java.nio.file.Files
      .createTempDirectory("graft-psink-spec").toString
    Seq((1L, "aa", "en"), (2L, "bb", "de"), (3L, "cc", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").partitionBy("lang").parquet(staged)
    val scan = spark.read.parquet(staged)
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
      .queryExecution.executedPlan.toString
    // the filter must land in PartitionFilters (directory pruning before
    // any file I/O), NOT as a data filter over file bytes
    assert(scan.contains("PartitionFilters") &&
      scan.split("PartitionFilters")(1).takeWhile(_ != ']').contains("lang"),
      s"lang filter must prune partitions:\n$scan")
  }

  test("dsir_weights_hashed: the model joins BROADCAST (never a corpus-sized shuffle)") {
    // the hashed variant's entire point: the ≤nBuckets-row model
    // broadcasts to the scoring join; a SortMergeJoin here means the
    // corpus bigrams shuffled by key — the exact-form cost it must avoid
    val p = plan("dsir_weights_hashed")
    assert(p.contains("BroadcastHashJoin"), "model join must broadcast")
    assert(!p.contains("SortMergeJoin"), "no corpus-keyed shuffle join")
  }

  test("ccnet_bucket_sampled: no window operator anywhere in the per-doc pass") {
    // the exact form's scale hazard is the global no-partition ntile
    // window; the sampled form must be aggregates + a pure projection
    val p = plan("ccnet_bucket_sampled")
    assert(!p.contains("Window"), "sampled ccnet must not use any window")
    assert(!p.contains("ntile"), "sampled ccnet must not ntile")
  }

  test("knn_flat: brute-force top-k is TakeOrdered over one scan") {
    val p = plan("knn_flat")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Window"), "no window needed for a global top-k")
  }
}
