package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (n <- Seq("q1_agg", "q3_topk_join", "knn_flat", "s5_semi_join",
        "events_hourly", "t12_centroid_assign", "dedup_exact",
        "minhash_lsh", "simhash_near_dup", "embed_near_dup",
        "trained_adc_topk", "trained_knn", "dataset_split",
        "repetition_score", "embed_quantize", "sim_join_topk",
        "near_dup_jaccard", "dedup_groups",
        "sessionize", "asof_join", "json_props", "boilerplate_ngrams",
        "range_join_count", "q6_filter_agg", "length_percentiles",
        "topk_per_group",
        "bm25_topk", "hybrid_rrf", "semantic_dedup", "ccnet_bucket",
        "seq_pack", "mixture_sample", "bigram_logprob", "dsir_weights",
        "csv_source", "funnel_steps")) {
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
