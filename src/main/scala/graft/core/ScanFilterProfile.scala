package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pins WHY the probed coarse scan costs ~11 µs of task-CPU per row at
  * the 35M geometry (EVAL_r14 catalyst attribution): the coded table's
  * `code` column is `array<int>`, and if the nested-column vectorized
  * parquet reader is off, the scan falls back to parquet-mr's
  * record-level reader — where the PUSHED ≤512-value `In` OR-chain is
  * evaluated per record. Measures the same pruned-scan shape under the
  * four (vectorized × pushdown) combinations and prints one JSON line.
  *
  * Env: GRAFT_SFP_N (4,000,000 rows), GRAFT_SFP_M (8), GRAFT_SFP_NLIST
  * (91008-like spread via hash), SPARK_GRAFT_CPUS (32).
  */
object ScanFilterProfile {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_SFP_N", "4000000").toLong
    val m = sys.env.getOrElse("GRAFT_SFP_M", "8").toInt
    val nlist = sys.env.getOrElse("GRAFT_SFP_NLIST", "91008").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // GRAFT_SFP_MINPART mirrors the serving session's packed splits
    // (files.minPartitionNum=1 → ~maxPartitionBytes slices spanning
    // several files) — tests whether parquet page pruning still engages
    // inside a packed multi-file split
    sys.env.get("GRAFT_SFP_MINPART").foreach(v =>
      spark.conf.set("spark.sql.files.minPartitionNum", v))

    val root = java.nio.file.Files.createTempDirectory("graft-sfp").toString
    // GRAFT_SFP_PAGE512=true writes the CODED TABLE's actual page
    // geometry (64 KB / 512-row pages, writeCodedRows) — the engine pays
    // page-header + decode-restart overhead per 512 rows for its page-
    // pruning precision, and this knob measures exactly that overhead
    val page512 = sys.env.getOrElse("GRAFT_SFP_PAGE512", "false").toBoolean
    val writer = spark.range(0L, n, 1L, 32).select(
      col("id"),
      expr(s"transform(sequence(0, ${m - 1}), " +
        "j -> cast(pmod(hash(id, j), 256) as int))").as("code"),
      pmod(hash(col("id")), lit(nlist)).cast("int").as("cluster_id"))
      .sortWithinPartitions("cluster_id")
      .write.mode("overwrite")
    (if (page512)
       writer.option("parquet.page.size", (64 * 1024).toString)
         .option("parquet.page.row.count.limit", "512")
     else writer).parquet(root)

    // a 500-value probe list, ~nprobe/nlist selectivity of the 35M shape
    val probes = (0 until 500).map(i => (i * 179) % nlist).distinct.sorted
      .map(Integer.valueOf)

    def timed(vectorized: Boolean, pushThreshold: Int): (Double, Long, String) = {
      spark.conf.set("spark.sql.parquet.enableNestedColumnVectorizedReader",
        vectorized.toString)
      spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold",
        pushThreshold.toString)
      val df = spark.read.parquet(root)
        .filter(col("cluster_id").isInCollection(probes))
        .select("id", "cluster_id", "code")
      val plan = df.queryExecution.executedPlan.toString
      val batched = if (plan.contains("ColumnarToRow")) "vectorized" else "row-based"
      df.count() // warm (file listing, footers)
      val xs = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        val c = df.agg(sum(expr("aggregate(code, 0L, (a, x) -> a + x)"))).collect()
        ((System.nanoTime() - t0) / 1e6, c)
      }
      val rows = df.count()
      (xs.map(_._1).min, rows, batched)
    }

    val offPush = timed(vectorized = false, pushThreshold = 512)
    val offNoPush = timed(vectorized = false, pushThreshold = 0)
    val onPush = timed(vectorized = true, pushThreshold = 512)
    val onNoPush = timed(vectorized = true, pushThreshold = 0)

    println(s"""{"n":$n,"m":$m,"probe_values":${probes.length},""" +
      s""""rows_selected":${onPush._2},""" +
      s""""nonvec_push_ms":${"%.0f".format(offPush._1)},"nonvec_push_mode":"${offPush._3}",""" +
      s""""nonvec_nopush_ms":${"%.0f".format(offNoPush._1)},""" +
      s""""vec_push_ms":${"%.0f".format(onPush._1)},"vec_push_mode":"${onPush._3}",""" +
      s""""vec_nopush_ms":${"%.0f".format(onNoPush._1)},""" +
      s""""default_nested_vectorized":"${spark.conf.getOption(
        "spark.sql.parquet.enableNestedColumnVectorizedReader").getOrElse("unset")}"}""")
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    spark.stop()
  }
}
