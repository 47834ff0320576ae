package graft

import org.apache.spark.sql.functions._

/** Gate for the conf-injected parquet FilterPredicate mechanism behind
  * the serving coarse scans (Engine.injectedIntInOptions +
  * Engine.withReadOptions): a pre-serialized native `In` carried in the
  * relation's READ OPTIONS — with Spark-side parquet pushdown OFF —
  * must still engage parquet row-group/page pruning at the reader, and
  * results must stay exact. This is the structural replacement for
  * Spark's per-file predicate rebuild (O(terms²) toString + gzip/Java
  * serialize per reader init — the r15 ChunkCpuProfile attribution of
  * ~99.6% of coarse-scan task CPU).
  */
class InjectedPredicateSpec extends SparkSpec {

  private val N = 100000
  private lazy val dir: String = {
    val d = tmpDir("graft-injpred")
    // one file, cluster_id-sorted, 512-row pages — the coded layout's
    // page geometry (Engine.writeCodedRows)
    spark.range(N)
      .select((col("id") / 64).cast("int").as("cluster_id"), col("id").as("v"))
      .coalesce(1).sortWithinPartitions("cluster_id")
      .write.option("parquet.page.row.count.limit", "512")
      .option("parquet.page.size.row.check.min", "1")
      .parquet(d + "/t")
    d + "/t"
  }

  private lazy val noPush = {
    val s = spark.newSession()
    s.conf.set("spark.sql.parquet.filterPushdown", "false")
    s.conf.set("spark.sql.optimizer.inSetConversionThreshold", "1")
    s.conf.set("spark.sql.optimizer.inSetSwitchThreshold", "0")
    s
  }

  private val wanted = Array(3, 310, 771, 1519) // cluster ids, spread out

  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // run first: metrics fill on execution
    df.queryExecution.executedPlan.collectLeaves()
      .map(_.metrics("numOutputRows").value).sum
  }

  test("injected or-of-eq predicate prunes pages with Spark-side pushdown off") {
    val inj = graft.core.Engine.injectedIntInOptions("cluster_id", wanted)
    val df = noPush.read.options(inj).parquet(dir)
      .filter(col("cluster_id").isInCollection(
        wanted.toIndexedSeq.map(Integer.valueOf)))
    val rows = df.collect()
    assert(rows.length == wanted.length * 64, "row-level exactness")
    // NOTE: the scan's "PushedFilters" metadata string is display-only —
    // FileSourceScanExec prints the translated data filters whether or
    // not the session's parquet pushdown flag lets the reader use them.
    // The control test below proves the flag is live at runtime (scan
    // outputs every row without injection); here the reader must have
    // pruned to a page-granular superset of the
    // 4×64 = 256 selected rows, not the 100k-row file: 4 clusters hit
    // ≤ 8 pages of ≤512 rows each (a cluster can straddle a page edge)
    val out = scanOutputRows(df)
    assert(out <= 8 * 512,
      s"injected predicate did not prune: scan output $out of $N rows")
    assert(out >= wanted.length * 64, "pruned below the matching rows")
  }

  test("control: same session without injection decodes the whole file") {
    val df = noPush.read.parquet(dir)
      .filter(col("cluster_id").isInCollection(
        wanted.toIndexedSeq.map(Integer.valueOf)))
    assert(df.collect().length == wanted.length * 64)
    assert(scanOutputRows(df) == N,
      "pushdown-off control should output every row at the scan")
  }

  test("withReadOptions rewrites every parquet relation and preserves output") {
    val base = noPush.read.parquet(dir)
    val inj = graft.core.Engine.injectedIntInOptions("cluster_id", wanted)
    val plan = graft.core.Engine.withReadOptions(
      base.queryExecution.analyzed, inj)
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val rels = plan.collect { case lr: LogicalRelation => lr }
    assert(rels.nonEmpty)
    rels.foreach { lr =>
      val opts = lr.relation.asInstanceOf[HadoopFsRelation].options
      assert(opts.contains(
        org.apache.parquet.hadoop.ParquetInputFormat.FILTER_PREDICATE))
    }
    assert(plan.output == base.queryExecution.analyzed.output,
      "output attributes must be preserved (branch Filters bind to them)")
  }
}
