package graft

import org.apache.spark.sql.functions._

/** Empirical safety gate for the pushed-In chunk size. The coded-table
  * probe scan pushes `cluster_id IN (…)` to parquet, which parquet-mr
  * evaluates as a LEFT-NESTED OR CHAIN — visitor recursion one frame per
  * value. A 40k-value push killed every scan task at the 35M geometry
  * (r9 finding, Engine.scala pushdown comment), and measurement HERE
  * shows 2048 already overflows on this JVM's default task stacks — so
  * Engine.probePushChunk = 500 is pinned by physics, not taste: the
  * r14 planning-floor work CANNOT simply widen chunks to cut per-scan
  * setup cost. This spec keeps both facts executable.
  */
class PushdownDepthSpec extends SparkSpec {

  import spark.implicits._

  test("pushed In: 512-value chunks are safe; 2048 overflows the OR-chain — the chunk bound is real") {
    val dir = tmpDir("graft-pushdepth")
    // sorted key → page stats prune; 200k rows, 512-row pages
    spark.range(0, 200000, 1, 4)
      .select((col("id") / 8).cast("int").as("k"), col("id").as("v"))
      .sortWithinPartitions("k")
      .write.mode("overwrite").parquet(dir)
    val old = spark.conf.get("spark.sql.parquet.pushdown.inFilterThreshold")
    def countWith(nVals: Int): Long = {
      val keys = (0 until nVals).map(i => Integer.valueOf(i * 3))
      val df = spark.read.parquet(dir).filter(col("k").isin(keys: _*))
      // the filter must actually reach parquet (not fall back to a
      // post-scan-only filter) — otherwise this spec guards nothing
      val scanMeta = df.queryExecution.executedPlan.toString()
      assert(scanMeta.contains("PushedFilters: [In(k,"),
        s"In($nVals values) was not pushed:\n${scanMeta.take(500)}")
      df.count()
    }
    try {
      spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "4096")
      // the engine's actual chunk size (Engine.probePushChunk = 500,
      // threshold 512) must evaluate safely, with page pruning intact
      val got = countWith(512)
      assert(got == (0 until 512).map(_ * 3).count(_ < 25000).toLong * 8)
      // 2048 values overflow parquet-mr's recursive OR-chain visitor on
      // this JVM's default task stacks — measured HERE so a future bump
      // of probePushChunk past the safe bound fails in seconds, not at
      // the 35M geometry (r9 lost a full eval run to exactly this)
      val boom = intercept[org.apache.spark.SparkException] { countWith(2048) }
      assert(boom.getMessage != null)
    } finally spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", old)
  }
}
