package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the packed-PQ-code hypothesis behind the PLANS.md round-15
  * proposal: how much of the composable Catalyst path's coarse-scan cost
  * is parquet ARRAY decode of the `code` column, by scanning the same
  * (id, code, cluster_id) data in three layouts at the 35M chunk shape
  * (~1.5M probed rows per query):
  *
  *   a) `array<int>` of m — the current coded-table layout
  *   b) one BIGINT packing 8 code bytes (m = 8, the 35M geometry)
  *
  * (A third `binary`-of-m-bytes variant existed in r14 but was built via
  * chr()/concat_ws — code bytes >= 128 became 2-byte UTF-8 sequences, so
  * its numbers were not byte-exact comparable; dropped rather than fixed,
  * since the arr-vs-packed comparison is the decision-carrying one.)
  *
  * Each scan runs the same work shape as the ADC loop's input side: read
  * every element of every code, fold into a long, aggregate — so decode +
  * per-row materialization dominate, kernel cost is identical. Prints one
  * JSON line with p50 per layout over `reps` runs.
  *
  * Env: GRAFT_CLP_N (5,000,000 rows), GRAFT_CLP_M (8), GRAFT_CLP_REPS (7),
  * SPARK_GRAFT_CPUS (32).
  */
object CodeLayoutProfile {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_CLP_N", "5000000").toLong
    val m = sys.env.getOrElse("GRAFT_CLP_M", "8").toInt
    val reps = sys.env.getOrElse("GRAFT_CLP_REPS", "7").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    require(m <= 8, "packed-BIGINT variant models m <= 8 (the 35M geometry)")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-clp").toString
    // deterministic codes: byte j of row i = hash mix, same values in all
    // three layouts so compressed sizes are comparable
    val base = spark.range(0L, n, 1L, 64).select(
      col("id"),
      expr(s"transform(sequence(0, ${m - 1}), " +
        "j -> cast(pmod(hash(id, j), 256) as int))").as("code"),
      pmod(hash(col("id")), lit(91008)).cast("int").as("cluster_id"))
    base.write.mode("overwrite").parquet(s"$root/arr")
    base.select(col("id"),
      expr(s"aggregate(sequence(0, ${m - 1}), 0L, " +
        "(acc, j) -> acc + (shiftleft(cast(pmod(hash(id, j), 256) as bigint), 8 * j)))")
        .as("code"),
      col("cluster_id")).write.mode("overwrite").parquet(s"$root/packed")

    def sizeMb(dir: String): Long = {
      var b = 0L
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(root, dir))
      try w.forEach(p => if (p.toString.endsWith(".parquet"))
        b += java.nio.file.Files.size(p))
      finally w.close()
      b / 1024 / 1024
    }

    def p50(body: => Unit): Double = {
      val xs = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }.sorted
      xs(reps / 2)
    }

    // the ADC input shape: touch every code byte of every row
    val arrMs = p50 {
      spark.read.parquet(s"$root/arr")
        .select(expr("aggregate(code, 0L, (a, x) -> a + x)").as("s"))
        .agg(sum("s")).collect()
    }
    val packedMs = p50 {
      spark.read.parquet(s"$root/packed")
        .select(expr((0 until m).map(j =>
          s"(shiftright(code, ${8 * j}) & 255)").mkString(" + ")).as("s"))
        .agg(sum("s")).collect()
    }
    println(s"""{"n":$n,"m":$m,"reps":$reps,""" +
      s""""arr_ms_p50":${"%.0f".format(arrMs)},"arr_mb":${sizeMb("arr")},""" +
      s""""packed_ms_p50":${"%.0f".format(packedMs)},"packed_mb":${sizeMb("packed")},""" +
      s""""kernel_canary_rows_per_sec":${graft.Canary.kernelCanaryRowsPerSec()}}""")
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    spark.stop()
  }
}
