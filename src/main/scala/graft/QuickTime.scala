package graft
import org.apache.spark.sql.SparkSession

/** Diagnosis-only timing loop: run the named queries N times each in a
  * bench-shaped session and print every timing — no canary wait, no
  * engine prewarm (each query builds exactly the shared artifacts it
  * consumes, untimed, on the warmup pass). NOT a bench artifact: use for
  * same-window A/B attribution only; comparable numbers come from
  * graft.Bench.
  *
  * Usage: QuickTime <sfDir> <repeat> <query> [query ...]
  */
object QuickTime {
  def main(args: Array[String]): Unit = {
    val fresh = args.contains("--fresh") // rebuild sharedFrame artifacts per run
    val rest = args.filterNot(_ == "--fresh")
    val sfDir = rest(0)
    val repeat = rest(1).toInt
    val names = rest.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"[qt] kernel_canary ${Canary.kernelCanaryRowsPerSec()}%.0f rows/s")
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        System.err.println(s"[qt] warmup failed $n: $e") } // warmup untimed
      for (r <- 1 to repeat) {
        if (fresh) graft.queries.Queries.clearShared(spark)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"[qt] $n run $r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    println(f"[qt] kernel_canary_end ${Canary.kernelCanaryRowsPerSec()}%.0f rows/s")
    spark.stop()
  }
}
