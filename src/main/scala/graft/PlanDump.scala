package graft
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for every declared query to
  * plans/<tag>/<name>_<suffix>.txt — the optimization round's
  * before/after plan evidence. Bench-shaped session (same shuffle
  * partitions / nanosAsLong) so the plans match what the bench runs.
  *
  * Usage: PlanDump <sfDir> <outDir> <suffix> [query ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val only: Set[String] = args.drop(3).toSet
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter(kv => only(kv._1))
    for ((name, fn) <- selected) {
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plandump] wrote $name")
      } catch {
        case e: Throwable => System.err.println(s"[plandump] FAILED $name: $e")
      }
    }
    spark.stop()
  }
}
