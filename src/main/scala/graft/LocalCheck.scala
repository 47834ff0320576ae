package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Builder-side subset of [[Verify]]: run only the named queries and dump
  * only their oracle SQL (from the static map — no trained-fixture build),
  * for a fast local DuckDB compare while iterating on a new oracle row.
  *
  * Usage: runMain graft.LocalCheck <sfDir> <outDir> <query> [query ...]
  */
object LocalCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSet
    require(names.nonEmpty, "pass at least one query name")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => names(kv._1)).foreach { case (name, fn) =>
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // dynamic (trained-fixture) oracle rows register their SQL as a side
    // effect of the query running above, so merge them in after the dumps
    val json = (SparkEntry.staticOracleSql ++
      graft.queries.TrainedFixture.oracleSql.toMap).filter(kv => names(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
