package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Engine

/** Isolates `Engine.add` at the ScaleEval corpus shape — the r14 A/B
  * harness for the 35M add_sec discrepancy (r12/r13 artifacts: ~40 s;
  * r14 wave-1 and the quiet re-run: ~285 s; same add code by diff).
  * Runs the exact ScaleEval generation + add, splits generation cost
  * (one cached count) from the engine add, and reports the write volume.
  *
  * Env: GRAFT_ADD_N (16,000,000), GRAFT_ADD_D (64), SPARK_GRAFT_CPUS (32).
  */
object AddProfile {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_ADD_N", "16000000").toLong
    val d = sys.env.getOrElse("GRAFT_ADD_D", "64").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val seed = 42L
    val rnd = new Random(seed)
    val numCenters = math.max(10, (n / 500).toInt)
    val centers = Array.fill(numCenters, d)(rnd.nextGaussian().toFloat)
    val bcCenters = spark.sparkContext.broadcast(centers)
    val root = java.nio.file.Files.createTempDirectory("graft-addprof").toString
    val engine = new Engine(spark, root)
    engine.create("ap", vectorDimension = d)

    val corpus = spark.range(0L, n, 1L, 64)
      .map(i => (ScaleEval.rowVector(i, bcCenters.value, d, seed).toSeq, s"""{"i":$i}"""))
      .toDF("vector", "metadata")
      .select(col("vector").cast("array<float>").as("vector"), col("metadata"))

    // generation-only cost: one full pass without engine involvement
    val g0 = System.nanoTime()
    val genRows = corpus.count()
    val genSec = (System.nanoTime() - g0) / 1e9

    val a0 = System.nanoTime()
    engine.add("ap", corpus)
    val addSec = (System.nanoTime() - a0) / 1e9

    var bytes = 0L
    val w = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
    try w.forEach(p => if (p.toString.endsWith(".parquet"))
      bytes += java.nio.file.Files.size(p))
    finally w.close()

    println(s"""{"n":$n,"d":$d,"gen_rows":$genRows,""" +
      s""""gen_sec":${"%.1f".format(genSec)},""" +
      s""""add_sec":${"%.1f".format(addSec)},""" +
      s""""data_mb":${bytes / 1024 / 1024},""" +
      s""""kernel_canary_rows_per_sec":${Canary.kernelCanaryRowsPerSec()}}""")
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    spark.stop()
  }
}
