package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession

import graft.core.Engine

/** Stage-level profile of one trained single query against an existing
  * engine root (e.g. a ScaleEval temp dir kept on disk) — splits the
  * regular path's wall time into probe selection, the coarse ADC scan,
  * and the full query (coarse + candidate fetch + rerank), so a p50
  * regression at a new geometry can be attributed to a stage instead of
  * guessed at. Args: <root> <db> [d] [nQ].
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val db = if (args.length > 1) args(1) else "scale"
    val d = if (args.length > 2) args(2).toInt else 32
    val nQ = if (args.length > 3) args(3).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val engine = new Engine(spark, root)
    val doc = engine.load(db)
    println(s"db=$db nlist=${doc.numClusters} nprobe=${doc.nProbe} shift=${doc.codedBucketShift}")

    val rnd = new Random(123)
    val queries = Array.fill(nQ)(Array.fill(d)(rnd.nextGaussian().toFloat))

    // warm-up one full query (footer caches, codegen)
    engine.query(db, queries(0), 500, 50).collect()

    // routed (default) path end-to-end, then the Catalyst plan path split
    queries.zipWithIndex.foreach { case (q, i) =>
      val r0 = System.nanoTime()
      engine.query(db, q, 500, 50).collect()
      println(f"q$i routed: ${(System.nanoTime() - r0) / 1e6}%.0f ms")
    }
    queries.zipWithIndex.foreach { case (q, i) =>
      val t0 = System.nanoTime()
      val df = engine.queryCatalyst(db, q, 500, 50)
      df.queryExecution.executedPlan
      val t1 = System.nanoTime()
      val n = df.collect().length
      val t2 = System.nanoTime()
      println(f"q$i: plan ${(t1 - t0) / 1e6}%.0f ms  exec ${(t2 - t1) / 1e6}%.0f ms  rows $n")
    }

    // the coarse ADC scan alone, via the batch entry with one query
    import spark.implicits._
    val qdf = Seq((0L, queries(0).toSeq)).toDF("query_id", "qvec")
    val b0 = System.nanoTime()
    val bn = engine.queryBatchTrained(db, qdf, 500, 50).collect().length
    println(f"batch(1 query): ${(System.nanoTime() - b0) / 1e6}%.0f ms  rows $bn")

    // amortization shape: 16 queries through one batch call
    val q16 = Array.fill(16)(Array.fill(d)(rnd.nextGaussian().toFloat))
    val qdf16 = q16.zipWithIndex.map { case (q, i) => (i.toLong, q.toSeq) }
      .toSeq.toDF("query_id", "qvec")
    val b16 = System.nanoTime()
    val bn16 = engine.queryBatchTrained(db, qdf16, 500, 50).collect().length
    val b16s = (System.nanoTime() - b16) / 1e9
    println(f"batch(16 queries): ${b16s}%.2f s  (${b16s * 1000 / 16}%.0f ms/query)  rows $bn16")

    // concurrent serving: 16 caller threads x single queries
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    val tasks = (0 until 32).map { qi =>
      new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          engine.query(db, queries(qi % queries.length), 500, 50).collect(); 1L
        }
      }
    }
    val c0 = System.nanoTime()
    pool.invokeAll(new java.util.ArrayList(scala.jdk.CollectionConverters
      .SeqHasAsJava(tasks).asJava)).forEach(f => f.get())
    val cS = (System.nanoTime() - c0) / 1e9
    pool.shutdown()
    println(f"concurrent: 32 queries / 16 threads in $cS%.1f s = ${32 / cS}%.2f qps")
    println(s"kernel_canary_rows_per_sec=${Canary.kernelCanaryRowsPerSec()}")

    println(engine.queryCatalyst(db, queries(0), 500, 50).queryExecution
      .executedPlan.toString.take(6000))
    spark.stop()
  }
}
