package graft.core

import java.util.concurrent.{Callable, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession

import graft.Canary

/** Measures the PLATFORM's concurrent small-job throughput floor — the
  * number VERDICT r17 next #5 asks the prepared-path qps gap to be
  * attributed against: `prepared_implied_cpu_max_qps` (cores /
  * per-query core-occupancy) reads 209–384 at 35M while measured qps is
  * 102–146, and the residual is either scheduler floor (unfixable from
  * this library without batching query waves) or our serve path's own
  * overhead (fixable).
  *
  * Shape: 16 caller threads × trivial `sc.runJob` over a cached
  * P-partition RDD whose tasks do ~nothing (so job submit + schedule +
  * task launch + result fetch is ALL that is measured), swept over P =
  * 1,2,4,8,16,32 — brackets the prepared serve job's task counts. If
  * jobs/sec at the serve's task count ≈ measured qps, the DAGScheduler
  * floor binds and wave-batching is the only lever; if jobs/sec ≫ qps,
  * the serve path itself has headroom.
  *
  * Prints one JSON line. Env: SPARK_GRAFT_CPUS (32), GRAFT_SF_THREADS
  * (16), GRAFT_SF_ROUNDS (jobs per thread per P, 40).
  */
object ServeFloorProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nThreads = sys.env.getOrElse("GRAFT_SF_THREADS", "16").toInt
    val rounds = sys.env.getOrElse("GRAFT_SF_ROUNDS", "40").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    val kernelSingle = Canary.kernelCanaryRowsPerSec()
    val kernel16 = Canary.kernelCanaryMultiRowsPerSec(16)

    def sweep(p: Int): Double = {
      val rdd = sc.parallelize(0 until p, p).cache()
      rdd.count() // materialize the cache
      // warmup wave
      (0 until 4).foreach(_ => sc.runJob(rdd, (it: Iterator[Int]) => it.size))
      val pool = Executors.newFixedThreadPool(nThreads)
      val total = nThreads * rounds
      val tasks = (0 until total).map { _ =>
        new Callable[Int] {
          def call(): Int = { sc.runJob(rdd, (it: Iterator[Int]) => it.size); 1 }
        }
      }
      val t0 = System.nanoTime()
      pool.invokeAll(new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(tasks).asJava)).forEach(f => f.get())
      val sec = (System.nanoTime() - t0) / 1e9
      pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)
      rdd.unpersist(true)
      total / sec
    }

    // payload sweep (r18c): same job shape, but each task returns a
    // REALISTIC serve result — a CandBatch of `cands` candidates (the
    // prepared path's per-partition wire format, prelimK=500 at 35M) —
    // so (payload − empty) prices the result serialize/fetch/deser
    // fan-in that the empty floor hides. The driver also runs the real
    // merge over the returned batches (sort of p·cands tuples), pricing
    // the last driver-side term of a serve.
    def sweepPayload(p: Int, cands: Int): Double = {
      val rdd = sc.parallelize(0 until p, p).cache()
      rdd.count()
      val mkBatch = (it: Iterator[Int]) => {
        val seed = it.next().toLong
        val ds = Array.tabulate(cands)(i => seed + i * 1e-6)
        val ids = Array.tabulate(cands)(i => seed * cands + i)
        val sims = Array.tabulate(cands)(i => 1.0 - i * 1e-6)
        val metas = Array.tabulate(cands)(i => (seed + i).toString)
        new graft.operators.PreparedANN.CandBatch(ds, ids, sims, metas)
      }
      (0 until 4).foreach(_ => sc.runJob(rdd, mkBatch))
      val pool = Executors.newFixedThreadPool(nThreads)
      val total = nThreads * rounds
      val tasks = (0 until total).map { _ =>
        new Callable[Int] {
          def call(): Int = {
            val batches = sc.runJob(rdd, mkBatch)
            // the serve path's driver merge shape: flatten + sort by
            // (dist, id) + take prelimK
            val merged = batches.iterator.flatMap { b =>
              Iterator.tabulate(b.ids.length)(i => (b.dists(i), b.ids(i)))
            }.toArray
            java.util.Arrays.sort(merged,
              Ordering.by[(Double, Long), (Double, Long)](identity))
            merged.take(cands).length
          }
        }
      }
      val t0 = System.nanoTime()
      pool.invokeAll(new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(tasks).asJava)).forEach(f => f.get())
      val sec = (System.nanoTime() - t0) / 1e9
      pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)
      rdd.unpersist(true)
      total / sec
    }

    val parts = Seq(1, 2, 4, 8, 16, 32)
    val results = parts.map(p => p -> sweep(p))
    val prelimK = sys.env.getOrElse("GRAFT_SF_CANDS", "500").toInt
    val payloadResults = Seq(8, 32).map(p => p -> sweepPayload(p, prelimK))
    val kernel16End = Canary.kernelCanaryMultiRowsPerSec(16)
    println(
      s"""{"threads":$nThreads,"rounds_per_thread":$rounds,""" +
        results.map { case (p, qps) =>
          s""""empty_jobs_per_sec_p$p":${"%.1f".format(qps)}"""
        }.mkString(",") + "," +
        payloadResults.map { case (p, qps) =>
          s""""payload${prelimK}_jobs_per_sec_p$p":${"%.1f".format(qps)}"""
        }.mkString(",") + "," +
        s""""kernel_canary_single":$kernelSingle,""" +
        s""""kernel_canary_16t":$kernel16,""" +
        s""""kernel_canary_16t_end":$kernel16End}""")
    spark.stop()
  }
}
