package graft.core

import java.util.concurrent.atomic.AtomicInteger

import scala.util.Random

import org.apache.spark.sql.SparkSession

/** Same-JVM interleaved A/B of the prepared handle's wave batching
  * against the one-job-per-query shape (r18): OFF,ON,OFF,ON... rounds of
  * 16-thread qps against a KEPT trained root, with a bit-equality gate
  * first. Interleaved same-JVM rounds are the only comparison shape this
  * box admits in degraded windows (PLANS.md round-16 methodology).
  *
  * Args: <root> [db=scale] [d=64] [rounds=3]. Env: SPARK_GRAFT_CPUS.
  */
object WaveQpsProfile {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val db = if (args.length > 1) args(1) else "scale"
    val d = if (args.length > 2) args(2).toInt else 64
    val rounds = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val engine = new Engine(spark, root)
    val (k0, w0) = graft.Canary.awaitHealthyKernel("waveqps-start")
    println(s"kernel_canary_start=$k0 waited_s=$w0 " +
      s"kernel_canary_16t_start=${graft.Canary.kernelCanaryMultiRowsPerSec(16)}")
    val prep = engine.prepareServing(db)
    val rnd = new Random(123)
    val totalQ = 96
    val qpool = Array.fill(totalQ)(Array.fill(d)(rnd.nextGaussian().toFloat))
    // equality gate: every pooled query bit-equal across shapes
    prep.waveServe = false
    val off0 = qpool.take(4).map(q => prep.query(q, 500, 50).toSeq).toSeq
    prep.waveServe = true
    val on0 = qpool.take(4).map(q => prep.query(q, 500, 50).toSeq).toSeq
    println(s"wave_matches_single=${off0 == on0}")
    def qps(): Double = {
      val idx = new AtomicInteger(0)
      val c0 = System.nanoTime()
      val ts = (0 until 16).map { _ =>
        val t = new Thread(() => {
          var i = idx.getAndIncrement()
          while (i < totalQ) { prep.query(qpool(i), 500, 50); i = idx.getAndIncrement() }
        })
        t.setDaemon(true); t.start(); t
      }
      ts.foreach(_.join())
      totalQ / ((System.nanoTime() - c0) / 1e9)
    }
    prep.waveServe = true; qps() // warm both shapes (JIT + block touch)
    prep.waveServe = false; qps()
    val rows = (1 to rounds).map { r =>
      prep.waveServe = false
      val off = qps()
      prep.waveServe = true
      val on = qps()
      println(f"round $r: qps_off=$off%.1f qps_on=$on%.1f")
      (off, on)
    }
    println(f"waveqps rounds (off,on): ${rows.map { case (a, b) =>
      f"($a%.1f,$b%.1f)" }.mkString(" ")}")
    println(f"kernel_canary_end=${graft.Canary.kernelCanaryRowsPerSec()} " +
      f"kernel_canary_16t_end=${graft.Canary.kernelCanaryMultiRowsPerSec(16)}")
    prep.close()
    spark.stop()
  }
}
