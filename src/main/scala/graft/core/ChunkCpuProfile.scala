package graft.core

import scala.util.Random

import org.apache.spark.sql.SparkSession

/** WHERE does the composable path's task CPU actually go? EVAL_r14
  * measured ~16.7 s of task-CPU per catalyst query at 35M across 141
  * tasks on 22 MB of input — ~11 µs per probed row, 200× the raw
  * vectorized decode+filter cost ScanFilterProfile measured for the same
  * row shape (45-50 ns). Three r14 negative results (array-vs-packed
  * layout parity, page-size insensitivity at the 4M proxy, vectorized
  * reader confirmed ON) killed every data-plane hypothesis, which leaves
  * the CONTROL plane: something evaluated per task whose cost scales
  * with file metadata, not rows.
  *
  * This main answers it empirically: against a KEPT root (RootBuild) it
  * loops the real pruned chunk scans' count() — decode + pushed filter,
  * no kernel — while an in-process sampler tallies the stack frames of
  * the executor task threads every ~5 ms. The top frames name the
  * burner directly (page-index RowRanges vs parquet decode vs codegen vs
  * broadcast). Args: <root> [db] [d] [seconds].
  */
object ChunkCpuProfile {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val db = if (args.length > 1) args(1) else "scale"
    val d = if (args.length > 2) args(2).toInt else 64
    val secs = if (args.length > 3) args(3).toInt else 25
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val engine = new Engine(spark, root)
    // A/B knobs over the pushed-filter shape (the r15 attribution showed
    // ~99.6% of the coarse scan's task CPU is per-task filter PLUMBING —
    // FilterPredicate.toString + gzip/Java-serialization into the cloned
    // Hadoop conf — scaling with or-chain terms × tasks, NOT row decode):
    //   GRAFT_CCP_THRESHOLD: spark.sql.parquet.pushdown.inFilterThreshold
    //     (512 = engine default, or-chain; below the probe count the push
    //     degrades to a range → tiny predicate, no page pruning)
    //   GRAFT_CCP_MAXPART: spark.sql.files.maxPartitionBytes (tasks/chunk)
    //   GRAFT_CCP_PUSHDOWN: spark.sql.parquet.filterPushdown
    sys.env.get("GRAFT_CCP_THRESHOLD").foreach(v =>
      spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", v))
    sys.env.get("GRAFT_CCP_MAXPART").foreach(v =>
      spark.conf.set("spark.sql.files.maxPartitionBytes", v))
    sys.env.get("GRAFT_CCP_PUSHDOWN").foreach(v =>
      spark.conf.set("spark.sql.parquet.filterPushdown", v))
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
    val taskCpu = new java.util.concurrent.atomic.AtomicLong(0L)
    val taskCount = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (e.taskMetrics != null) {
          bytesRead.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
          taskCpu.addAndGet(e.taskMetrics.executorCpuTime / 1000000L)
          taskCount.incrementAndGet()
        }
      }
    })
    val doc = engine.load(db)
    val model = engine.indexModel(doc)
    val rnd = new Random(123)
    val q = Array.fill(d)(rnd.nextGaussian().toFloat)
    val qp = model.pca.applyLocal(q)
    val probes = model.nearestClusters(qp, doc.nProbe)
    val chunks = engine.prunedLiveCodedChunks(doc, probes)
    println(s"nlist=${doc.numClusters} nprobe=${doc.nProbe} chunks=${chunks.length}")
    if (sys.env.contains("GRAFT_CCP_EXPLAIN")) {
      val ss = engine.servingSession
      println(s"serving confs: pushdown=${ss.conf.get("spark.sql.parquet.filterPushdown")} " +
        s"inThr=${ss.conf.get("spark.sql.parquet.pushdown.inFilterThreshold")} " +
        s"maxPart=${ss.conf.get("spark.sql.files.maxPartitionBytes")}")
      println(chunks.head.select("id", "cluster_id", "code")
        .queryExecution.executedPlan.toString.take(2500))
    }
    chunks.foreach(_.select("id", "cluster_id", "code").count()) // warm
    bytesRead.set(0L); taskCpu.set(0L); taskCount.set(0L)
    val wall0 = System.nanoTime()

    // sampler: tally the TOP frame and the top N frames of every
    // executor task thread (named "Executor task launch worker-*")
    val tally = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    val deepTally = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val all = Thread.getAllStackTraces
        all.forEach { (t, frames) =>
          if (t.getName.startsWith("Executor task launch worker") &&
              t.getState == Thread.State.RUNNABLE && frames.nonEmpty) {
            // leaf frame
            val leaf = frames(0)
            tally.merge(s"${leaf.getClassName}.${leaf.getMethodName}", 1L, _ + _)
            // first parquet/spark-meaningful frame in the top 25: the
            // leaf is often a JDK primitive — attribute to the library
            // layer driving it
            val own = frames.take(25).find { f =>
              val c = f.getClassName
              c.startsWith("org.apache.parquet") ||
                c.startsWith("org.apache.spark.sql.execution.datasources") ||
                c.startsWith("graft")
            }
            own.foreach(f => deepTally.merge(
              s"${f.getClassName}.${f.getMethodName}:${f.getLineNumber}", 1L, _ + _))
          }
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val deadline = System.nanoTime() + secs * 1000L * 1000 * 1000
    var loops = 0
    var rows = 0L
    while (System.nanoTime() < deadline) {
      chunks.foreach(c => rows += c.select("id", "cluster_id", "code").count())
      loops += 1
    }
    sampling = false
    Thread.sleep(50)

    // ---- freshness split: the real per-query coarse with FRESH chunk
    // frames (new probes each round, like the serving path), stages
    // timed — chunk-frame build / per-chunk executedPlan+toRdd (on the
    // runner threads, concurrent) / the kernel runJob / driver merge.
    {
      val bc = engine.modelBroadcast(doc)
      (0 until 10).foreach { i =>
        val qi = Array.fill(d)(rnd.nextGaussian().toFloat)
        val qpi = model.pca.applyLocal(qi)
        val probesI = model.nearestClusters(qpi, doc.nProbe)
        val t0 = System.nanoTime()
        val cs = engine.prunedLiveCodedChunks(doc, probesI)
        val t1 = System.nanoTime()
        // pre-plan each chunk concurrently (select+executedPlan+toRdd)
        val rdds = new Array[org.apache.spark.rdd.RDD[
          org.apache.spark.sql.catalyst.InternalRow]](cs.length)
        val planThreads = cs.zipWithIndex.map { case (c, j) =>
          val t = new Thread(() => {
            rdds(j) = c.select(org.apache.spark.sql.functions.col("id"),
              org.apache.spark.sql.functions.col("cluster_id"),
              org.apache.spark.sql.functions.col("code"))
              .queryExecution.toRdd
          })
          t.setDaemon(true); t.start(); t
        }
        planThreads.foreach(_.join())
        val t2 = System.nanoTime()
        val cands = graft.operators.BatchANN.coarseSingleChunked(
          spark, cs, bc, qpi, probesI, 500)
        val t3 = System.nanoTime()
        println(f"fresh#$i chunks_ms=${(t1 - t0) / 1e6}%.0f " +
          f"plan_toRdd_ms=${(t2 - t1) / 1e6}%.0f " +
          f"coarse_after_preplan_ms=${(t3 - t2) / 1e6}%.0f cands=${cands.length}")
      }
    }

    val wallS = (System.nanoTime() - wall0) / 1e9
    Thread.sleep(200) // drain straggler task-end events
    // the real serving shape: all chunk jobs CONCURRENT (p50 of 5 rounds)
    val concMs = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      val ts = chunks.map { c =>
        val t = new Thread(() => { c.select("id", "cluster_id", "code").count(); () })
        t.setDaemon(true); t.start(); t
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e6
    }.sorted.apply(2)
    println(f"concurrent_chunk_counts_p50_ms=$concMs%.0f")
    println(s"loops=$loops rows_counted=$rows")
    println(f"per_loop_wall_ms=${wallS * 1000 / math.max(1, loops)}%.0f " +
      f"input_mb_per_loop=${bytesRead.get / 1e6 / math.max(1, loops)}%.1f " +
      f"task_cpu_ms_per_loop=${taskCpu.get / math.max(1, loops)} " +
      f"tasks_per_loop=${taskCount.get / math.max(1, loops)}")
    def top(m: java.util.concurrent.ConcurrentHashMap[String, java.lang.Long],
            tag: String): Unit = {
      val entries = new java.util.ArrayList(m.entrySet())
      entries.sort((a, b) => java.lang.Long.compare(b.getValue, a.getValue))
      println(s"---- $tag ----")
      entries.forEach { e =>
        if (e.getValue >= 5) println(f"${e.getValue}%6d  ${e.getKey}")
      }
    }
    top(tally, "leaf frames (sampled RUNNABLE executor threads)")
    top(deepTally, "owning library frames (first parquet/datasources/graft in top 25)")
    spark.stop()
  }
}
