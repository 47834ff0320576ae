package graft.core

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for the COMPOSABLE Catalyst trained-query path's
  * planning floor (VERDICT r13 "what's wrong" #2: `catalyst_query_ms_p50`
  * 1.1–1.3 s at 35M/5M-768, ~1 s of it before execution). The 35M plan
  * is an 8-chunk pushed-In union (nprobe 3561 / chunk 500); this main
  * reproduces that SHAPE on a small corpus by shrinking the chunk size,
  * so the per-stage costs — probe selection, coarse-plan construction
  * (analysis), coarse job, fetch+rerank construction, physical planning,
  * execution — can be measured in seconds, not eval-run hours. Analysis
  * and planning costs scale with TREE size and file count, not row
  * count, so the attribution transfers to the big geometries.
  *
  * No args. Prints one JSON line.
  */
object PlanFloorProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // experiment: force every literal-list predicate into the InSet
    // hash-set codegen path (values live in `references`, not in the
    // generated source) — if the floor is Janino recompiles from
    // query-varying literals, these two settings should collapse it
    if (sys.env.get("GRAFT_PF_INSET").contains("1")) {
      spark.conf.set("spark.sql.optimizer.inSetConversionThreshold", "0")
      spark.conf.set("spark.sql.optimizer.inSetSwitchThreshold", "0")
    }

    val root = java.nio.file.Files.createTempDirectory("graft-pfloor").toString
    // chunk=42 turns nprobe≈335 at 150k rows into the same 8-subtree
    // union the 35M geometry plans
    val engine = new Engine(spark, root) {
      override protected def probePushChunk: Int = 42
    }
    val d = 64
    val n = 150000
    val rnd = new Random(7)
    val centers = Array.fill(96, d)(rnd.nextGaussian().toFloat)
    engine.create("pf", vectorDimension = d)
    val rows = (0 until n).map { i =>
      val c = centers(i % 96)
      (c.map(x => x + 0.25f * rnd.nextGaussian().toFloat).toSeq, s"""{"i":$i}""")
    }
    engine.add("pf", rows.toDF("vector", "metadata")
      .select(col("vector").cast("array<float>").as("vector"), col("metadata")))
    engine.train("pf", kmeansIters = 4, seed = 7L)
    val doc = engine.load("pf")
    System.err.println(s"nlist=${doc.numClusters} nprobe=${doc.nProbe} " +
      s"shift=${doc.codedBucketShift}")

    val nQ = 12
    val qs = Array.fill(nQ)(Array.fill(d)(rnd.nextGaussian().toFloat))

    // warm: footer caches, codegen, broadcast
    engine.queryCatalyst("pf", qs(0), 500, 50).collect()
    engine.queryCatalyst("pf", qs(1), 500, 50).collect()

    def p50(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    // end-to-end split, same probe points as ScaleEval
    val model = engine.indexModel(doc)
    val splits = qs.toIndexedSeq.map { q =>
      val t0 = System.nanoTime()
      val df = engine.queryCatalyst("pf", q, 500, 50)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.collect()
      val t3 = System.nanoTime()
      ((t1 - t0) / 1e6, (t2 - t1) / 1e6, (t3 - t2) / 1e6)
    }

    // inner-stage attribution of the queryCatalyst() call itself
    val inner = qs.toIndexedSeq.map { q =>
      val a0 = System.nanoTime()
      val qn = q // normalization cost negligible; skip
      val qp = model.pca.applyLocal(qn)
      val probes = model.nearestClusters(qp, doc.nProbe)
      val a1 = System.nanoTime()
      val chunks = engine.prunedLiveCodedChunks(doc, probes) // chunk plans (analysis)
      val a2 = System.nanoTime()
      val candRows = graft.operators.BatchANN.coarseSingleChunked(
        spark, chunks, engine.modelBroadcast(doc), qp, probes, 500)
      val a3 = System.nanoTime()
      val fetched = engine.prunedLiveCoded(doc, candRows.map(_._3).distinct)
        .select("id", "vector", "metadata")
        .filter(col("id").isInCollection(
          candRows.map(r => java.lang.Long.valueOf(r._1)).toIndexedSeq))
      val a4 = System.nanoTime()
      fetched.collect()
      val a5 = System.nanoTime()
      IndexedSeq((a1 - a0) / 1e6, (a2 - a1) / 1e6, (a3 - a2) / 1e6,
        (a4 - a3) / 1e6, (a5 - a4) / 1e6, 0.0)
    }

    // split the coarse stage's pre-collect cost: analysis vs optimizer
    // vs physical planning (each phase forced separately)
    val phases = qs.toIndexedSeq.map { q =>
      val qp = model.pca.applyLocal(q)
      val probes = model.nearestClusters(qp, doc.nProbe)
      val b0 = System.nanoTime()
      val live = engine.prunedLiveCoded(doc, probes)
      // the exact scan coarseCandidates plans internally (BatchANN:63)
      val src = live.select(col("id").cast("long"),
        col("cluster_id").cast("int"), col("code"))
      val qe = src.queryExecution
      qe.analyzed
      val b1 = System.nanoTime()
      qe.optimizedPlan
      val b2 = System.nanoTime()
      qe.sparkPlan
      val b3 = System.nanoTime()
      qe.executedPlan
      val b4 = System.nanoTime()
      val rdd = qe.toRdd
      rdd.partitions // force RDD build: listFiles + FilePartitions
      val b45 = System.nanoTime()
      rdd.count()
      val b5 = System.nanoTime()
      qe.toRdd.count() // SAME plan again: pure job cost, no codegen/setup
      val b6 = System.nanoTime()
      IndexedSeq((b1 - b0) / 1e6, (b2 - b1) / 1e6, (b3 - b2) / 1e6,
        (b45 - b4) / 1e6, (b5 - b45) / 1e6, (b6 - b5) / 1e6)
    }

    // sampling mode: loop the rddbuild-dominated phase so `jstack` can
    // attribute the per-scan setup cost
    if (sys.env.get("GRAFT_PF_LOOP").contains("1")) {
      System.err.println("[pfloor] entering rddbuild sampling loop")
      var i = 0
      while (true) {
        val q = qs(i % nQ); i += 1
        val qp = model.pca.applyLocal(q)
        val probes = model.nearestClusters(qp, doc.nProbe)
        val live = engine.prunedLiveCoded(doc, probes)
        val src = live.select(col("id").cast("long"),
          col("cluster_id").cast("int"), col("code"))
        src.queryExecution.toRdd.partitions
      }
    }

    // same-query repeats: identical literals → identical codegen sources.
    // If this is much faster than the fresh-query p50, the floor is
    // literal-varying codegen; if equal, it is per-plan setup.
    val sameQ = (0 until 6).map { _ =>
      val t0 = System.nanoTime()
      engine.queryCatalyst("pf", qs(0), 500, 50).collect()
      (System.nanoTime() - t0) / 1e6
    }

    def col50(i: Int): Double = p50(inner.map(_(i)))
    println(f"""{"n":$n,"nlist":${doc.numClusters},"nprobe":${doc.nProbe},""" +
      f""""chunks":${math.ceil(doc.nProbe / 42.0).toInt},""" +
      f""""construct_ms_p50":${p50(splits.map(_._1))}%.0f,""" +
      f""""force_plan_ms_p50":${p50(splits.map(_._2))}%.0f,""" +
      f""""exec_ms_p50":${p50(splits.map(_._3))}%.0f,""" +
      f""""probe_select_ms":${col50(0)}%.1f,""" +
      f""""union_construct_ms":${col50(1)}%.1f,""" +
      f""""coarse_single_ms":${col50(2)}%.1f,""" +
      f""""fetch_construct_ms":${col50(3)}%.1f,""" +
      f""""fetch_job_ms":${col50(4)}%.1f,""" +
      f""""coarse_analyze_ms":${p50(phases.map(_(0)))}%.1f,""" +
      f""""coarse_optimize_ms":${p50(phases.map(_(1)))}%.1f,""" +
      f""""coarse_sparkplan_ms":${p50(phases.map(_(2)))}%.1f,""" +
      f""""coarse_rddbuild_ms":${p50(phases.map(_(3)))}%.1f,""" +
      f""""coarse_run_ms":${p50(phases.map(_(4)))}%.1f,""" +
      f""""coarse_rerun_ms":${p50(phases.map(_(5)))}%.1f,""" +
      f""""same_query_repeat_ms_p50":${p50(sameQ.drop(1))}%.1f}""")
    spark.stop()
  }
}
