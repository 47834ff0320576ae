package graft.core

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution against a KEPT trained root (RootBuild) at the real
  * geometry — the two r14 questions PlanFloorProfile's small proxy could
  * not answer:
  *
  *  1. where do the ~900 ms of `queryCatalyst` p50 at 35M go, when the
  *     same stages cost ~180 ms at the 150k proxy (per-stage split below
  *     scales each candidate: probe select over the real nlist, chunk
  *     plan construction over the real file count, the concurrent coarse
  *     jobs over the real bytes, the fetch);
  *  2. why did ScaleEval's EXPLICIT prepared handle read 2.07 s p50
  *     sequential while its concurrent block served ~15 ms/query — the
  *     dual-handle scenario (auto-routed handle + prepareServing handle,
  *     two pinned block RDDs) is reproduced with RDD storage-info dumps
  *     before/after each loop so eviction/thrash is visible directly.
  *
  * Args: <root> [db] [d] [nQ]. Prints human lines, not an artifact row.
  */
object RootProfile {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val db = if (args.length > 1) args(1) else "scale"
    val d = if (args.length > 2) args(2).toInt else 64
    val nQ = if (args.length > 3) args(3).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val engine = new Engine(spark, root)
    val doc = engine.load(db)
    println(s"nlist=${doc.numClusters} nprobe=${doc.nProbe} " +
      s"shift=${doc.codedBucketShift} maxId=${doc.maxId}")
    val (k0, w0) = graft.Canary.awaitHealthyKernel("rootprofile-start")
    println(s"kernel_canary_start=$k0 waited_s=$w0")
    val rnd = new Random(123)
    val qs = Array.fill(nQ)(Array.fill(d)(rnd.nextGaussian().toFloat))
    def p50(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    def storage(tag: String): Unit = {
      val infos = spark.sparkContext.getRDDStorageInfo
      val mem = infos.map(_.memSize).sum / 1e9
      val dsk = infos.map(_.diskSize).sum / 1e9
      val parts = infos.map(i => s"${i.id}:${i.numCachedPartitions}/${i.numPartitions}" +
        f"(${i.memSize / 1e9}%.1fg+${i.diskSize / 1e9}%.1fgD)").mkString(" ")
      println(f"[storage $tag] mem $mem%.1f GB disk $dsk%.1f GB  $parts")
    }

    // ---- 1. catalyst inner-stage split at the real geometry ----------
    engine.queryCatalyst(db, qs(0), 500, 50).collect() // warm
    val model = engine.indexModel(doc)
    val inner = qs.toIndexedSeq.map { q =>
      val a0 = System.nanoTime()
      val qp = model.pca.applyLocal(q)
      val probes = model.nearestClusters(qp, doc.nProbe)
      val a1 = System.nanoTime()
      val chunks = engine.prunedLiveCodedChunks(doc, probes)
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
        (a4 - a3) / 1e6, (a5 - a4) / 1e6)
    }
    def col50(i: Int): Double = p50(inner.map(_(i)))
    println(f"catalyst inner p50: probe_select ${col50(0)}%.0f  chunk_plans " +
      f"${col50(1)}%.0f  coarse ${col50(2)}%.0f  fetch_construct ${col50(3)}%.0f  " +
      f"fetch_collect ${col50(4)}%.0f ms")
    val e2e = qs.toIndexedSeq.map { q =>
      val t0 = System.nanoTime()
      engine.queryCatalyst(db, q, 500, 50).collect()
      (System.nanoTime() - t0) / 1e6
    }
    println(f"catalyst end-to-end p50: ${p50(e2e)}%.0f ms  " +
      s"(all: ${e2e.map(_.toInt).mkString(",")})")
    println(s"kernel_canary_after_catalyst=${graft.Canary.kernelCanaryRowsPerSec()}")

    // ---- custom ServingScan vs Catalyst chunks: interleaved A/B ------
    // Same JVM, alternating passes (A/B/A/B) — the only comparison shape
    // that survives this box's contention windows. Both paths warm.
    locally {
      def pass(custom: Boolean): Double = {
        if (!custom) System.setProperty("graft.serving.custom.scan", "false")
        try p50(qs.toIndexedSeq.map { q =>
          val t0 = System.nanoTime()
          engine.queryCatalyst(db, q, 500, 50).collect()
          (System.nanoTime() - t0) / 1e6
        })
        finally System.clearProperty("graft.serving.custom.scan")
      }
      pass(custom = true); pass(custom = false) // warm both
      val rounds = (0 until 4).map(_ => (pass(custom = true), pass(custom = false)))
      println("customscan A/B e2e p50 per round (custom,catalyst): " +
        rounds.map { case (a, b) => f"($a%.0f,$b%.0f)" }.mkString(" "))
      // coarse stage alone, warm, both paths
      val q = qs(0)
      val qp = model.pca.applyLocal(q)
      val probes = model.nearestClusters(qp, doc.nProbe)
      val chunks = engine.prunedLiveCodedChunks(doc, probes)
      graft.operators.BatchANN.coarseSingleChunked(
        spark, chunks, engine.modelBroadcast(doc), qp, probes, 500) // warm
      engine.servingScanCoarse(doc, qp, probes, 500) // warm
      val coarseAb = (0 until 4).map { _ =>
        val c0 = System.nanoTime()
        engine.servingScanCoarse(doc, qp, probes, 500).get
        val c1 = System.nanoTime()
        graft.operators.BatchANN.coarseSingleChunked(
          spark, chunks, engine.modelBroadcast(doc), qp, probes, 500)
        val c2 = System.nanoTime()
        ((c1 - c0) / 1e6, (c2 - c1) / 1e6)
      }
      println("customscan A/B warm coarse ms per round (custom,catalyst): " +
        coarseAb.map { case (a, b) => f"($a%.0f,$b%.0f)" }.mkString(" "))
      println(s"kernel_canary_after_ab=${graft.Canary.kernelCanaryRowsPerSec()}")
    }

    // ---- coarse dissection: scan+filter cost vs kernel cost ----------
    // count() = decode + pushed filter only (no ADC kernel); the gap to
    // the coarse stage above is kernel + heap-merge. Sequential per-chunk
    // timing shows whether the 8 concurrent jobs actually overlap.
    {
      val q = qs(0)
      val qp = model.pca.applyLocal(q)
      val probes = model.nearestClusters(qp, doc.nProbe)
      val chunks = engine.prunedLiveCodedChunks(doc, probes)
      println(s"chunks=${chunks.length}")
      // warm
      chunks.foreach(_.select("id", "cluster_id", "code").count())
      val t0 = System.nanoTime()
      val rows = chunks.map(_.select("id", "cluster_id", "code").count())
      val t1 = System.nanoTime()
      println(f"sequential per-chunk count: total ${(t1 - t0) / 1e6}%.0f ms  " +
        s"rows/chunk: ${rows.mkString(",")}")
      // concurrent counts (same thread structure as coarseSingleChunked)
      val t2 = System.nanoTime()
      val threads = chunks.map { c =>
        val t = new Thread(() => { c.select("id", "cluster_id", "code").count(); () })
        t.setDaemon(true); t.start(); t
      }
      threads.foreach(_.join())
      val t3 = System.nanoTime()
      println(f"concurrent chunk counts: ${(t3 - t2) / 1e6}%.0f ms")
      // the kernel-bearing coarse, repeated (warm):
      val t4 = System.nanoTime()
      graft.operators.BatchANN.coarseSingleChunked(
        spark, chunks, engine.modelBroadcast(doc), qp, probes, 500)
      val t5 = System.nanoTime()
      println(f"coarseSingleChunked (warm, same chunk frames): ${(t5 - t4) / 1e6}%.0f ms")
      // task-level parallelism of one chunk scan
      val one = chunks.head.select("id", "cluster_id", "code")
      println(s"chunk0 partitions: ${one.queryExecution.toRdd.getNumPartitions}")
    }

    // ---- 2. dual-handle prepared repro -------------------------------
    engine.query(db, qs(0), 500, 50).collect() // builds the AUTO handle
    storage("after auto handle")
    // GRAFT_PREPARED_PARTS: explicit-handle partition count A/B — at 16
    // caller threads the driver schedules threads×parts tasks/second;
    // fewer, bigger partitions trade single-query spread for driver
    // headroom (the measured qps ceiling lever)
    val prep = engine.prepareServing(db,
      numParts = sys.env.get("GRAFT_PREPARED_PARTS").map(_.toInt).getOrElse(-1))
    println(s"prepared_parts=${sys.env.getOrElse("GRAFT_PREPARED_PARTS", "default")}")
    storage("after explicit prepare")
    def lat(tag: String, f: Array[Float] => Unit): Unit = {
      val xs = qs.toIndexedSeq.map { q =>
        val t0 = System.nanoTime(); f(q); (System.nanoTime() - t0) / 1e6
      }
      println(f"$tag p50 ${p50(xs)}%.0f ms  (all: ${xs.map(_.toInt).mkString(",")})")
    }
    lat("prep.query seq#1", q => prep.query(q, 500, 50))
    storage("after prep seq#1")
    lat("routed (auto) seq", q => engine.query(db, q, 500, 50))
    storage("after routed seq")
    lat("prep.query seq#2", q => prep.query(q, 500, 50))
    // filtered routed loops — ScaleEval's two predicate shapes (the
    // packed-root filtered anomaly of r15 showed ONLY here: 169-503 ms
    // vs the base root's 29-73 at 35M; this block exists to reproduce
    // or clear it against a kept root, r16)
    locally {
      val predCol = pmod(hash(get_json_object(col("metadata"), "$.i")),
        lit(2)) === 0
      val predCorr =
        get_json_object(col("metadata"), "$.i").cast("long") % 2 === 0
      lat("filtered routed (uncorrelated)",
        q => engine.queryHits(db, q, 500, 50, Some(predCol)))
      lat("filtered routed (cluster-correlated)",
        q => engine.queryHits(db, q, 500, 50, Some(predCorr)))
    }
    // concurrent qps at the eval block's shape (16 threads, shared handle)
    // — the r15 A/B point for the columnar task-result wire format
    locally {
      val conc = 16
      val totalQ = 128
      val qpool = Array.fill(totalQ)(Array.fill(d)(rnd.nextGaussian().toFloat))
      prep.query(qpool(0), 500, 50) // warm
      val idx = new java.util.concurrent.atomic.AtomicInteger(0)
      val c0 = System.nanoTime()
      val cthreads = (0 until conc).map { _ =>
        val t = new Thread(() => {
          var i = idx.getAndIncrement()
          while (i < totalQ) { prep.query(qpool(i), 500, 50); i = idx.getAndIncrement() }
        })
        t.setDaemon(true); t.start(); t
      }
      cthreads.foreach(_.join())
      println(f"concurrent_qps_16t=${totalQ / ((System.nanoTime() - c0) / 1e9)}%.1f")
    }
    // the multi-core canary brackets the qps number: single-thread
    // health does NOT rule out host multi-core contention (r16's 25.8
    // qps control read kernel_canary 2,250+) — the 16-thread aggregate
    // vs 16× single names which one this window was
    locally {
      val k1 = graft.Canary.kernelCanaryRowsPerSec()
      val k16 = graft.Canary.kernelCanaryMultiRowsPerSec(16)
      println(f"kernel_canary_single=$k1  kernel_canary_16t=$k16  " +
        f"scaling=${k16 / k1}%.1fx of 16x")
    }
    println(s"kernel_canary=${graft.Canary.kernelCanaryRowsPerSec()}")
    prep.close()
    spark.stop()
  }
}
