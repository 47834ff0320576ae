package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale proof for the STREAMING near-dup pipeline
  * ([[graft.streaming.EventStream.nearDupClaims]]) — its batch twins have
  * 10M-doc evidence (EVAL_r07); this runs the stateful streaming form at
  * the same order of magnitude and records throughput + state size.
  *
  * A generated corpus streams through file-source micro-batches in
  * event-time order: 10% exact duplicates (same token multiset as an
  * earlier doc → every band collides → must be suppressed) and 10%
  * near-duplicates (2 of 40 words changed → most bands collide), spread
  * over `GRAFT_SS_HOURS` of event time so the 1-hour state horizon
  * actually EXPIRES buckets mid-run — the artifact records live state
  * rows vs total band rows to show the horizon, not the corpus, bounds
  * state. Prints ONE JSON line.
  *
  * Env: GRAFT_SS_DOCS (10,000,000), GRAFT_SS_FILES (12 micro-batches),
  * GRAFT_SS_HOURS (6), SPARK_GRAFT_CPUS (16).
  */
object StreamScale {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("GRAFT_SS_DOCS", "10000000").toLong
    val nFiles = sys.env.getOrElse("GRAFT_SS_FILES", "12").toInt
    val hours = sys.env.getOrElse("GRAFT_SS_HOURS", "6").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    // GRAFT_SS_PROVIDER=rocksdb swaps the state store to the disk-backed
    // RocksDB provider (VERDICT r12 ask #6): the default HDFS-backed
    // store holds every live state row on-heap (2.8 GB at 10M docs,
    // EVAL_r12), which at 100x state is an executor-memory ceiling; the
    // RocksDB provider keeps the working set in native memory + local
    // SST files, bounded independent of heap.
    val provider = sys.env.getOrElse("GRAFT_SS_PROVIDER", "default")
    val canaryMsBefore = Canary.cpuCanaryMs()
    val (kernelBefore, canaryWaitedS) = Canary.awaitHealthyKernel("stream-scale")
    if (provider == "rocksdb") {
      // silence the RocksDB JNI info logger: its native callback racing
      // JVM shutdown was the r13 teardown SIGSEGV (LoggerJniCallback::
      // Logv on a detached thread). Spark derives the native log level
      // from this class's slf4j level at DB open, so OFF here means the
      // callback is never armed; the explicit StateStore stop below
      // closes the DBs on a healthy JVM either way.
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.streaming.state.RocksDB",
        org.apache.logging.log4j.Level.OFF)
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        org.apache.logging.log4j.Level.WARN)
    }
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (provider == "rocksdb")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- corpus: deterministic text from the doc id, all executor-side.
    // id%10==7 → exact dup of id-7 (same 40 tokens); id%10==3 → near dup
    // of id-3 (words 0-1 changed); else base. Event time is uniform over
    // `hours`, and files are written in event-time order so the stream
    // replays an ordered ingest.
    val srcDir = java.nio.file.Files.createTempDirectory("graft-ss-src").toString
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ss-ckpt").toString
    val t0us = 1700000000000000L
    val usPerDoc = hours.toLong * 3600L * 1000000L / nDocs
    val textExpr =
      """concat_ws(' ', transform(sequence(0, 39), j ->
        |  concat('w', pmod(hash((CASE
        |    WHEN id % 10 = 7 AND id >= 7 THEN id - 7
        |    WHEN id % 10 = 3 AND id >= 3 AND j >= 2 THEN id - 3
        |    ELSE id END) * 41 + j, 7919), 8000)))) as text""".stripMargin
    val gen0 = System.nanoTime()
    val perFile = (nDocs + nFiles - 1) / nFiles
    (0 until nFiles).foreach { f =>
      val lo = f * perFile
      val hi = math.min(nDocs, (f + 1) * perFile)
      // ONE file per sequential append job: the file source replays in
      // modification-time order, and same-job sibling files share an
      // mtime — their arbitrary tie order scrambles event time past the
      // watermark and silently DROPS late rows (measured: 29k of 200k
      // docs lost with 4 same-mtime files per append)
      spark.range(lo, hi, 1, 16).selectExpr(
          s"timestamp_micros($t0us + id * $usPerDoc) as ts",
          "id as doc_id", textExpr)
        .coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    val genSec = (System.nanoTime() - gen0) / 1e9

    // ---- the stream: file source in arrival order, claims → per-batch
    // survivor reduce in foreachBatch (claims of a doc are co-batch)
    val docs = spark.readStream
      .schema("ts timestamp, doc_id long, text string")
      .option("maxFilesPerTrigger", 1) // one event-time-ordered file per micro-batch
      .parquet(srcDir)
    val survivors = new java.util.concurrent.atomic.AtomicLong(0)
    val exactDupSurvivors = new java.util.concurrent.atomic.AtomicLong(0)
    val nearDupSurvivors = new java.util.concurrent.atomic.AtomicLong(0)
    val s0 = System.nanoTime()
    val q = graft.streaming.EventStream
      .nearDupClaims(docs, watermark = "30 minutes",
        stateHorizonMs = 3600L * 1000)
      .toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val s = graft.streaming.EventStream.nearDupSurvivors(batch)
          .agg(count(lit(1)).as("n"),
            count(when(col("doc_id") % 10 === 7, 1)).as("exact"),
            count(when(col("doc_id") % 10 === 3, 1)).as("near")).first()
        survivors.addAndGet(s.getLong(0))
        exactDupSurvivors.addAndGet(s.getLong(1))
        nearDupSurvivors.addAndGet(s.getLong(2))
        ()
      }
      .start()
    q.processAllAvailable()
    val streamSec = (System.nanoTime() - s0) / 1e9
    val prog = q.lastProgress
    val state = prog.stateOperators.head
    q.stop()

    val docsPerSec = nDocs / streamSec
    println(
      s"""{"metric":"streaming_near_dup","provider":"$provider",""" +
        s""""docs":$nDocs,"files":$nFiles,""" +
        s""""event_hours":$hours,"gen_sec":${f"$genSec%.1f"},""" +
        s""""stream_sec":${f"$streamSec%.1f"},"docs_per_sec":${f"$docsPerSec%.0f"},""" +
        s""""survivors":${survivors.get()},""" +
        s""""exact_dup_survivors":${exactDupSurvivors.get()},""" +
        s""""near_dup_survivors":${nearDupSurvivors.get()},""" +
        s""""state_rows_live":${state.numRowsTotal},""" +
        s""""state_mem_mb":${state.memoryUsedBytes / 1024 / 1024},""" +
        s""""band_rows_total":${nDocs * 4},""" +
        s""""cpu_canary_ms_before":$canaryMsBefore,""" +
        s""""kernel_canary_before_rows_per_sec":$kernelBefore,""" +
        s""""canary_waited_before_s":$canaryWaitedS,""" +
        s""""cpu_canary_ms":${Canary.cpuCanaryMs()},""" +
        s""""kernel_canary_rows_per_sec":${Canary.kernelCanaryRowsPerSec()}}""")
    // close state stores (RocksDB instances) while the JVM is healthy —
    // see Bridge.stopStateStores; shutdown-hook teardown was the r13
    // non-zero exit
    org.apache.spark.sql.graftbridge.Bridge.stopStateStores()
    spark.stop()
  }
}
