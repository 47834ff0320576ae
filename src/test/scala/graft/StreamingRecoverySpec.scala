package graft

import java.sql.Timestamp

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.functions._

import graft.operators.MinHashLSH
import graft.streaming.EventStream

/** Crash-recovery proof for the streaming near-dup state (VERDICT r13
  * ask #6): kill the query MID-STREAM with an injected failure inside
  * `foreachBatch` (after the batch's verdicts were delivered but BEFORE
  * its commit lands — the worst-case crash point), restart from the same
  * checkpoint, and prove the post-recovery union of per-batch survivor
  * sets equals the batch twin exactly — no dropped and no duplicated
  * verdicts.
  *
  * The restart REPLAYS the uncommitted batch (at-least-once delivery —
  * asserted below), which is precisely why the sink contract is
  * idempotent-by-batchId: the spec's sink keeps `batchId -> survivors`
  * last-write-wins, the same pattern a production foreachBatch sink
  * (upsert by batch id) uses.
  *
  * The batch twin needs no micro-batch notion: with the state horizon
  * wider than the corpus's event span, a doc survives iff it is the
  * FIRST (ts, doc_id) claimant of every one of its band buckets —
  * computable as one batch aggregation over the same `bandKeys` kernel
  * the stream uses.
  */
class StreamingRecoverySpec extends SparkSpec {

  import spark.implicits._

  private val NFiles = 6
  private val DocsPerFile = 100
  private val N = NFiles * DocsPerFile
  private val T0 = Timestamp.valueOf("2026-01-01 00:00:00").getTime

  /** Deterministic text: id%10==7 → exact dup of id-7; id%10==3 → near
    * dup of id-3 (first two words changed); else unique.
    */
  private def text(id: Long): String = {
    val base = if (id % 10 == 7 && id >= 7) id - 7 else id
    (0 until 40).map { j =>
      val src = if (id % 10 == 3 && id >= 3 && j >= 2) id - 3 else base
      s"w${src}x$j" // (src, j)-unique tokens: overlap ONLY by design
    }.mkString(" ")
  }

  private lazy val srcDir: String = {
    val src = java.nio.file.Files.createTempDirectory("graft-rec-src")
    (0 until NFiles).foreach { f =>
      val rows = (f * DocsPerFile until (f + 1) * DocsPerFile).map { i =>
        (new Timestamp(T0 + i * 1000L), i.toLong, text(i.toLong))
      }
      val tmp = java.nio.file.Files.createTempDirectory("graft-rec-part")
      rows.toDF("ts", "doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = src.resolve(f"f$f%02d.parquet")
      java.nio.file.Files.copy(part, dst)
      // distinct mtimes → deterministic file order → event-time order
      dst.toFile.setLastModified(T0 + f * 60000L)
    }
    src.toString
  }

  private def docsStream =
    spark.readStream
      .schema("ts timestamp, doc_id long, text string")
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)

  /** Batch twin: survivor iff first (ts, doc_id) claimant of EVERY band. */
  private def batchSurvivors(): Set[Long] = {
    val all = (0 until N).map(i =>
      (new Timestamp(T0 + i * 1000L), i.toLong, text(i.toLong)))
      .toDF("ts", "doc_id", "text")
    val claims = all.select(col("ts"), col("doc_id"),
        posexplode(MinHashLSH.bandKeys(col("text"), 3, 12, 3))
          .as(Seq("band_idx", "band_key")))
      .withColumn("bucket", concat_ws("#", col("band_idx"), col("band_key")))
    val first = claims.groupBy("bucket")
      .agg(min(struct(col("ts"), col("doc_id"))).as("first"))
    claims.join(first, "bucket")
      .withColumn("fresh",
        col("ts") === col("first.ts") && col("doc_id") === col("first.doc_id"))
      .groupBy("doc_id")
      .agg(min(when(col("fresh"), 1).otherwise(0)).as("all_fresh"))
      .filter(col("all_fresh") === 1)
      .select("doc_id").as[Long].collect().toSet
  }

  test("injected mid-stream crash + checkpoint resume: union equals the batch twin, replayed batch deduped by id") {
    val ckpt = tmpDir("graft-rec-ckpt")
    val perBatch = TrieMap.empty[Long, Set[Long]]
    val batchRuns = TrieMap.empty[Long, Int]
    @volatile var injected = false

    def record(survivors: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      perBatch(id) = survivors.as[Long].collect().toSet // last write wins
      batchRuns(id) = batchRuns.getOrElse(id, 0) + 1
    }

    // run 1: verdicts for batch 2 are DELIVERED, then the sink dies
    // before the commit can land — the query fails mid-stream
    val q1 = EventStream.startNearDup(docsStream, ckpt) { (s, id) =>
      record(s, id)
      if (id == 2 && !injected) {
        injected = true
        throw new RuntimeException("injected crash after delivering batch 2")
      }
    }
    val failed =
      try { q1.processAllAvailable(); false }
      catch { case _: Exception => true }
    try q1.stop() catch { case _: Exception => () }
    assert(failed && injected, "the injected crash must terminate run 1")
    val processedBeforeCrash = perBatch.keySet.max
    assert(processedBeforeCrash <= 3, "crash must land mid-stream")

    // run 2: same source, same checkpoint, healthy sink — resumes where
    // the checkpoint says, replaying the uncommitted batch
    val q2 = EventStream.startNearDup(docsStream, ckpt)(record)
    try {
      q2.processAllAvailable()
    } finally q2.stop()

    // at-least-once: the crashed batch ran twice; idempotence by batchId
    // absorbed the replay
    assert(batchRuns(2L) >= 2, s"batch 2 must be replayed: ran ${batchRuns(2L)}x")
    // every file-batch processed; the restart may append a no-new-data
    // batch (watermark advance / timeout sweep) — allowed, counted in
    // the union like any other
    assert((0L until NFiles.toLong).toSet.subsetOf(perBatch.keySet),
      s"every file-batch must be processed per checkpoint: ${perBatch.keySet}")

    val union = perBatch.values.flatten.toSet
    val expected = batchSurvivors()
    assert(union == expected,
      s"post-recovery union diverged: ${union.size} vs ${expected.size} " +
        s"(missing=${(expected -- union).take(5)}, extra=${(union -- expected).take(5)})")
    // the corpus exercised real suppression: exact and near dups dropped
    assert(expected.size < N && expected.size > N / 2)
  }
}
