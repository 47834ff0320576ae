package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.Engine
import graft.streaming.{EventStream, StreamingIngest}

/** Structured-Streaming behavior: watermarked windowed aggregation matches
  * the batch plan on the same data, keyed custom state accumulates, and
  * streaming ingest preserves the engine's sequential-id contract.
  */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  test("session windows merge across micro-batches and emit on close") {
    // two time-ordered files → two micro-batches; u1's second session
    // spans the split (4000s in batch A, 4010s in batch B) and must MERGE
    // in state; the final session (9999999s) stays open and never emits
    val sec = 1000000L // µs per second
    val a = Seq((0L * sec, 1L, 1.0), (10L * sec, 1L, 2.0), (5L * sec, 2L, 7.0),
      (4000L * sec, 1L, 3.0))
    val b = Seq((4010L * sec, 1L, 4.0), (9999999L * sec, 1L, 9.0))
    val src = java.nio.file.Files.createTempDirectory("sess-spec-src")
    def stage(rows: Seq[(Long, Long, Double)], name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("sess-spec-half")
      rows.toDF("tus", "user_id", "value").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = src.resolve(name)
      java.nio.file.Files.copy(part, dst)
      dst.toFile.setLastModified(mtime)
    }
    val now = System.currentTimeMillis()
    stage(a, "a.parquet", now - 60000)
    stage(b, "b.parquet", now)
    val stream = spark.readStream
      .schema("tus LONG, user_id LONG, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString)
      .select(timestamp_micros(col("tus")).as("ts"), col("user_id"), col("value"))
    val q = EventStream.sessionWindows(stream)
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("sess_test")
      .select("user_id", "start_us", "n_events", "sum_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === Set(
      (1L, 0L, 2L, 3.0),               // u1 session 1: 0s + 10s
      (1L, 4000L * sec, 2L, 7.0),      // u1 session 2: merged ACROSS batches
      (2L, 5L * sec, 1L, 7.0)))        // u2 single event
  }

  test("watermarked hourly window agg matches the batch aggregation") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.startToMemory(
      EventStream.hourlyCounts(events), "hourly_test")
    try {
      input.addData(
        (ts(10, 5), "click", 1.0), (ts(10, 40), "click", 2.0),
        (ts(10, 55), "view", 5.0), (ts(11, 10), "click", 4.0))
      q.processAllAvailable()
      val got = spark.table("hourly_test")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = EventStream.hourlyCounts(
        Seq((ts(10, 5), "click", 1.0), (ts(10, 40), "click", 2.0),
          (ts(10, 55), "view", 5.0), (ts(11, 10), "click", 4.0))
          .toDF("ts", "event_type", "value"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == batch)
      assert(got.contains(("2026-01-01 10:00", "click", 2L, 3.0)))
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates per-key running stats across batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventStream.EventRow]
    val q = EventStream.runningStats(input.toDS())
      .toDF().writeStream.format("memory").queryName("stats_test")
      .outputMode("update").start()
    try {
      input.addData(EventStream.EventRow("a", 1.0), EventStream.EventRow("a", 2.0))
      q.processAllAvailable()
      input.addData(EventStream.EventRow("a", 3.0), EventStream.EventRow("b", 10.0))
      q.processAllAvailable()
      val last = spark.table("stats_test").groupBy("event_type")
        .agg(max("n").as("n"), max("total").as("total"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(last("a") == (3L, 6.0)) // state carried across micro-batches
      assert(last("b") == (1L, 10.0))
    } finally q.stop()
  }

  test("streaming dedup keeps first doc per fingerprint across batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = EventStream.streamingDedup(
      input.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      input.addData(
        (ts(10, 0), 1L, "the quick brown fox"),
        (ts(10, 1), 2L, "fox brown quick the"), // same token set → dup
        (ts(10, 2), 3L, "something else entirely"))
      q.processAllAvailable()
      input.addData((ts(10, 3), 4L, "THE QUICK brown fox")) // dup across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("streaming NEAR-dup: paraphrased doc in a later batch is suppressed") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val survivors = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = EventStream.startNearDup(
      input.toDF().toDF("ts", "doc_id", "text"), tmpDir("graft-nd-ckpt")) {
      (batch, _) => survivors.synchronized {
        survivors ++= batch.collect().map(_.getLong(0))
      }
    }
    try {
      val original = "the quick brown fox jumps over the lazy dog while " +
        "seventeen astronauts watch from the orbital station above the clouds"
      val paraphrase = "the quick brown fox jumps over the lazy dog while " +
        "seventeen astronauts watch from the orbital station above the mountains"
      val unrelated = "completely different subject matter entirely about " +
        "spark engines and distributed columnar storage formats for analytics"
      input.addData((ts(10, 0), 1L, original), (ts(10, 1), 2L, unrelated))
      q.processAllAvailable()
      // later batch: near-dup (one word differs → most bands collide) must
      // be suppressed by band state carried across batches; a fresh doc passes
      input.addData((ts(10, 5), 3L, paraphrase),
        (ts(10, 6), 4L, "yet another genuinely new document discussing " +
          "gardens rivers bicycles and morning coffee rituals in detail"))
      q.processAllAvailable()
      val got = survivors.synchronized(survivors.sorted.toSeq)
      assert(got == Seq(1L, 2L, 4L),
        s"paraphrase (3) must be suppressed, fresh docs kept: got $got")
    } finally q.stop()
  }

  test("streaming ingest: foreachBatch add keeps ids sequential across batches") {
    implicit val sq = spark.sqlContext
    val engine = new Engine(spark, tmpDir("graft-stream"))
    engine.create("sdb")
    val input = MemoryStream[(Seq[Float], String)]
    val rows = input.toDF().toDF("vector", "metadata")
    val q = StreamingIngest.start(engine, "sdb", rows, tmpDir("graft-ckpt"))
    try {
      input.addData((Seq(1.0f, 0.0f), """{"b":1}"""), (Seq(0.0f, 1.0f), """{"b":1}"""))
      q.processAllAvailable()
      input.addData((Seq(0.5f, 0.5f), """{"b":2}"""))
      q.processAllAvailable()
      assert(engine.count("sdb") == 3L)
      val doc = engine.load("sdb")
      assert(doc.maxId == 2L)
      val ids = engine.data("sdb").select("id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(0L, 1L, 2L))
      // the streamed rows are queryable through the normal path
      val res = engine.query("sdb", Array(1.0f, 0.0f), finalTopK = 1).collect()
      assert(res.head.getLong(1) == 0L)
    } finally q.stop()
  }

  test("streaming cross-corpus dedup: multi-batch union equals the batch twin exactly") {
    val dir = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))
    val streamed = SparkEntry.queries("streaming_dedup_inc")(spark, dir)
      .collect().map(key).sortBy(_._1)
    val batch = SparkEntry.queries("dedup_incremental")(spark, dir)
      .collect().map(key).sortBy(_._1)
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      s"streaming union diverged: ${streamed.length} vs ${batch.length} rows")
    // real stream exercised: at least one verified duplicate and one novel
    assert(streamed.exists(_._2 > 0) && streamed.exists(_._2 == 0))
  }
}
