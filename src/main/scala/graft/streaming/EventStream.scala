package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming pipelines over the events stream (SURVEY §7.5 —
  * the reference is request/response only; streams are the Spark-native
  * extension of its ingest/analytics surface).
  *
  * The same logical aggregation runs batch (Queries.eventsHourly) and
  * streaming (here): watermarked tumbling windows with partial (map-side)
  * aggregation — at scale the shuffle carries one partial row per
  * (window, event_type, task), never raw events.
  */
object EventStream {

  /** Tumbling hourly counts/sums per event type with a watermark for
    * late-data cutoff. Works on a streaming or batch DataFrame with
    * columns (ts timestamp, event_type string, value double).
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Per-type running stats via explicit keyed state
    * (mapGroupsWithState) — the custom-state shape for operators that
    * windowed aggs can't express (e.g. monotone counters, model state).
    */
  final case class EventRow(event_type: String, value: Double)
  final case class TypeStats(event_type: String, n: Long, total: Double)

  def runningStats(events: Dataset[EventRow]): Dataset[TypeStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[TypeStats, TypeStats](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[EventRow], state: GroupState[TypeStats]) =>
          val prev = state.getOption.getOrElse(TypeStats(key, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { r => n += 1; total += r.value }
          val next = TypeStats(key, n, total)
          state.update(next)
          next
      }
  }

  /** Streaming near-dup suppression: keep the first document per content
    * fingerprint (token-set md5 — word-order-insensitive), with a
    * watermark bounding the dedup state. The streaming face of the batch
    * dedup pipelines: same fingerprint, state bounded by the watermark
    * horizon instead of a full-history shuffle.
    * Input columns: (ts timestamp, doc_id long, text string).
    */
  def streamingDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", md5(concat_ws(" ",
        array_sort(array_distinct(split(trim(lower(col("text"))), "\\s+"))))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .select(col("ts"), col("doc_id"), col("fp"))

  /** Streaming output helper: update-mode memory sink for tests/demos. */
  def startToMemory(df: DataFrame, queryName: String,
                    mode: OutputMode = OutputMode.Update()) =
    df.writeStream.format("memory").queryName(queryName).outputMode(mode).start()
}
