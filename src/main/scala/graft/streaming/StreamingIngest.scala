package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.Engine

/** Streaming ingest into an engine database: `readStream → foreachBatch →
  * Engine.add`. Each micro-batch is a plain DataFrame, so the exact
  * sequential-id contract (A4) and the incremental trained-index insert
  * (A6) apply unchanged per batch — the engine's snapshot/catalog design
  * needs no streaming-specific state. Batches arrive ordered, so ids stay
  * contiguous across the stream.
  */
object StreamingIngest {

  /** Start appending a stream of (vector array<float>, metadata string)
    * rows into `name`. Caller owns the returned query's lifecycle.
    */
  def start(engine: Engine, name: String, rows: DataFrame,
            checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { engine.add(name, batch); () }
      }
      .start()
}
