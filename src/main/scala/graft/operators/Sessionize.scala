package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: split each key's event stream into sessions
  * wherever the inter-event gap exceeds `gap` (the standard web-analytics
  * 30-minute-idle rule). Appends a 1-based `session_idx` per key.
  *
  * One shuffle on the key + per-partition sort, then two window passes
  * over the SAME window frame (lag to mark session starts, running sum to
  * number them) — Spark plans both in a single WindowExec, so the whole
  * operator is one exchange + one sort regardless of input size. That is
  * the at-scale formulation: no self-join, no collect, and a key's events
  * never leave one partition. (The streaming twin of this rule is
  * `session_window`; this is the batch/backfill operator.)
  *
  * Time is a plain numeric column (caller picks the unit); `ord` breaks
  * exact-timestamp ties so the numbering is deterministic on any input.
  */
object Sessionize {

  /** @param df   input; all columns pass through
    * @param key  partition key (e.g. user id)
    * @param time numeric event-time column, monotone within a session
    * @param ord  unique tiebreaker within (key, time)
    * @param gap  same unit as `time`; a gap STRICTLY greater starts a
    *             new session
    */
  def sessionize(df: DataFrame, key: String, time: String, ord: String,
                 gap: Long): DataFrame = {
    val order = Window.partitionBy(key).orderBy(col(time), col(ord))
    val prev = lag(col(time), 1).over(order)
    val isStart = when(prev.isNull || col(time) - prev > gap, 1L).otherwise(0L)
    df.withColumn("session_idx",
      sum(isStart).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
