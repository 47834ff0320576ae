package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for the graft native expressions. Spark 4
  * moved these conversions behind `private[sql]` (`ExpressionUtils`); this
  * is the standard extension-library shim to reach them — no other
  * internals are touched.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Unload every loaded state-store provider and stop the maintenance
    * task NOW, on a healthy JVM. Without it, RocksDB instances are torn
    * down by JVM shutdown hooks, and their native background threads can
    * fire the JNI logger callback after their thread is detached —
    * observed as a SIGSEGV in `rocksdb::LoggerJniCallback::Logv` during
    * `spark.stop()` (r13 stream eval exited non-zero AFTER printing its
    * artifact line). Callable from library code because `StateStore` is
    * `private[sql]` — the same narrow bridge rationale as above.
    */
  def stopStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
}
