package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale proof for the temporal operators (Sessionize / AsOfJoin /
  * RangeJoin) at volumes the sf-bench never reaches. Generates a
  * deterministic event stream DISTRIBUTED over `spark.range` (hash-derived
  * columns; the driver never holds the data): N events across U users over
  * a 30-day window, and measures full-pipeline wall times:
  *
  *   - sessionize: 30-min-gap numbering + per-session rollup, reduced to
  *     (session count, event sum) — one shuffle of N rows on user
  *   - asof_join: clicks probed against errors (~N/5 each side), reduced
  *     to (matched count, mean lag) — one shuffle of both sides
  *   - range_join_count: clicks within 10 min before each purchase,
  *     reduced to (purchase count, total clicks) — bucketed equi-join
  *
  * Env knobs: GRAFT_TSCALE_N (50000000), GRAFT_TSCALE_USERS (1000000),
  * SPARK_GRAFT_CPUS (32). Prints ONE JSON line.
  */
object TemporalScale {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_TSCALE_N", "50000000").toLong
    val users = sys.env.getOrElse("GRAFT_TSCALE_USERS", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // partition-sizing knob: at ≥200M rows the per-partition sort behind
    // sessionize spills with partitions == cores — raise so each shuffle
    // partition's sort run fits in executor memory (the same
    // spark.sql.shuffle.partitions sizing any 100 TB deployment does)
    val shuffle = sys.env.getOrElse("GRAFT_TSCALE_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val spanUs = 30L * 24 * 3600 * 1000000 // 30 days
    val epoch0 = 1704067200000000L         // 2024-01-01 in µs
    // deterministic hash-derived stream; xxhash64 keeps generation inside
    // whole-stage codegen (no UDF, no driver data)
    val ev = spark.range(n).select(
      col("id").as("event_id"),
      pmod(xxhash64(col("id"), lit(1)), lit(users)).as("user_id"),
      (lit(epoch0) + pmod(xxhash64(col("id"), lit(2)), lit(spanUs))).as("tus"),
      element_at(
        array(lit("click"), lit("view"), lit("purchase"), lit("error"), lit("signup")),
        (pmod(xxhash64(col("id"), lit(3)), lit(5)) + 1).cast("int")).as("event_type"),
      (pmod(xxhash64(col("id"), lit(4)), lit(10000)) / lit(100.0)).as("value"))

    val (_, genSec) = timed(ev.count()) // isolate scan/gen cost from the ops

    val (sessOut, sessSec) = timed {
      graft.operators.Sessionize
        .sessionize(ev.select("user_id", "event_id", "tus", "value"),
          "user_id", "tus", "event_id", gap = 1800000000L)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
        .agg(count(lit(1)), sum(col("n_events"))).collect()(0)
    }
    val (asofOut, asofSec) = timed {
      val base = ev.select(col("event_id"), col("user_id"), col("tus"), col("event_type"))
      val clicks = base.filter(col("event_type") === "click").drop("event_type")
      val errors = base.filter(col("event_type") === "error")
        .select(col("user_id"), col("tus"), col("event_id"),
          col("event_id").as("err_event_id"), col("tus").as("err_us"))
      graft.operators.AsOfJoin
        .asOf(clicks, errors, key = "user_id", ts = "tus", ord = "event_id")
        .agg(count(col("err_event_id")), avg(col("tus") - col("err_us"))).collect()(0)
    }
    val (rangeOut, rangeSec) = timed {
      val base = ev.select(col("event_id"), col("user_id"), col("tus"), col("event_type"))
      val purchases = base.filter(col("event_type") === "purchase").drop("event_type")
      val clicks = base.filter(col("event_type") === "click")
        .select(col("user_id"), col("tus").as("ctus"))
      graft.operators.RangeJoin
        .joinPreceding(purchases, clicks, "user_id", "tus", "ctus", 600000000L)
        .groupBy(col("event_id")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)), sum(col("c"))).collect()(0)
    }

    def r(x: Double): Double = math.round(x * 1000) / 1000.0
    println(s"""{"n":$n,"users":$users,"gen_sec":${r(genSec)},""" +
      s""""sessionize_sec":${r(sessSec)},"sessions":${sessOut.getLong(0)},""" +
      s""""asof_sec":${r(asofSec)},"asof_matched":${asofOut.getLong(0)},""" +
      s""""range_sec":${r(rangeSec)},"range_purchases_with_clicks":${rangeOut.getLong(0)},""" +
      s""""range_pairs":${rangeOut.getLong(1)}}""")
    spark.stop()
  }
}
