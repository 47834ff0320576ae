package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: match every probe row with the most recent build
  * row of the same key whose timestamp is ≤ the probe's (the classic
  * trades×quotes / event-attribution join; left-outer — unmatched probes
  * keep null carries).
  *
  * Spark has no native as-of join, and the naive formulation — an
  * inequality join + per-probe max — degenerates to a broadcast nested
  * loop or an exploded range join. This operator instead uses the
  * union-sort-carry plan, which is ONE hash shuffle of both inputs on the
  * key plus a per-partition sort (the same cost as a regular sorted
  * merge join, and the standard at-scale formulation):
  *
  *   1. tag build rows side=0, probe rows side=1, union by name
  *   2. window per key ordered by (ts, side, ord): running
  *      `last(carry, ignoreNulls)` carries the latest build payload
  *      forward onto every later row
  *   3. keep probe rows; unpack the carried payload
  *
  * Ties are exact: a build row AT the probe's timestamp is visible
  * (side 0 sorts first), matching `probe.ts >= build.ts` semantics;
  * among equal-ts build rows the greatest `ord` wins — fully
  * deterministic for any input. The build payload is packed into ONE
  * struct before the window so all carried columns always come from the
  * same build row (per-column `last` could mix rows if a carry were
  * null). Skewed keys serialize within their partition — inherent to
  * per-key ordering; AQE's skew handling cannot split a window, so
  * extremely hot keys should be pre-bucketed by a coarser time range.
  */
object AsOfJoin {

  /** @param probe  left side; all its columns pass through
    * @param build  right side; must have `key`, `ts`, `ord` plus ≥1
    *               payload column (payload names must not collide with
    *               probe's columns)
    * @param key    equi-join key column (present on both sides)
    * @param ts     event-time column (same name + comparable type on both)
    * @param ord    unique tiebreaker within (key, ts) on both sides
    */
  def asOf(probe: DataFrame, build: DataFrame,
           key: String, ts: String, ord: String): DataFrame = {
    val fixed = Set(key, ts, ord)
    val carries = build.columns.filterNot(fixed).toSeq
    require(carries.nonEmpty, "build side has no payload columns to carry")
    require(carries.forall(!probe.columns.contains(_)),
      s"carry columns ${carries.mkString(",")} collide with probe columns")

    val packed = build.select(
      col(key) +: col(ts) +: col(ord) +:
        Seq(struct(carries.map(col): _*).as("_asof_carry")): _*)
    val unioned = probe.withColumn("_asof_side", lit(1))
      .unionByName(packed.withColumn("_asof_side", lit(0)),
        allowMissingColumns = true)

    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("_asof_side"), col(ord))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_asof_m", last(col("_asof_carry"), ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 1)

    val out = probe.columns.toSeq.map(col) ++
      carries.map(c => col(s"_asof_m.$c").as(c))
    matched.select(out: _*)
  }
}
