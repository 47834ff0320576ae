package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed range (interval) join: all (probe, build) pairs with the
  * same key and `build.ts ∈ [probe.ts − window, probe.ts]` — the "events
  * within the preceding W" join behind attribution windows, feature
  * backfills and interval joins.
  *
  * Spark plans a raw inequality join as BroadcastNestedLoop (or, keyed,
  * as a sort-merge join whose per-key group degenerates to a quadratic
  * scan) — neither survives at scale. This is the bucketed formulation:
  *
  *   1. build rows land in time bucket `ts div window` (exactly one)
  *   2. probe rows replicate to the TWO buckets a window ending at their
  *      ts can overlap (`b−1`, `b` — `floor((t−w)/w) = floor(t/w) − 1`
  *      for integer t, w)
  *   3. ONE equi-join on (key, bucket) + the exact residual range filter
  *
  * Cost: one shuffle of each side on (key, bucket), probe ×2; candidate
  * volume per probe is the build rows in two buckets, not a key's whole
  * history. Output has no duplicates (each build row exists in one
  * bucket). Pick `window` = the query's range so bucket width matches
  * selectivity; the shuffle key includes the bucket, so a hot key's
  * timeline spreads across partitions instead of serializing — unlike
  * per-key sort formulations.
  */
object RangeJoin {

  /** Inner pairs; probe columns pass through + the build payload columns
    * (names must not collide; `key`/`ts` themselves are taken from the
    * probe side, the build's ts must be supplied renamed among its
    * payload columns if wanted downstream — it is also what the range
    * residual evaluates, so it must be present as `buildTs`).
    */
  def joinPreceding(probe: DataFrame, build: DataFrame,
                    key: String, ts: String, buildTs: String,
                    window: Long): DataFrame = {
    require(window > 0, "window must be positive")
    // the build-side key/bucket get private names so a probe and build
    // carved from the SAME scan (the common case) never hit Spark's
    // ambiguous-self-join resolution
    // FLOOR division, not `div`: `div` truncates toward zero, which for
    // negative (pre-epoch / signed) timestamps breaks the invariant
    // floor((t−w)/w) = floor(t/w) − 1 and would silently drop matches —
    // a build row at ts −1 must bucket to −1, not 0.
    def floorDiv(c: String) =
      expr(s"CAST(IF($c >= 0, $c div $window, -(((-$c) + $window - 1) div $window)) AS BIGINT)")
    val b = build.withColumnRenamed(key, "_rj_key")
      .withColumn("_rj_bbucket", floorDiv(buildTs))
    val pb = floorDiv(ts) // integer math — no double round-trip
    val p = probe.withColumn("_rj_bucket", explode(array(pb - 1, pb)))
    p.join(b, col("_rj_bucket") === col("_rj_bbucket") &&
        col(key) === col("_rj_key") &&
        col(buildTs) >= col(ts) - window && col(buildTs) <= col(ts))
      .drop("_rj_key", "_rj_bucket", "_rj_bbucket")
  }
}
