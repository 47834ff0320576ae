package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding storage quantization — the cheap linear counterpart to the
  * engine's trained PQ path: per-vector max-abs int8 (the standard
  * "symmetric per-row" scheme), q_i = round(x_i · 127 / max|x|), stored
  * alongside one float scale. 4× smaller at rest than float32 with exact
  * per-element reconstruction x̂_i = q_i · scale / 127 — the storage
  * format a 100 TB embedding corpus would actually keep hot.
  *
  * All math is a pure per-row projection in double with a fixed op order
  * (x·127/scale, round half away from zero), so quantized codes are
  * integer-exact and reproducible in the SQL oracle.
  */
object Quantization {

  /** Per-vector max-abs scale. */
  def maxAbsScale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** int8 codes as `array<long>` (zero vectors quantize to zeros). */
  def int8Codes(vec: Column, scale: Column): Column =
    transform(vec, x =>
      round(when(scale === 0.0, 0.0)
        .otherwise(x.cast("double") * 127.0 / scale)).cast("long"))

  /** Summary projection for a quantized column: scale plus integer-exact
    * digests of the code vector (sum, L1 mass, first/last element).
    *
    * The five output columns each inline `scale`/`q` after
    * CollapseProject (HOF subtrees are excluded from codegen CSE), so the
    * per-row fold runs up to ~6×. Deliberate: that is a FIXED ~6·d flops
    * per row — unlike the token-hashing kernels this module family moved
    * off HOFs for — and staying in Catalyst keeps `round()` semantics
    * bit-identical to the SQL oracle's.
    */
  def int8Stats(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scale = maxAbsScale(col(vecCol))
    val q = int8Codes(col(vecCol), scale)
    df.select(col(idCol),
      round(scale, 6).as("scale"),
      aggregate(q, lit(0L), (acc, x) => acc + x).as("q_sum"),
      aggregate(q, lit(0L), (acc, x) => acc + abs(x)).as("q_abs_sum"),
      element_at(q, 1).as("q_first"),
      element_at(q, -1).as("q_last"))
  }
}
