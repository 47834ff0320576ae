package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector scalar functions over `array<float>` / `array<double>` columns.
  *
  * Mirrors the reference's vector math (minDB: input_validation.py:96-99
  * l2-normalize on ingest; query_utils.py:3-8 dot-product cosine;
  * two_level_clustering.py:11-21 L2 assignment) re-expressed as Catalyst
  * array-lambda expressions so the whole hot path stays inside whole-stage
  * codegen — no UDFs, no serialization boundary.
  *
  * All functions compute in Double (deterministic left-to-right `aggregate`
  * folds) regardless of input element type; callers cast back if float
  * storage is wanted.
  */
object VectorFunctions {

  /** Sum of squares of an array column, in double. Native codegen
    * expression since r18 (same left-to-right double fold as the
    * `aggregate` lambda it replaces — bit-identical values; the HOF form
    * ran interpreted, the dominant per-pair cost on the verify joins).
    */
  def sumSq(v: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}
    toCol(SumSq(toExpr(v)))
  }

  /** L2 norm ‖v‖₂. */
  def l2Norm(v: Column): Column = sqrt(sumSq(v))

  import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}

  /** v / ‖v‖₂ — the reference's ingest invariant (input_validation.py:96-99).
    * Elements emitted as double; zero vectors map to zeros (no NaN).
    * Native codegen expression: the previous `transform`+`aggregate`
    * lambda form nested the norm INSIDE the per-element lambda, which the
    * interpreted HOF path re-evaluates per element — O(d²) per row (~15
    * core-minutes per 1M rows at d=768 on the ingest path). Values are
    * bit-identical (same double fold order, same zero-vector → zeros).
    */
  def l2Normalize(v: Column): Column = toCol(L2Normalize(toExpr(v)))

  /** Dot product Σ aᵢ·bᵢ in double (query_utils.py:3-8). On pre-normalized
    * vectors this IS the cosine similarity — the engine's ranking score.
    * Native codegen expression (VectorExpressions) — bit-identical to the
    * `aggregate(zip_with(...))` fold it replaced, minus the boxing.
    */
  def dot(a: Column, b: Column): Column =
    toCol(DotProduct(toExpr(a), toExpr(b)))

  /** Cosine similarity for arbitrary (not necessarily normalized) vectors. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared L2 distance Σ (aᵢ-bᵢ)² — ranking-equivalent to L2 distance,
    * cheaper (no sqrt). Used for centroid assignment (T12). Native codegen
    * expression; same fold order as the lambda form.
    */
  def l2DistSq(a: Column, b: Column): Column =
    toCol(L2DistSq(toExpr(a), toExpr(b)))

  /** L2 distance. */
  def l2Dist(a: Column, b: Column): Column = sqrt(l2DistSq(a, b))

  /** Dense mat-vec: rows is array<array<double>> (the PCA matrix, broadcast
    * as a literal/column), v the input vector. Result dim = len(rows).
    * Reference: PCA/OPQ chain apply, two_level_clustering.py:206-209.
    */
  def matVec(rows: Column, v: Column): Column =
    transform(rows, r => dot(r, v))

}
