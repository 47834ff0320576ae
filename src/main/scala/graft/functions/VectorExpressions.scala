package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the engine's hot vector math (SURVEY §4
  * custom-expression inventory): codegen emits a direct static call into
  * [[VectorKernels]] — no UDF serialization boundary, no per-element
  * boxing, results bit-identical to the array-lambda fold they replace
  * (double accumulation, left-to-right).
  *
  * Reference semantics: dot-product cosine (minDB query_utils.py:3-8), L2
  * distance assignment (two_level_clustering.py:11-21).
  */
abstract class BinaryVectorExpression extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  /** VectorKernels method base name ("dot" / "l2DistSq"). */
  protected def kernel: String

  private def elemSuffix(e: Expression): String = e.dataType match {
    case ArrayType(FloatType, _) => "F"
    case _ => "D"
  }

  protected def kernelName: String = s"$kernel${elemSuffix(left)}${elemSuffix(right)}"

  private lazy val fn: (ArrayData, ArrayData) => Double = kernelName match {
    case "dotFF" => VectorKernels.dotFF
    case "dotDD" => VectorKernels.dotDD
    case "dotFD" => VectorKernels.dotFD
    case "dotDF" => VectorKernels.dotDF
    case "l2DistSqFF" => VectorKernels.l2DistSqFF
    case "l2DistSqDD" => VectorKernels.l2DistSqDD
    case "l2DistSqFD" => VectorKernels.l2DistSqFD
    case "l2DistSqDF" => VectorKernels.l2DistSqDF
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    fn(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.$kernelName($a, $b);")
}

/** Σ aᵢ·bᵢ in double — cosine similarity on pre-normalized vectors. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override protected def kernel: String = "dot"
  override def prettyName: String = "dot_f32"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ (aᵢ−bᵢ)² in double — ranking-equivalent to L2 distance, no sqrt. */
case class L2DistSq(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override protected def kernel: String = "l2DistSq"
  override def prettyName: String = "l2_dist_sq"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σx² in double — the norm building block. Native codegen expression:
  * the `aggregate(...)` higher-order-function form this replaces runs on
  * Catalyst's interpreted HOF path (boxing every element), which measured
  * as the dominant per-pair cost on the cosine verify joins.
  */
case class SumSq(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${dt.simpleString}")
  }

  override def dataType: DataType = DoubleType

  private def kernelName: String = child.dataType match {
    case ArrayType(FloatType, _) => "sumSqF"
    case _ => "sumSqD"
  }

  override def nullSafeEval(a: Any): Any = kernelName match {
    case "sumSqF" => VectorKernels.sumSqF(a.asInstanceOf[ArrayData])
    case _ => VectorKernels.sumSqD(a.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorKernels.$kernelName($a);")

  override def prettyName: String = "sum_sq"
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** v / ‖v‖₂ as one native pass (the ingest invariant,
  * input_validation.py:96-99). Output is array<double>; zero vectors map
  * to zeros. Replaces the `transform(aggregate(...))` lambda whose norm
  * sub-expression re-evaluated per element — O(d²) interpreted evals per
  * row vs this kernel's O(d).
  */
case class L2Normalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def kernelName: String = child.dataType match {
    case ArrayType(FloatType, _) => "l2normF"
    case _ => "l2normD"
  }

  override def nullSafeEval(a: Any): Any = kernelName match {
    case "l2normF" => VectorKernels.l2normF(a.asInstanceOf[ArrayData])
    case _ => VectorKernels.l2normD(a.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorKernels.$kernelName($a);")

  override def prettyName: String = "l2_normalize"
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
