package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, L2DistSq}

/** SparkSessionExtensions hook: registers the native vector expressions as
  * SQL functions, so `spark.sql("SELECT dot_f32(a, b) ...")` works in any
  * session built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String): ExpressionInfo =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

    ext.injectFunction((
      FunctionIdentifier("dot_f32"),
      info("dot_f32", "dot_f32(a, b) - dot product of two float/double array vectors (double)"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_f32 takes exactly 2 arguments")
        DotProduct(children(0), children(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("l2_dist_sq"),
      info("l2_dist_sq", "l2_dist_sq(a, b) - squared L2 distance of two array vectors (double)"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "l2_dist_sq takes exactly 2 arguments")
        L2DistSq(children(0), children(1))
      }))
  }
}
