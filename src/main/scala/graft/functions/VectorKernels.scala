package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Primitive-loop kernels over Catalyst ArrayData — called directly from
  * generated code by the expressions in [[VectorExpressions]], so the hot
  * path never boxes an element or materializes a Scala collection.
  * Accumulation is double, left-to-right — bit-identical to the
  * `aggregate(zip_with(...))` fold these kernels replace.
  */
object VectorKernels {

  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    s
  }

  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)

  def l2DistSqFF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble; s += d * d; i += 1
    }
    s
  }

  def l2DistSqDD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); s += d * d; i += 1 }
    s
  }

  def l2DistSqFD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val d = a.getFloat(i).toDouble - b.getDouble(i); s += d * d; i += 1 }
    s
  }

  def l2DistSqDF(a: ArrayData, b: ArrayData): Double = l2DistSqFD(b, a)
}
