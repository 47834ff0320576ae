package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): Double = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).head().getDouble(0)
  }

  test("dot product") {
    val a = typedLit(Seq(1.0f, 2.0f, 3.0f))
    val b = typedLit(Seq(4.0f, -5.0f, 6.0f))
    assert(math.abs(one(dot(a, b)) - 12.0) < 1e-9)
  }

  test("l2 norm and normalize") {
    val v = typedLit(Seq(3.0f, 4.0f))
    assert(math.abs(one(l2Norm(v)) - 5.0) < 1e-9)
    assert(math.abs(one(l2Norm(l2Normalize(v))) - 1.0) < 1e-12)
    // zero vector maps to zeros, not NaN
    assert(one(l2Norm(l2Normalize(typedLit(Seq(0.0f, 0.0f))))) == 0.0)
  }

  test("l2 distance") {
    val a = typedLit(Seq(1.0f, 1.0f))
    val b = typedLit(Seq(4.0f, 5.0f))
    assert(math.abs(one(l2DistSq(a, b)) - 25.0) < 1e-9)
    assert(math.abs(one(l2Dist(a, b)) - 5.0) < 1e-9)
  }

  test("cosine of identical vectors is 1") {
    val a = typedLit(Seq(0.3f, -0.7f, 0.11f))
    assert(math.abs(one(cosine(a, a)) - 1.0) < 1e-6)
  }

  test("matVec") {
    val m = typedLit(Seq(Seq(1.0, 0.0), Seq(0.0, 2.0), Seq(1.0, 1.0)))
    val v = typedLit(Seq(3.0, 4.0))
    import spark.implicits._
    val r = Seq(1).toDF("x").select(matVec(m, v).as("r"))
      .head().getSeq[Double](0)
    assert(r == Seq(3.0, 8.0, 7.0))
  }

  test("normalization invariant on testdata embeddings (ingest invariant A2)") {
    val e = sf("sf0.001", "embeddings")
    val bad = e.select(l2Norm(col("embedding")).as("n"))
      .filter(abs(col("n") - 1.0) > 1e-3).count()
    assert(bad == 0)
  }
}
