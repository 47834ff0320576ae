package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Native codegen expressions: value parity with the lambda fold they
  * replaced, float/double type combinations, null handling, SQL
  * registration via GraftExtensions, and presence inside
  * WholeStageCodegen (no fallback to interpreted eval).
  */
class VectorExpressionsSpec extends SparkSpec {

  import spark.implicits._

  test("dot/l2_dist_sq equal the aggregate(zip_with) fold bit-for-bit") {
    val df = sf("sf0.001", "embeddings").limit(50)
      .select(col("embedding").as("a"),
        reverse(col("embedding")).as("b"))
    val lambdaDot = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0d), (acc, x) => acc + x)
    val lambdaDist = aggregate(zip_with(col("a"), col("b"), (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0d), (acc, x) => acc + x)
    val rows = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("nd"), lambdaDot.as("ld"),
      VectorFunctions.l2DistSq(col("a"), col("b")).as("ns"), lambdaDist.as("ls"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // bitwise-equal doubles
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }

  test("mixed float/double array inputs dispatch the right kernel") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(0.5d, 0.25d))).toDF("f", "d")
    val r = df.select(
      VectorFunctions.dot(col("f"), col("d")),
      VectorFunctions.dot(col("d"), col("f")),
      VectorFunctions.l2DistSq(col("f"), col("d"))).head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 0.25 + 3.0625)
  }

  test("null input yields null") {
    val df = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]])).toDF("a", "b")
    assert(df.select(VectorFunctions.dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("dot stays inside WholeStageCodegen (no fallback)") {
    // whole-stage-codegen'd operators print with the "*(n)" prefix
    val plan = sf("sf0.001", "embeddings")
      .select(VectorFunctions.dot(col("embedding"), col("embedding")).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(500))
  }

  test("GraftExtensions registers SQL functions") {
    // getOrCreate reuses the active session, so detach it first; the new
    // session shares the SparkContext but gets its own (extended) state
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // (the "spark.sql.extensions" config string works identically on a
    // fresh SparkContext; here the context already exists, so inject
    // through the builder API)
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = s2.sql(
        "SELECT dot_f32(array(1.0D, 2.0D), array(3.0D, 0.5D)) AS d, " +
          "l2_dist_sq(array(1.0D), array(4.0D)) AS s").head()
      assert(r.getDouble(0) == 4.0)
      assert(r.getDouble(1) == 9.0)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
