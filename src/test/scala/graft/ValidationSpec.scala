package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.core.Engine
import graft.index.IndexParams

/** Port of the reference's validation matrices
  * (tests/unit/test_input_validation.py:10-142 over
  * utils/input_validation.py:6-148): database-name charset, train
  * parameter constraints, add-time shape/dimension enforcement, remove id
  * constraints, query dimension check.
  */
class ValidationSpec extends SparkSpec {

  lazy val engine = new Engine(spark, tmpDir("graft-valid"))

  test("database name: charset matrix (input_validation.py:6-12)") {
    Seq("valid_name", "Valid Name-2", "a", "A-1 _b").foreach { n =>
      engine.create(n)
      assert(engine.exists(n))
      engine.delete(n)
    }
    Seq("bad/name", "bad$name", "", "name!", "näme", "a.b").foreach { n =>
      val e = intercept[IllegalArgumentException](engine.create(n))
      assert(e.getMessage.contains("invalid database name"))
    }
  }

  test("create: duplicate name rejected (mindb.py:42-92)") {
    engine.create("dupdb")
    val e = intercept[IllegalArgumentException](engine.create("dupdb"))
    assert(e.getMessage.contains("already exists"))
  }

  test("add: empty input rejected (input_validation.py:68-69)") {
    engine.create("vdb")
    intercept[IllegalArgumentException] {
      engine.addLocal("vdb", Seq.empty, Seq.empty)
    }
  }

  test("add: wrong vector dimension fails the job (input_validation.py:92-94)") {
    engine.addLocal("vdb", Seq(Array.fill(8)(0.5f)), Seq("{}"))
    val e = intercept[Exception] {
      engine.addLocal("vdb", Seq(Array.fill(9)(0.5f)), Seq("{}"))
    }
    assert(e.getMessage != null)
    assert(engine.count("vdb") == 1L) // failed add leaves the snapshot intact
  }

  test("A3: flat-index memory guard rejects atomically when opted in " +
      "(input_validation.py:101-105, training_utils.py:58-61)") {
    engine.create("memdb", vectorDimension = 8)
    // 10 rows × 8 dims × 4 × 3 = 960 bytes: cap 1000 admits the first 10
    engine.flatAddMemoryGuardBytes = Some(1000L)
    try {
      engine.addLocal("memdb", Seq.fill(10)(Array.fill(8)(0.5f)),
        Seq.fill(10)("{}"))
      assert(engine.count("memdb") == 10L)
      // one more row → 11·8·4·3 = 1056 > 1000: rejected, nothing committed
      val e = intercept[IllegalArgumentException] {
        engine.addLocal("memdb", Seq(Array.fill(8)(0.5f)), Seq("{}"))
      }
      assert(e.getMessage.contains("max memory usage"))
      assert(engine.count("memdb") == 10L)
      // raising the cap admits the same batch — the guard is the only gate
      engine.flatAddMemoryGuardBytes = Some(2000L)
      engine.addLocal("memdb", Seq(Array.fill(8)(0.5f)), Seq("{}"))
      assert(engine.count("memdb") == 11L)
    } finally {
      engine.flatAddMemoryGuardBytes = None
      engine.delete("memdb")
    }
  }

  test("remove: negative ids rejected (input_validation.py:121-126)") {
    val e = intercept[IllegalArgumentException](engine.remove("vdb", Seq(-1L)))
    assert(e.getMessage.toLowerCase.contains("negative"))
  }

  test("query: wrong dimension rejected (input_validation.py:135-148)") {
    intercept[IllegalArgumentException] {
      engine.query("vdb", Array.fill(9)(0.5f), 10, 5)
    }
  }

  test("T20: a failing train leaves the catalog untrained (train.py:74-90)") {
    engine.create("t20db")
    val rnd = new Random(5L)
    engine.addLocal("t20db",
      IndexedSeq.fill(graft.index.Heuristics.FlatIndexFloor)(
        Array.fill(16)(rnd.nextGaussian().toFloat)),
      IndexedSeq.fill(graft.index.Heuristics.FlatIndexFloor)("{}"))
    // destroy the data snapshot mid-lifecycle: training must fail, not
    // corrupt the catalog
    val doc = engine.load("t20db")
    graft.catalog.Catalog.delete(engine.root, s"t20db/data")(engine.hadoopConf)
    intercept[Exception] {
      engine.train("t20db", params = Some(IndexParams(16, 16, 8)), kmeansIters = 1)
    }
    val after = engine.load("t20db")
    assert(!after.isTrained)
    assert(after.indexVersion == doc.indexVersion)
  }

  test("train: parameter matrix (input_validation.py:15-51)") {
    // a db big enough to clear the T3 flat bypass, small dim for speed
    engine.create("tvdb")
    val rnd = new Random(1L)
    engine.addLocal("tvdb",
      IndexedSeq.fill(graft.index.Heuristics.FlatIndexFloor)(
        Array.fill(16)(rnd.nextGaussian().toFloat)),
      IndexedSeq.fill(graft.index.Heuristics.FlatIndexFloor)("{}"))

    def bad(p: IndexParams, frag: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        engine.train("tvdb", params = Some(p), kmeansIters = 1)
      }
      assert(e.getMessage.contains(frag), s"got: ${e.getMessage}")
    }
    bad(IndexParams(32, 16, 8), "larger than the vector dimension") // pca > d
    bad(IndexParams(0, 16, 8), "pca_dimension is not positive")
    bad(IndexParams(16, 16, 0), "compressed_vector_bytes is not positive")
    bad(IndexParams(16, 16, 5), "divisible by compressed_vector_bytes") // 16 % 5
    bad(IndexParams(16, 32, 8, omitOpq = false), "opq_dimension 32 is larger")
    bad(IndexParams(16, 12, 8, omitOpq = false), "opq_dimension 12 is not divisible")
    bad(IndexParams(16, 0, 8, omitOpq = false), "opq_dimension is not positive")
  }
}
