package graft

import org.apache.spark.sql.functions._

import graft.core.Engine
import graft.functions.VectorFunctions

/** Flat-path engine end-to-end — the semantics of the reference's
  * tests/integration/test_small_mindb.py: add → exact query (recall ≥
  * 0.999 ≡ exact here), cosine ∈ [0,1], remove, counters.
  */
class EngineFlatSpec extends SparkSpec {

  lazy val engine = new Engine(spark, tmpDir("graft-engine"))

  private def embeddings = sf("sf0.001", "embeddings")

  test("create/add/count/info round-trip") {
    engine.create("flatdb")
    val rows = embeddings.select(col("embedding").as("vector"),
      to_json(struct(col("label"), col("vec_id"))).as("metadata"))
    val (first, last) = engine.add("flatdb", rows)
    assert(first == 0L && last == 499L)
    assert(engine.count("flatdb") == 500L)
    val info = engine.info("flatdb")
    assert(info("vector_dimension") == 64)
    assert(info("trained") == false)
    assert(info("max_id") == 499L)
  }

  test("sequential id assignment continues from max_id") {
    val (first, last) = engine.addLocal("flatdb",
      Seq(Array.fill(64)(0.1f), Array.fill(64)(0.2f)), Seq("{}", "{}"))
    assert(first == 500L && last == 501L)
    engine.remove("flatdb", Seq(500L, 501L))
    assert(engine.count("flatdb") == 500L)
  }

  test("flat query is exact: top-1 of a stored vector is itself, cosine≈1") {
    val q = embeddings.filter(col("vec_id") === 123).head().getSeq[Float](1).toArray
    val res = engine.query("flatdb", q, finalTopK = 10).collect()
    assert(res.length == 10)
    assert(res(0).getLong(1) == 123L)
    assert(math.abs(res(0).getDouble(3) - 1.0) < 1e-5)
    // cosine in [0,1]-ish for same-sign data; at minimum within [-1,1]
    assert(res.forall(r => r.getDouble(3) <= 1.0 + 1e-6 && r.getDouble(3) >= -1.0 - 1e-6))
    // ranks are 1..k ordered by similarity desc
    assert(res.map(_.getInt(0)).toSeq == (1 to 10))
    val sims = res.map(_.getDouble(3)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("flat query matches brute-force oracle on all ids") {
    val q = embeddings.filter(col("vec_id") === 7).head().getSeq[Float](1).toArray
    val res = engine.query("flatdb", q, finalTopK = 20).collect().map(_.getLong(1))
    val qLit = typedLit(q.toSeq)
    val expected = engine.data("flatdb")
      .select(col("id"), VectorFunctions.dot(col("vector"), qLit).as("s"))
      .orderBy(col("s").desc, col("id")).limit(20).collect().map(_.getLong(0))
    assert(res.toSeq == expected.toSeq)
  }

  test("remove updates counters and excludes from queries") {
    val q = embeddings.filter(col("vec_id") === 123).head().getSeq[Float](1).toArray
    val deleted = engine.remove("flatdb", Seq(123L, 999999L))
    assert(deleted == 1L)
    val res = engine.query("flatdb", q, finalTopK = 5).collect()
    assert(!res.map(_.getLong(1)).contains(123L))
    engine.addLocal("flatdb", Seq(q), Seq("""{"restored":true}"""))
  }

  test("vacuum grace window retains freshly superseded versions") {
    engine.remove("flatdb", Seq(42L))
    val live = engine.count("flatdb")
    engine.compact("flatdb") // bumps dataVersion; old version marked superseded now
    // superseded moments ago → a 1h grace refuses to sweep anything
    assert(engine.vacuum("flatdb", graceMillis = 60L * 60 * 1000) == 0)
    // grace 0 sweeps the stale data version (+ its deletes dir)
    assert(engine.vacuum("flatdb") >= 1)
    assert(engine.count("flatdb") == live)
    engine.addLocal("flatdb", Seq(Array.fill(64)(0.3f)), Seq("{}")) // restore count
  }

  test("batched flat query: per-query top-k") {
    import spark.implicits._
    val queries = embeddings.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val res = engine.queryBatchFlat("flatdb", queries, finalTopK = 5)
    val byQ = res.collect().groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    assert(byQ.values.forall(_.length == 5))
    // each query's own vector ranks first (123 was deleted, 0-2 are present)
    byQ.foreach { case (qid, rows) =>
      assert(rows.minBy(_.getInt(4)).getLong(1) == qid)
    }
  }
}
