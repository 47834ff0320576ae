package graft

import scala.util.Random

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.Engine

/** Adversarial gate for the round-13 flagship: the routed filtered query
  * must equal the Catalyst predicate path for EVERY predicate a caller
  * can express over (id, metadata) — not just the three hand-picked
  * branch tests. A seeded grammar generates conjunctions/disjunctions/
  * negations of json extractions, arithmetic, string ops, null probes,
  * and always-true/false/empty/unresolvable edges; each must produce
  * bit-identical rows through `engine.query(.., Some(pred))` (which
  * routes, widens, flat-falls-back, or Catalyst-reroutes as the
  * predicate demands) and `engine.queryCatalyst(.., Some(pred))`.
  */
class FilteredFuzzSpec extends SparkSpec {

  private val D = 64
  private val N = 4000
  private val Seed = 23L
  private val PrelimK = 150
  private val FinalK = 20

  private lazy val engine = new Engine(spark, tmpDir("graft-ffuzz"))

  private lazy val queries: Array[Array[Float]] = {
    val rnd = new Random(Seed)
    val centers = Array.fill(25, D)(rnd.nextGaussian().toFloat)
    val corpus = Array.tabulate(N) { i =>
      val c = centers(i % 25)
      Array.tabulate(D)(j => c(j) + 0.3f * rnd.nextGaussian().toFloat)
    }
    engine.create("fz")
    engine.addLocal("fz", corpus.toIndexedSeq,
      (0 until N).map(i => s"""{"doc":$i,"tag":"t${i % 7}"}"""))
    engine.train("fz", kmeansIters = 4, seed = Seed, minTrainRows = 1)
    Array.tabulate(3)(qi =>
      corpus((qi * 911) % N).map(x => x + 0.1f * rnd.nextGaussian().toFloat))
  }

  private def j: Column =
    get_json_object(col("metadata"), "$.doc").cast("long")

  private def atom(rnd: Random): Column = rnd.nextInt(12) match {
    case 0 => j % (2 + rnd.nextInt(9)) === rnd.nextInt(3)
    case 1 => j < rnd.nextInt(N)
    case 2 => j >= rnd.nextInt(N)
    case 3 => col("id") % (2 + rnd.nextInt(5)) === 0
    case 4 => col("id") < rnd.nextInt(N)
    case 5 => get_json_object(col("metadata"), "$.tag") === s"t${rnd.nextInt(9)}"
    case 6 => length(col("metadata")) % (2 + rnd.nextInt(4)) === rnd.nextInt(2)
    case 7 => get_json_object(col("metadata"), "$.missing").isNull
    case 8 => col("metadata").contains(rnd.nextInt(10).toString)
    case 9 => j.isNotNull
    // time functions are Unevaluable until the optimizer runs
    // (ComputeCurrentTime) — they must route to Catalyst, never crash
    // the compiled-predicate path (ADVICE r13)
    case 10 => j < rnd.nextInt(N) &&
      current_date() >= to_date(lit("2000-01-01"))
    case 11 => current_timestamp().isNotNull && col("id") % 2 === 0
  }

  private def gen(rnd: Random, depth: Int): Column =
    if (depth == 0) atom(rnd)
    else rnd.nextInt(4) match {
      case 0 => gen(rnd, depth - 1) && gen(rnd, depth - 1)
      case 1 => gen(rnd, depth - 1) || gen(rnd, depth - 1)
      case 2 => !gen(rnd, depth - 1)
      case _ => atom(rnd)
    }

  private def check(pred: Column, label: String): Unit = {
    for (q <- queries) {
      val exp = engine.queryCatalyst("fz", q, PrelimK, FinalK, Some(pred))
        .collect().toSeq.map(r => (r.getInt(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getString(2), r.getDouble(3)))
      val got = engine.query("fz", q, PrelimK, FinalK, Some(pred))
        .collect().toSeq.map(r => (r.getInt(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getString(2), r.getDouble(3)))
      assert(got == exp, s"routed/catalyst divergence under [$label]")
    }
  }

  test("30 seeded random predicates: routed == Catalyst on every one") {
    val rnd = new Random(Seed * 31)
    for (i <- 0 until 30) check(gen(rnd, 2), s"fuzz#$i")
  }

  test("concurrent filtered callers: 8 threads share one predicate object, all exact") {
    // the compiled-predicate cache is per-THREAD because interpreted
    // eval nodes keep per-instance scratch state; this drives the cache
    // from a fresh pool (every thread compiles once, then reuses) while
    // sharing the SAME Column object across threads — any cross-thread
    // state bleed or race shows up as a wrong row vs the single-threaded
    // ground truth
    val pred = j % 3 === 0 && get_json_object(col("metadata"), "$.tag") =!= "t5"
    val expected = queries.map(q =>
      engine.queryCatalyst("fz", q, PrelimK, FinalK, Some(pred)).collect()
        .toSeq.map(r => (r.getInt(0), r.getLong(1), r.getString(2),
          r.getDouble(3))))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (0 until 32).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            val qi = i % queries.length
            val got = engine.queryHits("fz", queries(qi), PrelimK, FinalK,
                Some(pred))
              .toSeq.map(h => (h.rank, h.id, h.metadata, h.cosineSimilarity))
            got == expected(qi)
          }
        })
      }
      assert(tasks.forall(_.get()), "concurrent filtered divergence")
    } finally { pool.shutdown() }
  }

  test("edge predicates: always-true, always-false, null-tainted, unresolvable") {
    check(lit(true), "always-true")
    check(lit(false), "always-false")
    check(get_json_object(col("metadata"), "$.missing") > 1, "null-tainted")
    // bare Unevaluable time predicates (r13 ADVICE: these crashed
    // query() at serve time — bound.eval on a node only the optimizer
    // can resolve); the compiler must hand them to Catalyst
    check(current_date() >= to_date(lit("2000-01-01")) && j % 3 === 0,
      "current_date-conjunct")
    check(unix_timestamp(current_timestamp()) > 0, "current_timestamp")
    // a predicate outside (id, metadata) cannot compile against the
    // candidate schema — the routed entry must reroute to Catalyst and
    // both sides then throw the same analysis error OR evaluate; for
    // this schema it simply fails analysis in BOTH paths, so assert the
    // routed path surfaces the same exception class instead of a wrong
    // answer
    val bad = col("no_such_column") === 1
    val e1 = intercept[Exception] {
      engine.queryCatalyst("fz", queries(0), PrelimK, FinalK, Some(bad)).collect()
    }
    val e2 = intercept[Exception] {
      engine.query("fz", queries(0), PrelimK, FinalK, Some(bad)).collect()
    }
    assert(e1.getClass == e2.getClass,
      s"divergent failure: ${e1.getClass} vs ${e2.getClass}")
  }
}
