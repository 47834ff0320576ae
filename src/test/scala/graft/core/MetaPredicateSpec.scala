package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit gates for [[Engine.compileMetaPredicate]]'s caching and
  * evaluability rules (r13 ADVICE items):
  *
  *  - deterministic predicates are compiled ONCE per thread and reused
  *    (the cache returns the same instance);
  *  - nondeterministic predicates — including ones that only reveal
  *    nondeterminism after resolution, like `expr("rand() < 0.5")` —
  *    are NEVER cached: each query gets a freshly initialized instance;
  *  - predicates containing Unevaluable nodes that only the optimizer
  *    resolves (current_date()/current_timestamp()/now()) compile to
  *    None, routing those queries through the Catalyst path instead of
  *    crashing `bound.eval` at serve time.
  */
class MetaPredicateSpec extends SparkSpec {

  private lazy val engine = new Engine(spark, tmpDir("graft-mpred"))

  test("deterministic predicate is cached per thread (same instance back)") {
    val pred = get_json_object(col("metadata"), "$.doc").cast("long") % 2 === 0
    val a = engine.compileMetaPredicate(pred)
    val b = engine.compileMetaPredicate(pred)
    assert(a.isDefined)
    assert(a.asInstanceOf[AnyRef] eq b.asInstanceOf[AnyRef],
      "second compile of a deterministic predicate should hit the cache")
  }

  test("expr(\"rand() < 0.5\") is never cached — fresh instance per compile") {
    val pred = expr("rand() < 0.5")
    val a = engine.compileMetaPredicate(pred)
    val b = engine.compileMetaPredicate(pred)
    assert(a.isDefined && b.isDefined)
    assert(!(a.asInstanceOf[AnyRef] eq b.asInstanceOf[AnyRef]),
      "nondeterministic predicate must be re-compiled (and re-initialized) per query")
  }

  test("functions.rand() predicate is never cached either") {
    val pred = rand() < 0.5
    val a = engine.compileMetaPredicate(pred)
    val b = engine.compileMetaPredicate(pred)
    assert(a.isDefined && b.isDefined)
    assert(!(a.asInstanceOf[AnyRef] eq b.asInstanceOf[AnyRef]))
  }

  test("Unevaluable time functions compile to None (Catalyst fallback)") {
    assert(engine.compileMetaPredicate(
      current_date() >= to_date(lit("2000-01-01"))).isEmpty)
    assert(engine.compileMetaPredicate(
      unix_timestamp(current_timestamp()) > 0 && col("id") % 2 === 0).isEmpty)
    assert(engine.compileMetaPredicate(expr("now() is not null")).isEmpty)
  }

  test("compiled closure preserves Catalyst filter semantics (TRUE keeps; NULL/FALSE drop)") {
    val p = engine.compileMetaPredicate(
      get_json_object(col("metadata"), "$.v").cast("long") > 5).get
    assert(p(1L, """{"v":9}"""))
    assert(!p(1L, """{"v":3}"""))
    assert(!p(1L, """{"w":9}"""))   // null extraction → NULL → drop
    assert(!p(1L, null))            // null metadata → NULL → drop
  }
}
