package graft

import scala.util.Random

import graft.core.Engine

/** Exact port of the reference's coverage-ratio state machine
  * (tests/integration/test_index_coverage_ratio.py:24-57):
  * add → 0, train → 1, add-as-many-again → 0.5, remove-all-trained → 0,
  * with the typed Dataset view sanity-checked along the way.
  */
class CoverageStateSpec extends SparkSpec {

  test("coverage ratio walks 0 -> 1 -> 0.5 -> 0 through add/train/add/remove") {
    val engine = new Engine(spark, tmpDir("graft-cov"))
    engine.create("cov")
    val rnd = new Random(7L)
    def batch(n: Int) = IndexedSeq.fill(n)(Array.fill(16)(rnd.nextGaussian().toFloat))

    val n = graft.index.Heuristics.FlatIndexFloor // 5000 — minimum trainable
    engine.addLocal("cov", batch(n), IndexedSeq.fill(n)("{}"))
    assert(engine.coverageRatio("cov") == 0.0) // never trained

    engine.train("cov", params = Some(graft.index.IndexParams(16, 16, 8)),
      kmeansIters = 2, seed = 1L)
    assert(engine.coverageRatio("cov") == 1.0)

    engine.addLocal("cov", batch(n), IndexedSeq.fill(n)("{}"))
    assert(engine.coverageRatio("cov") == 0.5) // trained/(trained+new)

    val removed = engine.remove("cov", 0L until n.toLong)
    assert(removed == n.toLong)
    assert(engine.coverageRatio("cov") == 0.0) // (trained-removed)/(trained+new)

    // typed view round-trips the remaining rows
    val ds = engine.dataTyped("cov")
    assert(ds.count() == n.toLong)
    val row = ds.head()
    assert(row.id >= n.toLong && row.vector.length == 16 && row.metadata == "{}")
  }
}
