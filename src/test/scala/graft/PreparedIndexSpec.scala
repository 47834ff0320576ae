package graft

import scala.util.Random

import graft.core.Engine

/** The prepared in-memory serving path (`Engine.prepareServing`) must be
  * indistinguishable from `Engine.query` — same rows, same ranks, same
  * doubles — across the handle's whole lifecycle: fresh, after removes
  * (delta-refresh), after adds (side-buffer delta-refresh), and
  * re-prepared.
  * (The DuckDB replay gate for the same property is the `prepared_knn`
  * oracle row.)
  */
class PreparedIndexSpec extends SparkSpec {

  private val D = 64
  private val N = 6000
  private val NumCenters = 40
  private val Seed = 7L
  private val PrelimK = 200
  private val FinalK = 25

  lazy val engine = new Engine(spark, tmpDir("graft-prep"))

  private def mkCorpus(n: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new Random(seed)
    val centers = Array.fill(NumCenters, D)(rnd.nextGaussian().toFloat)
    Array.tabulate(n) { i =>
      val c = centers(i % NumCenters)
      Array.tabulate(D)(j => c(j) + 0.35f * rnd.nextGaussian().toFloat)
    }
  }

  private lazy val queries: Array[Array[Float]] = {
    val rnd = new Random(Seed + 7)
    val corpus = mkCorpus(N, Seed)
    Array.tabulate(8) { qi =>
      corpus((qi * 1357) % N).map(x => x + 0.1f * rnd.nextGaussian().toFloat)
    }
  }

  private def regular(q: Array[Float]): Seq[(Int, Long, String, Double)] =
    engine.query("pdb", q, PrelimK, FinalK).collect().toSeq.map { r =>
      (r.getInt(0), r.getLong(1), r.getString(2), r.getDouble(3))
    }

  private def prepared(p: graft.core.PreparedIndex,
                       q: Array[Float]): Seq[(Int, Long, String, Double)] =
    p.query(q, PrelimK, FinalK).toSeq.map { h =>
      (h.rank, h.id, h.metadata, h.cosineSimilarity)
    }

  private var prep: graft.core.PreparedIndex = _

  test("prepare: build over a trained db") {
    engine.create("pdb")
    engine.addLocal("pdb", mkCorpus(N, Seed).toIndexedSeq,
      (0 until N).map(i => s"""{"doc":$i}"""))
    engine.train("pdb", kmeansIters = 6, seed = Seed, minTrainRows = 1)
    prep = engine.prepareServing("pdb")
    assert(!prep.isStale)
  }

  test("prepared results are EXACTLY the regular path's (all queries)") {
    queries.foreach { q =>
      val exp = regular(q)
      val got = prepared(prep, q)
      assert(got == exp) // exact Double equality — same op sequence
    }
  }

  test("removes delta-refresh in place: still exact, not stale") {
    // remove ids that appear in query 0's current top-k so the refresh is
    // load-bearing, few enough that threshold compaction can't trigger
    val victims = regular(queries(0)).take(3).map(_._2)
    engine.remove("pdb", victims)
    assert(!prep.isStale, "removes must not invalidate the pinned blocks")
    queries.take(4).foreach { q =>
      val exp = regular(q)
      assert(!exp.exists(r => victims.contains(r._2)))
      assert(prepared(prep, q) == exp)
    }
  }

  test("adds delta-refresh into the side buffer: exact, NOT stale") {
    val rnd = new Random(Seed + 99)
    val fresh = Array.tabulate(50)(_ =>
      Array.tabulate(D)(_ => rnd.nextGaussian().toFloat))
    val (firstId, _) = engine.addLocal("pdb", fresh.toIndexedSeq,
      (0 until 50).map(i => s"""{"new":$i}"""))
    // a bounded add must NOT degrade the handle — the side buffer absorbs it
    assert(!prep.isStale,
      "adds within MaxPreparedSideRows must not flip isStale")
    queries.take(4).foreach { q =>
      assert(prepared(prep, q) == regular(q))
    }
    // the side buffer is LOAD-BEARING: querying a just-added vector must
    // surface its id at rank 1 — the pinned blocks alone (fenced at
    // prepare-time maxId) cannot supply it
    val got = prepared(prep, fresh(7))
    assert(got == regular(fresh(7)))
    assert(got.head._2 == firstId + 7,
      s"side buffer missed the appended row: got ${got.head}")
    // removing an appended row must delta-refresh it away from the side
    // scan too (deletes apply before the ADC heap in both scans)
    engine.remove("pdb", Seq(firstId + 7))
    val after = prepared(prep, fresh(7))
    assert(after == regular(fresh(7)))
    assert(!after.exists(_._2 == firstId + 7))
    assert(!prep.isStale)
  }

  test("re-prepare after churn serves the new shape in-memory again") {
    val fresh = engine.prepareServing("pdb")
    assert(!fresh.isStale)
    queries.foreach { q =>
      assert(prepared(fresh, q) == regular(q))
    }
    fresh.close()
  }

  test("closed handle refuses queries") {
    prep.close()
    intercept[IllegalArgumentException] { prep.query(queries(0), PrelimK, FinalK) }
  }
}
