package graft.core

import scala.util.Random

import graft.SparkSpec
import graft.index.IndexParams

/** Gates for [[Engine.catalystWarmServe]] (r18): queryCatalyst's
  * no-predicate trained branch may serve from an already-warm prepared
  * handle, but (a) the rows must be bit-identical to the pure plan path,
  * (b) queryCatalyst must never BUILD a handle, and (c) its
  * read-your-writes contract must survive — an add the handle has not
  * folded yet routes the query back to the plan path
  * ([[PreparedIndex.coversAddsOf]]), so the new rows are visible
  * immediately even though the handle's adds-refresh is debounced.
  */
class CatalystWarmServeSpec extends SparkSpec {

  private val D = 12
  private val Seed = 23L

  private def build(dir: String, debounceMs: Long): Engine = {
    val e = new Engine(spark, tmpDir(dir)) {
      override protected def chooseCodedBucketShift(nn: Long, nlist: Int,
                                                    d: Int, m: Int): Int = 2
      override protected def autoPreparedAddsRefreshMs: Long = debounceMs
    }
    val rnd = new Random(Seed)
    val centers = Array.fill(10, D)(rnd.nextGaussian().toFloat)
    val vecs = Seq.tabulate(1600) { i =>
      val c = centers(i % 10)
      Array.tabulate(D)(j => c(j) + 0.3f * rnd.nextGaussian().toFloat)
    }
    e.create("db", vectorDimension = D)
    e.addLocal("db", vecs, Seq.tabulate(1600)(i => s"""{"i":$i}"""))
    e.train("db", params = Some(IndexParams(D, D, 4, omitOpq = true)),
      kmeansIters = 3, seed = Seed, minTrainRows = 1)
    e
  }

  test("warm-serve rows are bit-identical to the pure plan path") {
    val e = build("graft-warmserve-eq", debounceMs = 100L)
    val rnd = new Random(Seed + 1)
    val qs = Array.fill(4)(Array.fill(D)(rnd.nextGaussian().toFloat))
    // warm the handle through the public routed path
    e.query("db", qs(0), 120, 10).collect()
    qs.foreach { q =>
      val warm = e.queryCatalyst("db", q, 120, 10).collect().map(_.toSeq).toSeq
      e.catalystWarmServe = false
      val pure = try e.queryCatalyst("db", q, 120, 10).collect().map(_.toSeq).toSeq
      finally e.catalystWarmServe = true
      assert(warm == pure, "warm-serve diverged from the pure plan path")
      assert(warm.nonEmpty)
    }
  }

  test("queryCatalyst never builds a handle (cold engine stays on the plan path)") {
    val e = build("graft-warmserve-cold", debounceMs = 100L)
    // no engine.query/queryHits has run: the first catalyst call must not
    // pay (or trigger) a prepared block build — observable as the engine
    // serving without any handle existing afterwards
    val rows = e.queryCatalyst("db", Array.fill(D)(0.1f), 120, 10).collect()
    assert(rows.nonEmpty)
    assert(!e.hasAutoPrepared("db"),
      "queryCatalyst built a prepared handle - warm-serve must be opportunistic")
  }

  test("read-your-writes: an add inside the debounce window is visible immediately") {
    // a LONG debounce so the handle provably cannot have folded the add
    val e = build("graft-warmserve-ryw", debounceMs = 600000L)
    val rnd = new Random(Seed + 2)
    val q = Array.fill(D)(rnd.nextGaussian().toFloat)
    e.query("db", q, 120, 10).collect() // warm the handle
    // a marker row exactly at the query point dominates the top-1
    val marker = q.map(x => x * 10f)
    e.addLocal("db", Seq(marker), Seq("""{"marker":true}"""))
    val top = e.queryCatalyst("db", q, 120, 1).collect()
    assert(top.nonEmpty && top.head.getString(2) == """{"marker":true}""",
      "freshly-added row invisible through queryCatalyst - read-your-writes broken")
  }
}
