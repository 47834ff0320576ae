package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.LruCache
import graft.index.MemoryModel

/** M7/M8 — port of the reference's cache semantics
  * (tests/unit/test_cache.py over cache/cache.py): LRU order, memory-bound
  * eviction, recency update on get, protected (in-training) entries, and
  * the memory-model formulas.
  */
class LruCacheSpec extends AnyFunSuite {

  private def cache(max: Long, protect: Set[String] = Set.empty) =
    new LruCache[String, Long](max, (v: Long) => v, protect.contains)

  test("put evicts least-recently-used when over budget") {
    val c = cache(100L)
    c.put("a", 40L); c.put("b", 40L); c.put("c", 40L) // a must go
    assert(c.keys == Seq("b", "c"))
    assert(c.memoryUsage == 80L)
  }

  test("get refreshes recency (cache.py move_to_end)") {
    val c = cache(100L)
    c.put("a", 40L); c.put("b", 40L)
    assert(c.get("a").contains(40L))
    c.put("c", 40L) // b is now LRU
    assert(c.keys == Seq("a", "c"))
  }

  test("updateMaxMemory shrink evicts to fit (cache.py:11-27)") {
    val c = cache(100L)
    c.put("a", 40L); c.put("b", 40L)
    c.updateMaxMemory(50L)
    assert(c.keys == Seq("b") && c.memoryUsage == 40L)
  }

  test("protected entries are never evicted (in-training guard, cache.py:20-22)") {
    val c = cache(100L, protect = Set("training"))
    c.put("training", 60L); c.put("b", 40L)
    c.put("c", 40L) // must evict b, not the protected entry
    assert(c.keys.contains("training") && !c.keys.contains("b"))
    c.updateMaxMemory(10L) // only protected remains → stops, stays over budget
    assert(c.keys == Seq("training"))
  }

  test("re-put replaces cost; remove frees") {
    val c = cache(100L)
    c.put("a", 40L); c.put("a", 60L)
    assert(c.memoryUsage == 60L)
    c.remove("a")
    assert(c.memoryUsage == 0L && c.size == 0)
  }

  test("loads of different keys run in parallel; same key loads once") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val c = cache(1000L)
    val loads = new java.util.concurrent.atomic.AtomicInteger(0)
    // blocking{} lets the global EC grow past core count — without it a
    // low-core CI box serializes the sleeps and flakes the timing gate
    def slowLoad(v: Long): Long =
      scala.concurrent.blocking { Thread.sleep(400); loads.incrementAndGet(); v }
    val t0 = System.nanoTime()
    val results = Await.result(Future.sequence(
      Seq("a" -> 10L, "b" -> 20L, "c" -> 30L, "a" -> 10L).map { case (k, v) =>
        Future(c.getOrElseUpdate(k)(slowLoad(v)))
      }), 30.seconds)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(results == Seq(10L, 20L, 30L, 10L))
    // serial loading would take ≥ 1200 ms; parallel per-key loading ~400
    assert(elapsedMs < 1100, s"loads serialized: ${elapsedMs}ms")
    assert(loads.get() == 3, s"same-key concurrent load must run once, ran ${loads.get()}")
  }

  test("memory model golden values (cache.py:105-138)") {
    assert(MemoryModel.estimate(hasVectors = false, isTrained = false, 0, -1, -1) == 48L)
    assert(MemoryModel.flatIndexBytes(30000, 768) == 30000L * 768 * 4 + 240090L)
    assert(MemoryModel.trainedIndexBytes(57638, 768, 32) == 57638L * 40 + 4104704L)
    assert(MemoryModel.trainedIndexBytes(1000, 256, 32) == 1000L * 40 + 1479168L)
    assert(MemoryModel.trainedIndexBytes(1000, 512, 16) == 1000L * 24 + 2529792L)
    assert(MemoryModel.trainedIndexBytes(1000, 1024, 64) == 1000L * 72 + 6203904L)
    assert(MemoryModel.trainedIndexBytes(1000, 300, 32) == 1000L * 40 + 300L * 4092L)
  }
}
