package graft.core

import graft.SparkSpec

/** Pins the serving-doc cache's double-check eviction (VERDICT r16
  * "what's wrong" #3 / ADVICE r16 #1): the cold-path put in
  * `loadForServing` is check-then-put, so a writer's complete `saveDoc`
  * (catalog save + generation bump + cache remove) can land ENTIRELY
  * between the reader's generation re-check and its cache put. Without
  * the post-put re-validation that interleaving re-caches the pre-write
  * doc with a fresh TTL and same-driver reads serve it for up to
  * ServingDocTtlNanos — violating the documented "same-driver reads
  * stay exact" contract. The seam (`docCachePutSeam`) injects the write
  * at exactly that point, deterministically.
  */
class CachedDocRaceSpec extends SparkSpec {

  test("a save landing between generation check and cache put is never served stale") {
    val engine = new Engine(spark, tmpDir("graft-docrace"))
    engine.create("race", 4)
    engine.addLocal("race", Seq(Array(1f, 0f, 0f, 0f)), Seq(null))
    // the add's saveDoc just removed the cache entry, so the next
    // loadRecheck takes the cold path; arm the seam to run a FULL
    // second add (save + generation increment + cache remove) inside
    // the check-to-put window
    var fired = false
    engine.docCachePutSeam = () => {
      if (!fired) {
        fired = true
        engine.addLocal("race", Seq(Array(0f, 1f, 0f, 0f)), Seq(null))
      }
    }
    try {
      val during = engine.loadRecheck("race")
      assert(fired, "seam did not fire - the read took the cached path")
      // THIS call may legitimately return the pre-write doc (it is "a
      // catalog state observed during the call"); the contract is about
      // what later reads serve
      val after = engine.loadRecheck("race")
      assert(after.maxId == during.maxId + 1 &&
        after.numNewVectors == during.numNewVectors + 1,
        s"pre-write doc was re-cached and served stale inside the TTL: " +
          s"during=(maxId ${during.maxId}) after=(maxId ${after.maxId})")
    } finally engine.docCachePutSeam = () => ()
  }

  test("no interleaving write: the cold read is cached and reused") {
    val engine = new Engine(spark, tmpDir("graft-docrace2"))
    engine.create("race2", 4)
    engine.addLocal("race2", Seq(Array(1f, 0f, 0f, 0f)), Seq(null))
    val a = engine.loadRecheck("race2")
    val b = engine.loadRecheck("race2")
    assert(a eq b, "second read inside the TTL should hit the cache")
  }
}
