package graft.core

import scala.collection.mutable

/** M7 — memory-bounded LRU cache, the Spark-side port of the reference's
  * `LRUCache` (cache/cache.py:5-102): insertion/access-ordered map,
  * eviction by an estimated per-entry byte cost until under `maxMemory`,
  * and a protection predicate standing in for the reference's "don't evict
  * a db that is mid-training" operations check (cache.py:20-22, 58-60).
  *
  * Driver-local and synchronized — it caches small index artifacts
  * (IndexModel: O(d² + nlist·p + m·256·sub) bytes), never data.
  */
final class LruCache[K, V](@volatile var maxMemory: Long,
                           estimate: V => Long,
                           isProtected: K => Boolean = (_: K) => false,
                           onEvict: (K, V) => Unit = (_: K, _: V) => ()) {

  private val entries = mutable.LinkedHashMap.empty[K, V]
  private var currentMemory = 0L
  // per-key load monitors: concurrent loads of DIFFERENT keys proceed in
  // parallel (an index-model load takes seconds — holding the global lock
  // through it would stall every query on every other db), while loads of
  // the SAME key serialize so the loader runs once.
  private val loaders = scala.collection.concurrent.TrieMap.empty[K, Object]

  def memoryUsage: Long = synchronized(currentMemory)
  def size: Int = synchronized(entries.size)
  def keys: Seq[K] = synchronized(entries.keys.toSeq)

  def get(key: K): Option[V] = synchronized {
    entries.remove(key).map { v =>
      entries.put(key, v) // re-insert → most recently used
      v
    }
  }

  /** Cached value or `load` it — the load runs OUTSIDE the global lock,
    * guarded by a per-key monitor (double-checked after acquiring it).
    * Single-flight is best-effort: concurrent same-key callers serialize
    * on one monitor so the loader normally runs once; only the rare
    * interleaving "loader finished → entry immediately evicted → a third
    * caller installs a fresh monitor while a waiter is still inside the
    * old one" can duplicate a load (consistent result either way — `put`
    * is idempotent). The conditional remove keeps a finishing waiter from
    * discarding a newer loader's monitor.
    */
  def getOrElseUpdate(key: K)(load: => V): V =
    get(key).getOrElse {
      val mon = loaders.getOrElseUpdate(key, new Object)
      try mon.synchronized {
        get(key).getOrElse {
          val v = load
          put(key, v)
          v
        }
      } finally loaders.remove(key, mon)
    }

  def put(key: K, value: V): Unit = synchronized {
    entries.remove(key).foreach(old => currentMemory -= estimate(old))
    val cost = estimate(value)
    evictUntil(maxMemory - cost)
    entries.put(key, value)
    currentMemory += cost
  }

  def remove(key: K): Unit = synchronized {
    entries.remove(key).foreach(v => currentMemory -= estimate(v))
  }

  def removeIf(p: K => Boolean): Unit = synchronized {
    entries.keys.filter(p).toSeq.foreach(remove)
  }

  /** Shrink (or grow) the budget and evict to fit (cache.py:11-27). */
  def updateMaxMemory(newMax: Long): Unit = synchronized {
    maxMemory = newMax
    evictUntil(maxMemory)
  }

  /** Evict least-recently-used unprotected entries until usage ≤ budget;
    * stops early if only protected entries remain (cache.py:58-66).
    * `onEvict` fires per victim so dependent resources (e.g. the
    * per-version model broadcast) are released under the same budget.
    */
  private def evictUntil(budget: Long): Unit = {
    var candidates = entries.keys.filterNot(isProtected).toList
    while (currentMemory > budget && candidates.nonEmpty) {
      val victim = candidates.head
      candidates = candidates.tail
      entries.remove(victim).foreach { v =>
        currentMemory -= estimate(v)
        onEvict(victim, v)
      }
    }
  }
}
