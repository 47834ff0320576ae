package graft

import java.util.concurrent.CountDownLatch

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.core.Engine
import graft.index.IndexParams

/** M5/M6 — the training-concurrency surface, driven both DETERMINISTICALLY
  * (the `onSnapshot` / `onSwapped` seams pin mutations inside exact windows
  * of the train lifecycle) and as a REAL race (`trainAsync` with adds and
  * removes issued from the test thread while the train thread runs).
  *
  * Reference behaviors under test:
  *  - adds during training reconcile to the exact published counters —
  *    32,000 vectors / coverage 0.9375 (test_fastapi.py:102-152);
  *  - removes during training defer physical deletion and reconcile after
  *    the swap — 24,000 → 20,000 (test_fastapi_threading.py:175-255);
  *  - a second train is rejected while one is "in progress"
  *    (fastapi.py:314-326), and the status lifecycle is
  *    "in progress" → "trained" → "complete" (fastapi.py:262-305);
  *  - post-"complete", EVERY live row is servable from the trained index
  *    (the drain of fastapi.py:264-287);
  *  - a db dropped during training reads "not started", and a recreate
  *    under the same name is a fresh incarnation the in-flight train can
  *    never swap onto (fastapi.py:218-222 cleanup semantics).
  */
class TrainConcurrencySpec extends SparkSpec {

  private val D = 16
  private val Seed = 7L
  private val P = IndexParams(D, D, 8) // identity PCA, residual PQ m=8

  private def mkCorpus(n: Int, seed: Long, centers: Int = 40): Array[Array[Float]] = {
    val rnd = new Random(seed)
    val cs = Array.fill(centers, D)(rnd.nextGaussian().toFloat)
    Array.tabulate(n) { i =>
      val c = cs(i % centers)
      Array.tabulate(D)(j => c(j) + 0.3f * rnd.nextGaussian().toFloat)
    }
  }

  private def codedLiveIds(eng: Engine, db: String) = {
    val doc = eng.load(db)
    spark.read.parquet(s"${doc.indexPath(eng.root)}/coded").select("id")
  }

  /** Live ids the trained index cannot serve (must be empty post-drain). */
  private def unservable(eng: Engine, db: String): Long =
    eng.data(db).select("id").except(codedLiveIds(eng, db)).count()

  test("M6: adds during training -> exact counters 32,000 / 0.9375 " +
       "(test_fastapi.py:102-152) and every row servable") {
    val eng = new Engine(spark, tmpDir("graft-conc-add"))
    val corpus = mkCorpus(30000, Seed)
    eng.create("a")
    eng.addLocal("a", corpus.toIndexedSeq, (0 until 30000).map(i => s"m$i"))

    val statusInWindow = new java.util.concurrent.atomic.AtomicReference[String]
    val doc = eng.train("a", params = Some(P), kmeansIters = 3, seed = Seed,
      onSnapshot = () => {
        statusInWindow.set(eng.trainingStatus("a"))
        // the reference test re-adds copies of the first 2000 vectors
        eng.addLocal("a", corpus.take(2000).toIndexedSeq,
          (0 until 2000).map(i => s"dup$i"))
      })

    assert(statusInWindow.get == "in progress")
    assert(eng.trainingStatus("a") == "complete")
    assert(eng.count("a") == 32000L)
    assert(doc.numVectorsTrainedOn == 30000L)
    assert(doc.numNewVectors == 2000L)
    assert(doc.numTrainedVectorsRemoved == 0L)
    assert(eng.coverageRatio("a") == 0.9375) // 30,000 / 32,000
    // the post-swap drain encoded the during-train adds: nothing unservable
    assert(unservable(eng, "a") == 0L)
    // and a during-train row is reachable through the trained query path:
    // id 30000+i duplicates id i exactly, so both score sim 1.0 and the
    // duplicate must appear right after the original in the top ranks
    val res = eng.query("a", corpus(7), preliminaryTopK = 500, finalTopK = 5)
      .collect()
    assert(res.map(_.getLong(1)).toSet.contains(30007L),
      s"during-train duplicate 30007 missing from ${res.map(_.getLong(1)).toSeq}")

    // test__005 parity: removing the 2000 duplicates restores coverage 1.0
    eng.remove("a", (30000L until 32000L).toSeq)
    val doc2 = eng.load("a")
    assert(doc2.numNewVectors == 0L)
    assert(eng.coverageRatio("a") == 1.0)
  }

  test("M6/D4: removes during training defer, then reconcile 24,000 -> 20,000 " +
       "(test_fastapi_threading.py:175-255)") {
    val eng = new Engine(spark, tmpDir("graft-conc-rm"))
    eng.create("r")
    eng.addLocal("r", mkCorpus(24000, Seed + 1).toIndexedSeq,
      (0 until 24000).map(i => s"m$i"))

    val midtrainLive = new java.util.concurrent.atomic.AtomicLong(-1)
    val doc = eng.train("r", params = Some(P), kmeansIters = 3, seed = Seed,
      onSnapshot = () => {
        // 4000/24000 crosses the 10% compaction threshold — the physical
        // rewrite MUST defer while the train is in flight (D4), yet the
        // rows disappear from readers immediately (deletion vectors)
        eng.remove("r", (0L until 4000L).toSeq)
        midtrainLive.set(eng.count("r"))
        assert(eng.load("r").numPendingDeletes == 4000L,
          "compaction ran during training — version allocation race")
      })

    assert(midtrainLive.get == 20000L) // deletes visible instantly mid-train
    assert(eng.trainingStatus("r") == "complete")
    assert(eng.count("r") == 20000L)
    // swap recomputed counters from then-live rows (T19)
    assert(doc.numVectorsTrainedOn == 24000L)
    assert(doc.numTrainedVectorsRemoved == 4000L)
    assert(doc.numNewVectors == 0L)
    // the deferred compaction replayed post-swap: pending cleared, the
    // coded table physically dropped the removed rows
    assert(doc.numPendingDeletes == 0L)
    assert(codedLiveIds(eng, "r").count() == 20000L)
    assert(unservable(eng, "r") == 0L)
  }

  test("M5: REAL race — adds+removes from the test thread against trainAsync") {
    val eng = new Engine(spark, tmpDir("graft-conc-race"))
    val corpus = mkCorpus(30000, Seed + 2)
    eng.create("z")
    eng.addLocal("z", corpus.toIndexedSeq, (0 until 30000).map(i => s"m$i"))

    val t = eng.trainAsync("z", params = Some(P), kmeansIters = 3, seed = Seed)
    // interleave mutations with the running train (no synchronization —
    // they land wherever the race puts them: pre-pin, mid-train, or drain)
    val extra = mkCorpus(4000, Seed + 3)
    var added = 0L
    (0 until 8).foreach { b =>
      eng.addLocal("z", extra.slice(b * 500, (b + 1) * 500).toIndexedSeq,
        (0 until 500).map(i => s"x$b-$i"))
      added += 500
    }
    val removed = eng.remove("z", (0L until 1000L).toSeq)
    t.join(600000)
    assert(!t.isAlive, "train thread did not finish")

    assert(eng.trainingStatus("z") == "complete")
    val doc = eng.load("z")
    assert(doc.isTrained)
    assert(eng.count("z") == 30000L + added - removed)
    // bookkeeping invariant holds regardless of where each mutation landed
    assert(doc.numVectorsTrainedOn - doc.numTrainedVectorsRemoved +
      doc.numNewVectors == eng.count("z"))
    assert(doc.numVectorsTrainedOn >= 30000L) // pin happened at/after start
    // after "complete" every live row is servable (drain + incremental path)
    assert(unservable(eng, "z") == 0L)
    val res = eng.query("z", corpus(123), 500, 20).collect()
    assert(res.length == 20)
    assert(res.map(_.getInt(0)).toSeq == (1 to 20))
  }

  test("M5: double-train rejected while in progress; lifecycle observed; " +
       "maybeAutoTrain reports false instead of throwing") {
    val eng = new Engine(spark, tmpDir("graft-conc-dbl"))
    eng.create("d")
    eng.addLocal("d", mkCorpus(6000, Seed + 4).toIndexedSeq,
      (0 until 6000).map(i => s"m$i"))

    val gate = new CountDownLatch(1)
    val pinned = new CountDownLatch(1)
    val t = eng.trainAsync("d", params = Some(P), kmeansIters = 2, seed = Seed,
      onSnapshot = () => { pinned.countDown(); gate.await() })
    pinned.await()
    assert(eng.trainingStatus("d") == "in progress")
    val rejection = intercept[Engine.AlreadyTrainingException] {
      eng.train("d", params = Some(P))
    }
    // the typed rejection is still the documented IllegalArgumentException
    assert(rejection.isInstanceOf[IllegalArgumentException])
    assert(!eng.maybeAutoTrain("d"), "auto-train must observe the guard")
    gate.countDown()
    t.join(600000)
    assert(eng.trainingStatus("d") == "complete")

    // deterministic lifecycle on a sync train: in progress -> trained ->
    // complete, with the swap already visible in the "trained" window
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    eng.create("d2")
    eng.addLocal("d2", mkCorpus(6000, Seed + 5).toIndexedSeq,
      (0 until 6000).map(i => s"m$i"))
    eng.train("d2", params = Some(P), kmeansIters = 2, seed = Seed,
      onSnapshot = () => seen += ((eng.trainingStatus("d2"), eng.load("d2").isTrained)),
      onSwapped = () => seen += ((eng.trainingStatus("d2"), eng.load("d2").isTrained)))
    assert(seen.toSeq == Seq(("in progress", false), ("trained", true)))
    assert(eng.trainingStatus("d2") == "complete")

    // T3 parity: the small-db bypass reports "failed" (fastapi.py:288-296)
    eng.create("tiny")
    eng.addLocal("tiny", mkCorpus(50, Seed + 6).toIndexedSeq,
      (0 until 50).map(i => s"m$i"))
    eng.train("tiny")
    assert(eng.trainingStatus("tiny") == "failed")
  }

  test("S12: drop during training clears status; a recreate is a fresh " +
       "incarnation the old train cannot swap onto") {
    val eng = new Engine(spark, tmpDir("graft-conc-drop"))
    eng.create("g")
    eng.addLocal("g", mkCorpus(6000, Seed + 7).toIndexedSeq,
      (0 until 6000).map(i => s"m$i"))

    val gate = new CountDownLatch(1)
    val pinned = new CountDownLatch(1)
    val t = eng.trainAsync("g", params = Some(P), kmeansIters = 2, seed = Seed,
      onSnapshot = () => { pinned.countDown(); gate.await() })
    pinned.await()
    eng.delete("g")
    // recreate under the same name BEFORE the in-flight train resumes:
    // the creation stamp, not the name, decides whether the swap lands
    eng.create("g", vectorDimension = D)
    eng.addLocal("g", mkCorpus(10, Seed + 8).toIndexedSeq,
      (0 until 10).map(i => s"n$i"))
    gate.countDown()
    t.join(600000)
    assert(!t.isAlive)

    val doc = eng.load("g")
    assert(!doc.isTrained, "old incarnation's train swapped onto the recreate")
    assert(eng.count("g") == 10L)
    assert(eng.trainingStatus("g") == "not started",
      "dropped-during-train status must not leak onto the recreate")
  }

  test("ADVICE r8: a second train claiming the slot during the first's " +
       "drain is not clobbered by the first's final status write") {
    val eng = new Engine(spark, tmpDir("graft-conc-drain"))
    eng.create("w")
    eng.addLocal("w", mkCorpus(6000, Seed + 9).toIndexedSeq,
      (0 until 6000).map(i => s"m$i"))

    val gateB = new CountDownLatch(1)
    var tB: Thread = null
    eng.train("w", params = Some(P), kmeansIters = 2, seed = Seed,
      onSwapped = () => {
        // reference parity: "trained" (draining) does NOT hold the slot —
        // a second train may claim it (fastapi.py:314-326 checks only
        // "in progress"); the first's epoch-CAS'd "complete" must then
        // be DROPPED, not clobber the second's "in progress"
        assert(eng.trainingStatus("w") == "trained")
        tB = eng.trainAsync("w", params = Some(P), kmeansIters = 2,
          seed = Seed + 1, onSnapshot = () => gateB.await())
      })
    // train A has fully returned; without the epoch CAS this would read
    // A's "complete" while B is still running
    assert(eng.trainingStatus("w") == "in progress")
    gateB.countDown()
    tB.join(600000)
    assert(eng.trainingStatus("w") == "complete")
    assert(eng.load("w").isTrained)
    assert(unservable(eng, "w") == 0L)
  }
}
