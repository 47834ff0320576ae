package graft

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{Catalog, CatalogDoc}

/** The epoch-catalog protocol under OBJECT-STORE listing semantics
  * (VERDICT r12 ask #4): [[LaggedListFileSystem]] injects
  * delayed-visibility LIST (a written file that GET sees but LIST does
  * not yet) on top of RawLocalFileSystem's genuinely non-atomic create.
  * The contract under test: a reader NEVER errors and NEVER loads a torn
  * epoch while listings lag — at worst it serves the previous complete
  * epoch (bounded staleness, same outcome as reading just before the
  * save). Also regression-covers the ADVICE r12 sweep bug: after a
  * crashed writer leaves a torn newest epoch, the next save must retain
  * the newest COMPLETE predecessor, because a lagged listing that misses
  * the just-written epoch has nothing else loadable.
  */
class LaggedCatalogSpec extends AnyFunSuite {

  implicit val conf: Configuration = {
    val c = new Configuration()
    c.set("fs.lagfs.impl", classOf[LaggedListFileSystem].getName)
    c
  }

  private def newRoot(): String = {
    val p = java.nio.file.Files.createTempDirectory("graft-lag-catalog")
    p.toFile.deleteOnExit()
    "lagfs:" + p.toString
  }

  private def doc(name: String, maxId: Long): CatalogDoc =
    CatalogDoc.empty(name).copy(maxId = maxId)

  private def epochPath(root: String, name: String, epoch: Long): Path =
    new Path(new Path(root, name), f"catalog.$epoch%020d.json")

  private def writeRaw(root: String, name: String, file: String, s: String): Unit = {
    val f = new Path(root).getFileSystem(conf)
    val p = new Path(new Path(root, name), file)
    f.mkdirs(p.getParent)
    val out = f.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  override def withFixture(test: NoArgTest) =
    try super.withFixture(test) finally LaggedListFileSystem.clear()

  test("lagfs scheme round-trips a save/load (sanity)") {
    val root = newRoot()
    Catalog.save(root, doc("db", 7L))
    assert(Catalog.load(root, "db").maxId == 7L)
  }

  test("LIST lag hiding the newest epoch serves the previous complete one") {
    val root = newRoot()
    Catalog.save(root, doc("db", 10L))
    Catalog.save(root, doc("db", 20L))
    LaggedListFileSystem.hide(epochPath(root, "db", 2L))
    assert(Catalog.load(root, "db").maxId == 10L,
      "a lagged listing must serve the previous complete epoch, not error")
    LaggedListFileSystem.reveal(epochPath(root, "db", 2L))
    assert(Catalog.load(root, "db").maxId == 20L)
  }

  test("LIST lag + a torn mid-write epoch: reader skips the torn file, no error") {
    val root = newRoot()
    Catalog.save(root, doc("db", 10L))
    // epoch 2: a writer crashed (or is still writing) — partial bytes,
    // no `complete` marker; visible to LIST and readable (non-atomic
    // create visibility, the RawLocal behavior)
    writeRaw(root, "db", "catalog.00000000000000000002.json",
      """{\n  "name": "db",\n  "maxId": 999""")
    // epoch 3: complete but invisible to the lagging LIST
    Catalog.save(root, doc("db", 30L))
    LaggedListFileSystem.hide(epochPath(root, "db", 3L))
    assert(Catalog.load(root, "db").maxId == 10L,
      "reader must skip the torn epoch and the lag-hidden one and serve epoch 1")
  }

  test("ADVICE r12 sweep regression: torn newest + lagged next save still leaves a loadable epoch") {
    val root = newRoot()
    Catalog.save(root, doc("db", 10L))   // epoch 1 (complete)
    // crashed writer leaves a torn newest epoch 2
    writeRaw(root, "db", "catalog.00000000000000000002.json",
      """{\n  "name": "db",\n  "maxId": 99""")
    // next save writes epoch 3 and sweeps — the fixed sweep must RETAIN
    // epoch 1 (the newest COMPLETE predecessor), not keep only torn 2
    Catalog.save(root, doc("db", 30L))
    val f = new Path(root).getFileSystem(conf)
    assert(f.exists(epochPath(root, "db", 1L)),
      "sweep must retain the newest complete predecessor")
    // a reader whose listing lags behind the save sees only {1, torn 2}
    LaggedListFileSystem.hide(epochPath(root, "db", 3L))
    assert(Catalog.load(root, "db").maxId == 10L,
      "lagged reader must load the retained complete predecessor")
    LaggedListFileSystem.reveal(epochPath(root, "db", 3L))
    assert(Catalog.load(root, "db").maxId == 30L)
  }

  test("every visible candidate torn: load retries until the LIST catches up") {
    val root = newRoot()
    // the only listable file is torn; the complete epoch is lag-hidden —
    // load must enter its bounded retry loop (Catalog load retry) and
    // succeed once the listing catches up inside the retry budget
    writeRaw(root, "db", "catalog.00000000000000000001.json",
      """{\n  "name": "db", "maxI""")
    Catalog.save(root, doc("db", 20L))
    val p2 = epochPath(root, "db", 2L)
    LaggedListFileSystem.hide(p2)
    val revealer = new Thread(() => {
      Thread.sleep(40L)
      LaggedListFileSystem.reveal(p2)
    })
    revealer.start()
    assert(Catalog.load(root, "db").maxId == 20L,
      "load must retry through the lag window instead of failing")
    revealer.join()
  }

  test("epoch swap under continuous lagged listings: reader monotone, never torn, never errors") {
    val root = newRoot()
    Catalog.save(root, doc("db", 0L))
    val saves = 60
    @volatile var writerDone = false
    @volatile var failure: Throwable = null
    var lastSeen = -1L
    val writer = new Thread(() => {
      try {
        var i = 1
        while (i <= saves) {
          // model list-after-put lag on every save: the new epoch is
          // invisible to LIST from the instant it is written (hide is
          // keyed on the path, so it can precede the create), then the
          // index catches up a beat later
          val p = epochPath(root, "db", i.toLong + 1L)
          LaggedListFileSystem.hide(p)
          Catalog.save(root, doc("db", i.toLong))
          Thread.sleep(2L)
          LaggedListFileSystem.reveal(p)
          i += 1
        }
      } catch { case t: Throwable => failure = t }
      finally writerDone = true
    })
    val reader = new Thread(() => {
      try {
        while (!writerDone) {
          val d = Catalog.load(root, "db")
          assert(d.name == "db" && d.maxId >= lastSeen,
            s"catalog went backwards: ${d.maxId} after $lastSeen")
          lastSeen = d.maxId
        }
      } catch { case t: Throwable => failure = t }
    })
    writer.start(); reader.start()
    writer.join(120000); reader.join(120000)
    if (failure != null) throw failure
    assert(lastSeen >= 0L)
    assert(Catalog.load(root, "db").maxId == saves.toLong)
  }
}
