package graft

import org.apache.spark.sql.functions._

import graft.core.Engine
import graft.index.IndexParams

/** The catalog/maintenance layer against an EXPLICIT Hadoop-scheme root
  * (`file:/…`): the same path strings an `hdfs://` or `s3a://` deployment
  * would hand the engine. Everything java.nio would have silently
  * localised — catalog save/load/delete, the epoch pointer swap, the
  * `_SUPERSEDED` stamps, vacuum, the coded-table file-count trigger,
  * listDatabases — must resolve through `org.apache.hadoop.fs.FileSystem`
  * for the full lifecycle: create → add → train → query → remove →
  * compact → vacuum → drop.
  */
class HadoopRootSpec extends SparkSpec {

  // an explicit scheme-qualified URI, not a bare local path
  lazy val root: String = "file:" + tmpDir("graft-hadoop-root")
  lazy val engine = new Engine(spark, root)

  private def embeddings = sf("sf0.001", "embeddings")

  test("full lifecycle on a file:-scheme root") {
    engine.create("hdb")
    assert(engine.exists("hdb"))
    assert(engine.listDatabases() == Seq("hdb"))

    val rows = embeddings.select(col("embedding").as("vector"),
      to_json(struct(col("vec_id"))).as("metadata"))
    val (first, last) = engine.add("hdb", rows)
    assert(first == 0L && last == 499L)
    assert(engine.count("hdb") == 500L)

    // train end-to-end (writes index artifacts + coded table on the
    // Hadoop root; the swap goes through Catalog.save's epoch protocol)
    engine.train("hdb", params = Some(IndexParams(16, 16, 8)),
      kmeansIters = 2, minTrainRows = 1)
    val doc = engine.load("hdb")
    assert(doc.isTrained)

    // trained query serves from the coded table under the scheme root
    val q = embeddings.filter(col("vec_id") === 123).head()
      .getSeq[Float](1).toArray
    val res = engine.query("hdb", q, preliminaryTopK = 500, finalTopK = 5).collect()
    assert(res.length == 5)
    assert(res(0).getLong(1) == 123L)

    // remove + threshold compaction (physical rewrite, version bump)
    val v0 = engine.load("hdb").dataVersion
    engine.remove("hdb", (0L until 60L).toSeq) // 12% > threshold → compacts
    val compacted = engine.load("hdb")
    assert(compacted.dataVersion > v0)
    assert(engine.count("hdb") == 440L)

    // vacuum: grace retains the freshly superseded dirs, 0-grace sweeps
    assert(engine.vacuum("hdb", graceMillis = 60L * 60 * 1000) == 0)
    assert(engine.vacuum("hdb") >= 1)
    assert(engine.count("hdb") == 440L)

    // query still correct post-compact+vacuum
    val res2 = engine.query("hdb", q, preliminaryTopK = 500, finalTopK = 5).collect()
    assert(res2.length == 5)
    assert(res2(0).getLong(1) == 123L)

    engine.delete("hdb")
    assert(!engine.exists("hdb"))
    assert(engine.listDatabases().isEmpty)
  }

  test("supersession stamps are explicit marker files, not mtimes") {
    engine.create("hdb2")
    engine.addLocal("hdb2", Seq.fill(20)(Array.fill(8)(util.Random.nextFloat())),
      Seq.fill(20)("{}"))
    val v0 = engine.load("hdb2").dataVersion
    engine.remove("hdb2", (0L until 5L).toSeq) // 25% → compacts, bumps version
    assert(engine.load("hdb2").dataVersion > v0)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(engine.hadoopConf)
    val marker = new org.apache.hadoop.fs.Path(
      s"$root/hdb2/data/v$v0/${Engine.SupersededMarker}")
    assert(fs.exists(marker), "superseded data version must carry its stamp")
    // stamp content is the supersession moment in epoch millis
    val len = fs.getFileStatus(marker).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(marker)
    try in.readFully(0L, buf) finally in.close()
    val stamp = new String(buf, "UTF-8").trim.toLong
    assert(math.abs(System.currentTimeMillis() - stamp) < 5L * 60 * 1000)
    engine.delete("hdb2")
  }
}
