package graft.catalog

import java.nio.charset.StandardCharsets

import scala.util.matching.Regex

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

import graft.index.IndexParams

/** Per-database catalog document — the Spark-side replacement for the
  * reference's `config.json` (minDB mindb.py:513-527) plus snapshot
  * pointers that replace its mutable-index concurrency (locks/queues,
  * fastapi.py:23-28) with immutable versioned tables + atomic pointer swap.
  *
  * Layout per database:
  * {{{
  *   <root>/<name>/catalog.json
  *   <root>/<name>/data/v<dataVersion>/      (id, vector, metadata) parquet
  *   <root>/<name>/index/v<indexVersion>/    centroids/ codebooks/ pca/ coded/
  * }}}
  */
final case class CatalogDoc(
    name: String,
    vectorDimension: Int,          // -1 until first add (inferred, mindb.py:225)
    maxId: Long,                   // highest assigned id (mindb.py:192-193)
    dataVersion: Int,
    indexVersion: Int,             // -1 = flat / untrained
    maxTrainedId: Long,
    numVectorsTrainedOn: Long,
    numTrainedVectorsRemoved: Long,
    numNewVectors: Long,
    numPendingDeletes: Long,       // soft-deleted ids awaiting compaction
    pcaDimension: Int,
    opqDimension: Int,
    compressedVectorBytes: Int,
    numClusters: Int,
    nProbe: Int,
    usedTwoLevel: Int,             // T7 decision at last train: -1 never, 0 subsample, 1 two-level
    createdAt: Long,               // creation stamp — a train started against an older
                                   // incarnation must never swap onto a drop+recreate
    codedBucketShift: Int,         // coded-table layout: clusters 2^shift-grouped into
                                   // `cluster_bucket` partition dirs (-1 = legacy one
                                   // hive dir per cluster_id)
    codedOwners: String = "") {    // per-bucket owner INDEX VERSION as csv (one int per
                                   // cluster_bucket) — "" means every bucket lives under
                                   // `indexVersion`. Lets compaction rewrite ONLY the
                                   // buckets holding deleted rows: untouched buckets stay
                                   // in (and are read from) the version dir that wrote
                                   // them, so compact cost ∝ touched buckets, not table

  def isTrained: Boolean = indexVersion >= 0

  def dataPath(root: String): String = s"$root/$name/data/v$dataVersion"
  def indexPath(root: String): String = s"$root/$name/index/v$indexVersion"

  /** Owner index version per cluster_bucket (resolving the "" shorthand). */
  def ownerVersions(bucketCount: Int): Array[Int] =
    if (codedOwners.isEmpty) Array.fill(bucketCount)(indexVersion)
    else codedOwners.split(",").map(_.toInt)

  /** CSV for an owner array, collapsed to the "" shorthand when uniform. */
  def withOwners(owners: Array[Int]): CatalogDoc =
    copy(codedOwners =
      if (owners.forall(_ == indexVersion)) "" else owners.mkString(","))
}

object CatalogDoc {
  def empty(name: String, vectorDimension: Int = -1): CatalogDoc =
    CatalogDoc(name, vectorDimension, maxId = -1L, dataVersion = 0,
      indexVersion = -1, maxTrainedId = -1L, numVectorsTrainedOn = 0L,
      numTrainedVectorsRemoved = 0L, numNewVectors = 0L,
      numPendingDeletes = 0L,
      pcaDimension = -1, opqDimension = -1, compressedVectorBytes = -1,
      numClusters = -1, nProbe = -1, usedTwoLevel = -1,
      createdAt = System.nanoTime(), codedBucketShift = -1)
}

/** Tiny flat-JSON codec + atomic file swap for the catalog doc, over the
  * Hadoop [[FileSystem]] API — the catalog, the pointer swap, version
  * sweeping, and the bin-packing trigger all work against any Hadoop
  * scheme (`file:`, `hdfs:`, `s3a:`), not just the local filesystem: at
  * 100 TB the engine root IS an object store. All doc fields are scalars
  * so a hand-rolled codec avoids any library dependency.
  */
object Catalog {

  /** Database-name validation, same charset as the reference
    * (input_validation.py:6-12).
    */
  private val NamePattern: Regex = "^[a-zA-Z0-9_ -]+$".r
  def validateName(name: String): Unit =
    require(NamePattern.matches(name),
      s"invalid database name '$name': only letters, digits, _, space, - allowed")

  private def fs(p: Path, conf: Configuration): FileSystem =
    p.getFileSystem(conf)

  def catalogFile(root: String, name: String): Path =
    new Path(new Path(root, name), "catalog.json")

  def exists(root: String, name: String)(implicit conf: Configuration): Boolean = {
    val p = catalogFile(root, name)
    fs(p, conf).exists(p)
  }

  def save(root: String, doc: CatalogDoc)(implicit conf: Configuration): Unit = {
    val dir = new Path(root, doc.name)
    val f = fs(dir, conf)
    f.mkdirs(dir)
    val json =
      s"""{
         |  "name": ${quote(doc.name)},
         |  "vectorDimension": ${doc.vectorDimension},
         |  "maxId": ${doc.maxId},
         |  "dataVersion": ${doc.dataVersion},
         |  "indexVersion": ${doc.indexVersion},
         |  "maxTrainedId": ${doc.maxTrainedId},
         |  "numVectorsTrainedOn": ${doc.numVectorsTrainedOn},
         |  "numTrainedVectorsRemoved": ${doc.numTrainedVectorsRemoved},
         |  "numNewVectors": ${doc.numNewVectors},
         |  "numPendingDeletes": ${doc.numPendingDeletes},
         |  "pcaDimension": ${doc.pcaDimension},
         |  "opqDimension": ${doc.opqDimension},
         |  "compressedVectorBytes": ${doc.compressedVectorBytes},
         |  "numClusters": ${doc.numClusters},
         |  "nProbe": ${doc.nProbe},
         |  "usedTwoLevel": ${doc.usedTwoLevel},
         |  "createdAt": ${doc.createdAt},
         |  "codedBucketShift": ${doc.codedBucketShift},
         |  "codedOwners": ${quote(doc.codedOwners)}
         |}""".stripMargin
    // write-then-rename so a concurrent reader never sees a torn doc:
    // FileContext rename(OVERWRITE) is atomic on HDFS and file:; on an
    // object store the rename degrades to copy+delete, but there the
    // final single-object PUT is itself atomic (readers see the whole
    // old or whole new object), so no torn read either way
    val tmp = new Path(dir, "catalog.json.tmp")
    writeString(f, tmp, json)
    FileContext.getFileContext(dir.toUri, conf)
      .rename(tmp, new Path(dir, "catalog.json"), Options.Rename.OVERWRITE)
  }

  def load(root: String, name: String)(implicit conf: Configuration): CatalogDoc = {
    val raw = readString(root, name)
    def str(k: String): String =
      s""""$k"\\s*:\\s*"((?:[^"\\\\]|\\\\.)*)"""".r.findFirstMatchIn(raw)
        .map(_.group(1)).getOrElse(sys.error(s"catalog missing $k"))
    def strOr(k: String, default: String): String =
      s""""$k"\\s*:\\s*"((?:[^"\\\\]|\\\\.)*)"""".r.findFirstMatchIn(raw)
        .map(_.group(1)).getOrElse(default)
    def numOr(k: String, default: Long): Long =
      s""""$k"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(raw)
        .map(_.group(1).toLong).getOrElse(default)
    def num(k: String): Long =
      s""""$k"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(raw)
        .map(_.group(1).toLong).getOrElse(sys.error(s"catalog missing $k"))
    CatalogDoc(str("name"), num("vectorDimension").toInt, num("maxId"),
      num("dataVersion").toInt, num("indexVersion").toInt, num("maxTrainedId"),
      num("numVectorsTrainedOn"), num("numTrainedVectorsRemoved"),
      num("numNewVectors"), num("numPendingDeletes"),
      num("pcaDimension").toInt,
      num("opqDimension").toInt, num("compressedVectorBytes").toInt,
      num("numClusters").toInt, num("nProbe").toInt,
      // absent from older catalogs — defaults keep old roots loadable
      // (codedBucketShift -1 = the pre-r10 one-dir-per-cluster layout)
      numOr("usedTwoLevel", -1L).toInt, numOr("createdAt", 0L),
      numOr("codedBucketShift", -1L).toInt,
      strOr("codedOwners", ""))
  }

  private def readString(root: String, name: String)
                        (implicit conf: Configuration): String = {
    val p = catalogFile(root, name)
    val f = fs(p, conf)
    val len = f.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = f.open(p)
    try in.readFully(0L, buf) finally in.close()
    new String(buf, StandardCharsets.UTF_8)
  }

  /** Small-file write helper (marker files, the catalog tmp). */
  def writeString(f: FileSystem, p: Path, s: String): Unit = {
    val out = f.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  def delete(root: String, name: String)(implicit conf: Configuration): Unit =
    deletePath(new Path(root, name))

  /** Recursive delete (no-op if absent). */
  def deletePath(path: Path)(implicit conf: Configuration): Unit = {
    val f = fs(path, conf)
    if (f.exists(path)) f.delete(path, true)
  }

  def withParams(doc: CatalogDoc, p: IndexParams, nlist: Int, nprobe: Int): CatalogDoc =
    doc.copy(pcaDimension = p.pcaDimension, opqDimension = p.opqDimension,
      compressedVectorBytes = p.compressedVectorBytes, numClusters = nlist,
      nProbe = nprobe)

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
