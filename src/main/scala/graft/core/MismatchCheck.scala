package graft.core

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: compare the routed/prepared paths against
  * queryCatalyst on a kept root and print the first divergent rows —
  * used to chase the r17 scaleeval_35m_final equality-gate failure.
  * Args: <root> [db] [d].
  */
object MismatchCheck {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val db = if (args.length > 1) args(1) else "scale"
    val d = if (args.length > 2) args(2).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val engine = new Engine(spark, root)
    val rnd = new Random(123)
    val qs = Array.fill(4)(Array.fill(d)(rnd.nextGaussian().toFloat))
    // component level: coarse candidates, custom vs catalyst chunks
    locally {
      val doc = engine.load(db)
      val model = engine.indexModel(doc)
      val q = qs(0)
      val qp = model.pca.applyLocal(q)
      val probes = model.nearestClusters(qp, doc.nProbe)
      val custom = engine.servingScanCoarse(doc, qp, probes, 500).get
      val chunks = engine.prunedLiveCodedChunks(doc, probes)
      val cat = graft.operators.BatchANN.coarseSingleChunked(
        spark, chunks, engine.modelBroadcast(doc), qp, probes, 500)
      println(s"COARSE equal: ${custom.toSeq == cat.toSeq} " +
        s"(custom ${custom.length}, cat ${cat.length})")
      if (custom.toSeq != cat.toSeq) {
        val i = custom.zip(cat).indexWhere { case (a, b) => a != b }
        println(s"  first diff at $i: custom=${custom.lift(i)} cat=${cat.lift(i)}")
        val cIds = custom.map(_._1).toSet; val kIds = cat.map(_._1).toSet
        println(s"  onlyCustom=${(cIds -- kIds).take(5)} onlyCat=${(kIds -- cIds).take(5)}")
      }
      // fetch comparison on the CATALYST candidates (ground truth set)
      val fRows = engine.servingScanFetchRows(doc, cat).get
        .map(t => (t._1, t._2.toSeq, t._3)).sortBy(_._1).toSeq
      import org.apache.spark.sql.functions.col
      val fOld = engine.prunedLiveCoded(doc, cat.map(_._3).distinct)
        .select("id", "vector", "metadata")
        .filter(col("id").isInCollection(
          cat.map(r => java.lang.Long.valueOf(r._1)).toIndexedSeq))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1), r.getString(2)))
        .sortBy(_._1).toSeq
      println(s"FETCH equal: ${fRows == fOld} (custom ${fRows.size}, old ${fOld.size})")
      if (fRows != fOld) {
        val i = fRows.zip(fOld).indexWhere { case (a, b) => a != b }
        println(s"  first diff at $i: custom=${fRows.lift(i).map(t => (t._1, t._2.take(4), t._3))} old=${fOld.lift(i).map(t => (t._1, t._2.take(4), t._3))}")
      }
    }
    val pred = pmod(hash(get_json_object(col("metadata"), "$.i")), lit(2)) === 0
    qs.zipWithIndex.foreach { case (q, qi) =>
      val cat = engine.queryCatalyst(db, q, 500, 50).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3))).toSeq
      System.setProperty("graft.serving.custom.scan", "false")
      val old = try engine.queryCatalyst(db, q, 500, 50).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3))).toSeq
      finally System.clearProperty("graft.serving.custom.scan")
      val routed = engine.query(db, q, 500, 50).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3))).toSeq
      println(s"q$qi custom==old: ${cat == old}  custom==routed: ${cat == routed}")
      if (cat != old) {
        val i = cat.zip(old).indexWhere { case (a, b) => a != b }
        println(s"  first diff at $i: custom=${cat.lift(i)} old=${old.lift(i)}")
        println(s"  sizes: ${cat.size} vs ${old.size}")
      }
      val fCat = engine.queryCatalyst(db, q, 500, 50, Some(pred)).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3))).toSeq
      val fHits = engine.queryHits(db, q, 500, 50, Some(pred))
        .map(h => (h.rank, h.id, h.cosineSimilarity)).toSeq
      println(s"q$qi filteredCat==hits: ${fCat == fHits}")
      if (fCat != fHits) {
        val i = fCat.zip(fHits).indexWhere { case (a, b) => a != b }
        println(s"  first diff at $i: cat=${fCat.lift(i)} hits=${fHits.lift(i)}")
        println(s"  sizes: ${fCat.size} vs ${fHits.size}")
      }
    }
    spark.stop()
  }
}
