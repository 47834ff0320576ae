package graft.core

import java.util.concurrent.{Callable, Executors, TimeUnit}

import scala.util.Random

import graft.SparkSpec
import graft.index.IndexParams

/** The prepared handle's wave batching (r18): under caller concurrency,
  * one leader serves every queued query in a SINGLE job whose tasks run
  * the unchanged per-query kernel once per (query, cached partition).
  * Hits must be BIT-equal to the one-job-per-query shape — the same
  * CandBatch per (query, partition) reaches the same per-query merge —
  * including with pending deletes and a fresh adds side buffer in play.
  */
class WaveServeSpec extends SparkSpec {

  private val D = 16

  private def build(dir: String): Engine = {
    val e = new Engine(spark, tmpDir(dir)) {
      override protected def chooseCodedBucketShift(nn: Long, nlist: Int,
                                                    d: Int, m: Int): Int = 2
    }
    val rnd = new Random(13L)
    val centers = Array.fill(10, D)(rnd.nextGaussian().toFloat)
    val vecs = Seq.tabulate(2400) { i =>
      val c = centers(i % 10)
      Array.tabulate(D)(j => c(j) + 0.3f * rnd.nextGaussian().toFloat)
    }
    e.create("db", vectorDimension = D)
    e.addLocal("db", vecs, Seq.tabulate(2400)(i => s"""{"i":$i}"""))
    e.train("db", params = Some(IndexParams(D, D, 4, omitOpq = true)),
      kmeansIters = 4, seed = 13L, minTrainRows = 1)
    e
  }

  test("concurrent waved serves are bit-equal to the single-job shape") {
    val e = build("graft-wave-eq")
    // deletes + a post-train add so the wave path exercises the deleted
    // snapshot AND the driver-local side buffer merge
    e.remove("db", Seq(5L, 17L, 901L))
    val rnd = new Random(29L)
    e.addLocal("db", Seq.fill(30)(Array.fill(D)(rnd.nextGaussian().toFloat)),
      Seq.tabulate(30)(i => s"""{"x":$i}"""))
    val prep = e.prepareServing("db", numParts = 8, addsRefreshIntervalMs = 0)
    try {
      prep.localServe = false // this spec gates the JOB shapes
      val qs = Array.fill(24)(Array.fill(D)(rnd.nextGaussian().toFloat))
      def hitsOf(q: Array[Float]): Seq[Seq[Any]] =
        prep.query(q, 200, 20).toSeq
          .map(h => Seq(h.rank, h.id, h.metadata, h.cosineSimilarity))
      prep.waveServe = false
      val single = qs.map(hitsOf).toSeq
      prep.waveServe = true
      // 12 caller threads so real multi-query waves form
      val pool = Executors.newFixedThreadPool(12)
      val futures = qs.map { q =>
        pool.submit(new Callable[Seq[Seq[Any]]] { def call(): Seq[Seq[Any]] = hitsOf(q) })
      }
      val waved = futures.map(_.get(2, TimeUnit.MINUTES)).toSeq
      pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)
      assert(waved == single, "wave-batched serves diverged from the single-job shape")
      assert(single.forall(_.nonEmpty))
    } finally prep.close()
  }

  test("a lone query serves correctly through the wave path (wave of 1)") {
    val e = build("graft-wave-one")
    val prep = e.prepareServing("db", numParts = 8)
    try {
      prep.localServe = false
      val rnd = new Random(31L)
      val q = Array.fill(D)(rnd.nextGaussian().toFloat)
      prep.waveServe = true
      val a = prep.query(q, 200, 20).toSeq
      prep.waveServe = false
      val b = prep.query(q, 200, 20).toSeq
      assert(a == b && a.nonEmpty)
    } finally prep.close()
  }

  test("driver-local serve is bit-equal to the job shapes (plain + filtered + deletes/adds)") {
    val eng = build("graft-wave-local")
    eng.remove("db", Seq(2L, 77L))
    val rnd = new Random(37L)
    eng.addLocal("db", Seq.fill(20)(Array.fill(D)(rnd.nextGaussian().toFloat)),
      Seq.tabulate(20)(i => s"""{"y":$i}"""))
    val prep = eng.prepareServing("db", numParts = 8, addsRefreshIntervalMs = 0)
    try {
      import org.apache.spark.sql.functions._
      val pred = get_json_object(col("metadata"), "$.i").cast("long") % 2 === 0
      val evalP = eng.compileMetaPredicate(pred).get
      val qs = Array.fill(5)(Array.fill(D)(rnd.nextGaussian().toFloat))
      def run(): Seq[Seq[Any]] = qs.toSeq.flatMap { q =>
        val doc = eng.load("db")
        (prep.queryWith(doc, q, 200, 20) ++
          prep.queryFilteredWith(doc, q, 200, 10, pred, evalP)).toSeq
          .map(h => Seq(h.rank, h.id, h.metadata, h.cosineSimilarity))
      }
      // this corpus is far under the local bound, so default = local
      prep.localServe = true
      val local = run()
      prep.localServe = false
      prep.waveServe = false
      val job = run()
      assert(local == job, "driver-local serve diverged from the job shape")
      assert(local.nonEmpty)
    } finally prep.close()
  }
}
