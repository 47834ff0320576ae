package graft

import scala.util.Random

import graft.core.Engine
import graft.index.IndexParams

/** The GRAFT_COARSE_UNION_JOB experiment lever (one RDD-union job for
  * the coarse chunk scans instead of one job per chunk) must be
  * result-invisible: same partition functions over the same partitions,
  * so the merged candidate set — and every downstream result row — is
  * bit-identical. This gate lets a future round flip the default on an
  * A/B without re-deriving safety.
  */
class CoarseUnionJobSpec extends SparkSpec {

  private val D = 16
  private val Seed = 31L

  private lazy val engine: Engine = {
    // chunk 4 << nprobe forces the multi-chunk path (the lever is a
    // no-op on single-chunk scans)
    val e = new Engine(spark, tmpDir("graft-unionjob")) {
      override protected def chooseCodedBucketShift(n: Long, nlist: Int,
                                                    d: Int, m: Int): Int = 2
      override protected def probePushChunk: Int = 4
    }
    val rnd = new Random(Seed)
    val centers = Array.fill(12, D)(rnd.nextGaussian().toFloat)
    val vecs = Seq.tabulate(3000) { i =>
      val c = centers(i % 12)
      Array.tabulate(D)(j => c(j) + 0.3f * rnd.nextGaussian().toFloat)
    }
    e.create("db", vectorDimension = D)
    e.addLocal("db", vecs, Seq.tabulate(3000)(i => s"""{"i":$i}"""))
    e.train("db", params = Some(IndexParams(D, D, 4, omitOpq = true)),
      kmeansIters = 6, seed = Seed, minTrainRows = 1)
    e
  }

  private def results(q: Array[Float]): Seq[(Int, Long, String, Double)] =
    engine.queryCatalyst("db", q, preliminaryTopK = 200, finalTopK = 20)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSeq

  test("union-job coarse (default) is bit-identical to concurrent per-chunk jobs") {
    assert(engine.load("db").nProbe > 4,
      "fixture must span multiple probe chunks for the lever to engage")
    val rnd = new Random(Seed + 1)
    val qs = Seq.fill(6)(Array.fill(D)(rnd.nextGaussian().toFloat))
    val union = qs.map(results) // default = union job
    System.setProperty("graft.coarse.union.job", "false")
    try {
      val perChunk = qs.map(results)
      assert(union == perChunk, "union-job coarse diverged from per-chunk jobs")
    } finally System.clearProperty("graft.coarse.union.job")
  }
}
