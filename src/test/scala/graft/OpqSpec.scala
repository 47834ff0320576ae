package graft

import scala.util.Random

import graft.core.Engine
import graft.index.{IndexParams, Opq}

/** OPQ rotation: orthonormality, quantization-error improvement over the
  * identity-truncation init, and an end-to-end trained query with
  * omitOpq=false clearing the recall gate.
  */
class OpqSpec extends SparkSpec {

  private def sample(n: Int, p: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new Random(seed)
    // anisotropic data (correlated dims) — the case OPQ exists for
    Array.fill(n) {
      val base = rnd.nextGaussian()
      Array.tabulate(p)(j =>
        (base * (1.0 + j % 4) + 0.3 * rnd.nextGaussian()).toFloat)
    }
  }

  test("learned rotation has orthonormal rows") {
    val r = Opq.fit(sample(2000, 16, 1L), outDim = 8, m = 4, outerIters = 4)
    assert(r.length == 8 && r(0).length == 16)
    for (a <- r.indices; b <- r.indices) {
      val dot = r(a).zip(r(b)).map { case (x, y) => x * y }.sum
      val expect = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-8, s"RRᵀ[$a][$b] = $dot")
    }
  }

  test("learned rotation does not quantize worse than identity truncation") {
    val s = sample(3000, 16, 2L)
    val identity = Array.tabulate(8)(i =>
      Array.tabulate(16)(j => if (i == j) 1.0 else 0.0))
    val learned = Opq.fit(s, outDim = 8, m = 4, outerIters = 6)
    val e0 = Opq.quantizationError(s, identity, m = 4)
    val e1 = Opq.quantizationError(s, learned, m = 4)
    info(f"identity err = $e0%.4f, learned err = $e1%.4f")
    assert(e1 <= e0 * 1.02, s"OPQ made quantization worse: $e1 vs $e0")
  }

  test("train with omitOpq=false clears the recall gate end-to-end") {
    val engine = new Engine(spark, tmpDir("graft-opq"))
    engine.create("opq", vectorDimension = 64)
    val rnd = new Random(3L)
    val centers = Array.fill(30, 64)(rnd.nextGaussian().toFloat)
    val corpus = Array.tabulate(6000) { i =>
      val c = centers(i % 30)
      Array.tabulate(64)(j => c(j) + 0.35f * rnd.nextGaussian().toFloat)
    }
    engine.addLocal("opq", corpus.toIndexedSeq, IndexedSeq.fill(6000)("{}"))
    val doc = engine.train("opq",
      params = Some(IndexParams(64, 32, 8, omitOpq = false)),
      kmeansIters = 5, seed = 42L)
    assert(doc.isTrained)
    // the composed projection outputs opqDimension-sized vectors
    val pcaRows = spark.read.parquet(s"${doc.indexPath(engine.root)}/pca")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(pcaRows.size - 1 == 32) // 32 projection rows + mean row

    val stored = engine.data("opq").select("id", "vector").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def normalize(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (n == 0) v else v.map(x => (x / n).toFloat)
    }
    var recallSum = 0.0
    val qs = Array.tabulate(8)(qi =>
      normalize(corpus((qi * 733) % 6000).map(x => x + 0.1f * rnd.nextGaussian().toFloat)))
    qs.foreach { q =>
      val gt = stored.map { case (id, v) =>
        (v.zip(q).map { case (a, b) => a.toDouble * b }.sum, id)
      }.sortBy { case (s, id) => (-s, id) }.take(50).map(_._2).toSet
      val ids = engine.query("opq", q, 500, 50).collect().map(_.getLong(1))
      recallSum += ids.count(gt.contains).toDouble / 50.0
    }
    val recall = recallSum / qs.length
    info(f"OPQ-trained recall(50@500) = $recall%.4f")
    assert(recall > 0.97, f"OPQ recall $recall%.4f below gate")
  }
}
