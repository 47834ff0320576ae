package graft.core

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for the ROUTED FILTERED single query — splits the
  * filtered-vs-unfiltered delta into its components: predicate compile
  * (cached vs uncached), per-candidate eval, and the serving path under
  * predicates whose selectivity is or is not CORRELATED with cluster
  * structure. This main found the r13 35M "filtered ≈ 5× unfiltered"
  * reading: the eval generator assigns center = i mod C, so an id-parity
  * predicate is cluster-CONSTANT — every query keeps 0 or 500 of its
  * candidates (the per-regime p50 split below shows it), and the
  * 0-keepers pay the widened re-probe and the terminal exact flat scan.
  * That is the documented under-fill semantics working as designed; the
  * production metadata-filter shape (selectivity holds WITHIN a probe's
  * candidates — here, hash-parity) stays on the routed floor at
  * unfiltered + ~1 ms of predicate eval. Lives in graft.core for access
  * to the package-private compile and serving internals. Builds its own
  * small trained db (no args) or profiles an existing root:
  * <root> <db> [d] [nQ].
  */
object FilterProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val (engine, db, d) =
      if (args.nonEmpty) {
        val e = new Engine(spark, args(0))
        (e, if (args.length > 1) args(1) else "scale",
          if (args.length > 2) args(2).toInt else 64)
      } else {
        val root = java.nio.file.Files
          .createTempDirectory("graft-fprof").toString
        val e = new Engine(spark, root)
        val dd = 64
        val n = 500000
        e.create("fp", vectorDimension = dd)
        val rnd = new Random(7)
        val centers = Array.fill(64, dd)(rnd.nextGaussian().toFloat)
        val rows = (0 until n).map { i =>
          val c = centers(i % 64)
          (c.map(x => x + 0.05f * rnd.nextGaussian().toFloat).toSeq,
            s"""{"i":$i}""")
        }
        e.add("fp", rows.toDF("vector", "metadata")
          .select(col("vector").cast("array<float>").as("vector"),
            col("metadata")))
        e.train("fp")
        (e, "fp", dd)
      }

    val nQ = if (args.length > 3) args(3).toInt else 16
    val rnd2 = new Random(123)
    val qs = Array.fill(nQ)(Array.fill(d)(rnd2.nextGaussian().toFloat))
    // cluster-CORRELATED parity (fixture assigns center = i % 64) vs the
    // uncorrelated hash-parity a real metadata filter behaves like
    val pred = get_json_object(col("metadata"), "$.i").cast("long") % 2 === 0
    val hashPred =
      pmod(hash(get_json_object(col("metadata"), "$.i")), lit(2)) === 0

    def p50(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    def timeEach[A](n: Int)(f: Int => A): Seq[Double] =
      (0 until n).map { i =>
        val t0 = System.nanoTime(); f(i); (System.nanoTime() - t0) / 1e6
      }

    // warm everything once
    engine.queryHits(db, qs(0), 500, 50)
    engine.queryHits(db, qs(0), 500, 50, Some(pred))
    engine.queryHits(db, qs(0), 500, 50, Some(hashPred))

    val unf = timeEach(nQ)(i => engine.queryHits(db, qs(i), 500, 50))
    val fil = timeEach(nQ)(i =>
      engine.queryHits(db, qs(i), 500, 50, Some(pred)))
    val filHash = timeEach(nQ)(i =>
      engine.queryHits(db, qs(i), 500, 50, Some(hashPred)))

    // predicate compile: warm-cache lookups, then forced fresh compiles
    val warm = timeEach(100)(_ => engine.compileMetaPredicate(pred))
    val fresh = timeEach(20) { i =>
      val p2 = get_json_object(col("metadata"), "$.i").cast("long") % 2 === i
      engine.compileMetaPredicate(p2)
    }

    // per-candidate eval cost: the compiled closure over 500 rows
    val evalP = engine.compileMetaPredicate(pred).get
    val metas = (0 until 500).map(i => s"""{"i":$i}""").toArray
    val evalMs = timeEach(20) { _ =>
      var i = 0; var n = 0
      while (i < 500) { if (evalP(i.toLong, metas(i))) n += 1; i += 1 }
      n
    }

    // handle-level split: the same calls through a private handle, plus
    // a constant-true predicate to separate evalP from path structure
    val doc = engine.load(db)
    val h = engine.prepareServing(db)
    h.queryWith(doc, qs(0), 500, 50)
    h.queryFilteredWith(doc, qs(0), 500, 50, pred, evalP)
    val hUnf = timeEach(nQ)(i => h.queryWith(doc, qs(i), 500, 50))
    val hFil = timeEach(nQ)(i =>
      h.queryFilteredWith(doc, qs(i), 500, 50, pred, evalP))
    val hTrue = timeEach(nQ)(i =>
      h.queryFilteredWith(doc, qs(i), 500, 50, pred, (_, _) => true))
    // same ~50% selectivity, plain-Scala closure: separates "what the
    // filter keeps" (widening? rerank size?) from "what the eval costs"
    val hHalf = timeEach(nQ)(i =>
      h.queryFilteredWith(doc, qs(i), 500, 50, pred, (id, _) => id % 2 == 0))

    println(f"""{"unfiltered_ms_p50":${p50(unf)}%.1f,""" +
      f""""filtered_correlated_ms_p50":${p50(fil)}%.1f,""" +
      f""""filtered_hash_parity_ms_p50":${p50(filHash)}%.1f,""" +
      f""""handle_unfiltered_ms_p50":${p50(hUnf)}%.1f,""" +
      f""""handle_filtered_ms_p50":${p50(hFil)}%.1f,""" +
      f""""handle_true_pred_ms_p50":${p50(hTrue)}%.1f,""" +
      f""""handle_half_scala_ms_p50":${p50(hHalf)}%.1f,""" +
      f""""compile_warm_ms_p50":${p50(warm)}%.3f,""" +
      f""""compile_fresh_ms_p50":${p50(fresh)}%.1f,""" +
      f""""eval500_ms_p50":${p50(evalMs)}%.3f}""")
    h.close()
    spark.stop()
  }
}
