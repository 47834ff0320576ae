package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnosis-only: replicate the subsample train's phases against a
  * prepared scratch db to attribute the warm ~3 s per train (the bench's
  * heaviest row runs two of them). Phases replicated with the SAME
  * public kernels the train calls; the residual (train total minus the
  * replicated phases) is writeCoded + swap + catalog IO.
  */
object DiagTrainPhases {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    s.read.parquet(s"$dir/embeddings.parquet").count()
    val src = s.read.parquet(s"$dir/embeddings.parquet").orderBy("vec_id").limit(500)
      .select(col("embedding").as("vector"), col("label").cast("string").as("metadata"))
    val root = java.nio.file.Files.createTempDirectory("graft-diagp").toString
    val eng = new graft.core.Engine(s, root)
    eng.create("tg", vectorDimension = 64)
    eng.add("tg", src)
    // warm every code path once
    eng.train("tg", params = Some(graft.index.IndexParams(16, 16, 8, omitOpq = true)),
      useTwoLevelClustering = Some(false), kmeansIters = 5, seed = 11L, minTrainRows = 1)
    for (r <- 1 to 2) {
      val table = eng.data("tg").select(col("id"), col("vector"))
      val n = time(s"r$r count")(table.count())
      val pca = time(s"r$r pca.fit")(graft.index.Pca.fit(
        table, "vector", 64, 16, sampleSize = math.min(n, 6400L).toInt,
        seed = 11L, totalRows = n))
      val projected = table.select(col("id"),
        graft.index.Coder.pcaApplyCol(s, pca, col("vector")).as("pvec"))
      val nlist = math.max(1, graft.index.Heuristics.numClusters(n))
      val sampleN = math.min(n, 256L * nlist)
      val sample = projected.sample(withReplacement = false,
        math.min(1.0, sampleN.toDouble / n), 11L)
      val cents = time(s"r$r kmeans(nlist=$nlist, 5 iters)")(
        graft.index.KMeansDF.fitDistributed(sample, "pvec", 16, nlist, 5, 11L))
      val pqN = 64 * 256
      val pqSample = time(s"r$r pq sample collect")(projected
        .sample(withReplacement = false, math.min(1.0, pqN * 1.1 / n), 11L)
        .limit(pqN)
        .select(graft.index.Coder.residualCol(s, cents, col("pvec")).as("res"))
        .collect().map(_.getSeq[Double](0).map(_.toFloat).toArray))
      val pq = time(s"r$r pq.fit")(graft.index.ProductQuantizer.fit(
        pqSample, 8, iters = 5, seed = 11L))
      val _ = pq
      val full = time(s"r$r full train() for reference")(
        eng.train("tg", params = Some(graft.index.IndexParams(16, 16, 8, omitOpq = true)),
          useTwoLevelClustering = Some(false), kmeansIters = 5, seed = 11L,
          minTrainRows = 1))
      val _2 = full
    }
    spark.stop()
  }
}
