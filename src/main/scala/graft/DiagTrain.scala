package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnosis-only: time the phases inside trainSubsampleGoldens (the
  * bench's heaviest row) — two seeded trains + the A10 inflated flat db.
  */
object DiagTrain {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val s = spark
    // warm the session on an unrelated query
    s.read.parquet(s"$dir/embeddings.parquet").count()
    for (round <- 1 to 2) {
      val src = s.read.parquet(s"$dir/embeddings.parquet").orderBy("vec_id").limit(500)
        .select(col("embedding").as("vector"),
          col("label").cast("string").as("metadata"))
      val root = java.nio.file.Files.createTempDirectory(s"graft-diag$round").toString
      val eng = new graft.core.Engine(s, root)
      time(s"r$round create")(eng.create("tg", vectorDimension = 64))
      time(s"r$round add 500")(eng.add("tg", src))
      val doc = time(s"r$round train")(eng.train("tg",
        params = Some(graft.index.IndexParams(16, 16, 8, omitOpq = true)),
        useTwoLevelClustering = Some(false),
        kmeansIters = 5, seed = 11L, minTrainRows = 1))
      time(s"r$round loadModel")(
        graft.index.IndexStore.loadModel(s, doc.indexPath(root)))
      // A10 phase (only measured once)
      if (round == 2) {
        val eCount = s.read.parquet(s"$dir/embeddings.parquet").count()
        val mult = math.ceil((graft.index.Heuristics.FlatIndexWarnSize + 1).toDouble / eCount).toLong
        val flatRoot = java.nio.file.Files.createTempDirectory("graft-diag-a10").toString
        val flatEng = new graft.core.Engine(s, flatRoot)
        time("a10 create")(flatEng.create("fw", vectorDimension = 2))
        val inflated = s.read.parquet(s"$dir/embeddings.parquet")
          .crossJoin(s.range(mult).select(col("id").as("rep")))
          .select(array(col("vec_id").cast("float"), col("rep").cast("float"))
            .as("vector"), lit(null).cast("string").as("metadata"))
        time("a10 add inflated")(flatEng.add("fw", inflated))
        time("a10 flatIndexWarning")(flatEng.flatIndexWarning("fw"))
        time("a10 count")(flatEng.count("fw"))
      }
    }
    spark.stop()
  }
}
