package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnosis-only: the same session-window + hourly streams as the bench
  * rows, run at several shuffle-partition counts (the state-store
  * instance count per stateful op), to attribute the micro-batch fixed
  * cost. Not a bench artifact.
  */
object DiagStreamParts {
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
    s.read.parquet(s"$dir/events.parquet").count()
    val ev = s.read.parquet(s"$dir/events.parquet")
    // pre-stage the two-file session source once (same shape as the row)
    val base = ev.select(unix_micros(col("ts").cast("timestamp")).as("tus"),
      col("user_id"), col("value"))
    val Array(lo, hi) = base.agg(min(col("tus")), max(col("tus"))).first()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val split = lo + (hi - lo) / 2
    val tmp = java.nio.file.Files.createTempDirectory("diag-sp")
    base.withColumn("half", when(col("tus") <= split, "a").otherwise("b"))
      .repartition(col("half"))
      .write.partitionBy("half").mode("overwrite").parquet(tmp.toString)
    val srcDir = java.nio.file.Files.createTempDirectory("diag-sp-src")
    val now = System.currentTimeMillis()
    for ((h, mtime) <- Seq("a" -> (now - 60000), "b" -> now)) {
      val part = java.nio.file.Files.list(tmp.resolve(s"half=$h"))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = srcDir.resolve(s"$h.parquet")
      java.nio.file.Files.copy(part, dst)
      dst.toFile.setLastModified(mtime)
    }
    var n = 0
    for (p <- Seq("32", "32", "8", "2", "32", "2")) {
      n += 1
      s.conf.set("spark.sql.shuffle.partitions", p)
      try {
        val src = s.readStream
          .schema("tus LONG, user_id LONG, value DOUBLE")
          .option("maxFilesPerTrigger", 1)
          .parquet(srcDir.toString)
          .select(timestamp_micros(col("tus")).as("ts"), col("user_id"), col("value"))
        val qname = s"diag_sp_$n"
        time(s"sessions p=$p run$n")({
          val q = graft.streaming.EventStream.sessionWindows(src)
            .writeStream.format("memory").queryName(qname)
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination(); q
        })
        val srcDir2 = java.nio.file.Files.createTempDirectory(s"diag-sp-hr$n")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$dir/events.parquet"),
          srcDir2.resolve("events.parquet"))
        val src2 = s.readStream.schema(ev.schema).parquet(srcDir2.toString)
        time(s"hourly   p=$p run$n")({
          val q2 = graft.streaming.EventStream.hourlyCounts(
              src2.select(col("ts").cast("timestamp").as("ts"),
                col("event_type"), col("value")))
            .writeStream.format("memory").queryName(s"diag_sp_hr$n")
            .outputMode("complete")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q2.awaitTermination(); q2
        })
      } finally s.conf.set("spark.sql.shuffle.partitions", "32")
    }
    spark.stop()
  }
}
