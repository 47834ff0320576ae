package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Diagnosis-only: phase timing of the streaming bench rows. */
object DiagStream {
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
    s.read.parquet(s"$dir/events.parquet").count() // session warm
    for (rnd <- 1 to 2) {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val base = ev.select(unix_micros(col("ts").cast("timestamp")).as("tus"),
        col("user_id"), col("value"))
      val Array(lo, hi) = time(s"r$rnd minmax")(
        base.agg(min(col("tus")), max(col("tus"))).first()
          .toSeq.map(_.asInstanceOf[Long]).toArray)
      val split = lo + (hi - lo) / 2
      val tmp = java.nio.file.Files.createTempDirectory(s"diag-sess$rnd")
      time(s"r$rnd staging write")(
        base.withColumn("half", when(col("tus") <= split, "a").otherwise("b"))
          .repartition(col("half"))
          .write.partitionBy("half").mode("overwrite").parquet(tmp.toString))
      val srcDir = java.nio.file.Files.createTempDirectory(s"diag-sess-src$rnd")
      val now = System.currentTimeMillis()
      for ((h, mtime) <- Seq("a" -> (now - 60000), "b" -> now)) {
        val part = java.nio.file.Files.list(tmp.resolve(s"half=$h"))
          .filter(_.toString.endsWith(".parquet")).findFirst().get()
        val dst = srcDir.resolve(s"$h.parquet")
        java.nio.file.Files.copy(part, dst)
        dst.toFile.setLastModified(mtime)
      }
      val src = s.readStream
        .schema("tus LONG, user_id LONG, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.toString)
        .select(timestamp_micros(col("tus")).as("ts"), col("user_id"), col("value"))
      val qname = s"diag_sessions_$rnd"
      val q = time(s"r$rnd stream run")({
        val q = graft.streaming.EventStream.sessionWindows(src)
          .writeStream.format("memory").queryName(qname)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(); q
      })
      val w = Window.partitionBy(col("user_id")).orderBy(col("start_us"))
      time(s"r$rnd post+checkpoint")(
        s.table(qname)
          .withColumn("session_idx", row_number().over(w).cast("long"))
          .select(col("user_id"), col("session_idx"), col("n_events"),
            round(col("sum_value"), 2).as("sum_value"), col("start_us"),
            (col("end_us") - lit(1800000000L) - col("start_us")).as("duration_us"))
          .localCheckpoint(eager = true).count())
      // hourly twin
      val srcDir2 = java.nio.file.Files.createTempDirectory(s"diag-hr$rnd")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        srcDir2.resolve("events.parquet"))
      val src2 = s.readStream.schema(ev.schema).parquet(srcDir2.toString)
      val q2name = s"diag_hourly_$rnd"
      time(s"r$rnd hourly stream run")({
        val q2 = graft.streaming.EventStream.hourlyCounts(
            src2.select(col("ts").cast("timestamp").as("ts"), col("event_type"), col("value")))
          .writeStream.format("memory").queryName(q2name)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q2.awaitTermination()
      })
    }
    spark.stop()
  }
}
