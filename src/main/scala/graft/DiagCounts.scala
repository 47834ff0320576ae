package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DiagCounts {
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
      println(f"[diag] $tag: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val sigs = graft.operators.EmbeddingLSH.signatures(
      e, "vec_id", "embedding", numBands = 16, planesPerBand = 8, dim = 64).persist()
    println("[diag] sigs rows: " + sigs.count())
    val a = sigs.select(col("vec_id").as("id_a"), col("band_idx"), col("band_key"))
    val b = sigs.select(col("vec_id").as("id_b"), col("band_idx"), col("band_key"))
    val joined = a.join(b, Seq("band_idx", "band_key")).filter(col("id_a") < col("id_b"))
    time("band join count")(println("[diag] joined pairs: " + joined.count()))
    val dist = joined.select("id_a", "id_b").distinct().persist()
    time("distinct")(println("[diag] distinct pairs: " + dist.count()))
    // verify cost: current shape (per-pair norms)
    val vecs = e.select(col("vec_id"), col("embedding"))
    val v1 = dist
      .join(vecs.select(col("vec_id").as("id_a"), col("embedding").as("va")), Seq("id_a"))
      .join(vecs.select(col("vec_id").as("id_b"), col("embedding").as("vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(graft.functions.VectorFunctions.cosine(col("va"), col("vb")), 9).as("cos9"))
      .filter(col("cos9") >= 0.35)
    time("verify current (1)")(println("[diag] out: " + v1.count()))
    time("verify current (2)")(println("[diag] out: " + v1.count()))
    // bigram volumes
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = org.apache.spark.sql.functions.filter(
      graft.operators.TextAnalysis.tokens(col("text")), x => x =!= "")
    val bg = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1), (a,b) -> struct(a as w1, b as w2))")).as("bg"))
    time("bigram extract count")(println("[diag] bigrams: " + bg.count()))
    time("bigram extract count2")(println("[diag] bigrams: " + bg.count()))
    spark.stop()
  }
}
