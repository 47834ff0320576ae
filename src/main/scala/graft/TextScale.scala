package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale proof for the text-curation pipeline at document volumes the
  * sf-bench never reaches. Generates a deterministic corpus DISTRIBUTED
  * over `spark.range` (docs are word sequences drawn from a vocabulary by
  * xxhash64 — whole-stage codegen, no driver data; ~5% of docs reuse a
  * neighbor's seed, planting exact duplicates for the dedup stages) and
  * measures full-pipeline wall times:
  *
  *   - dedup_exact: md5 groupBy (content hash → keeper + count)
  *   - minhash: signature kernel + banded candidate-pair count (the
  *     LSH join, skew cap on)
  *   - quality + lang_id: the per-row scoring scans in one pass
  *   - unigram_logprob: dictionary build + broadcast-join scoring
  *
  * Env knobs: GRAFT_DSCALE_N (10000000), SPARK_GRAFT_CPUS (32).
  * Prints ONE JSON line.
  */
object TextScale {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_DSCALE_N", "10000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vocab = Array.tabulate(512)(i => f"w${i}%03d")
    // ~5% of docs copy the seed of the aligned doc in their 16-block →
    // exact duplicates at a known rate, found by dedup + banding alike
    val seed = when(pmod(xxhash64(col("id"), lit(9)), lit(20)) === 0,
      col("id") - pmod(col("id"), lit(16))).otherwise(col("id"))
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(
        sequence(lit(1), (lit(40) + pmod(xxhash64(seed, lit(7)), lit(80))).cast("int")),
        j => element_at(
          typedLit(vocab),
          (pmod(xxhash64(seed, j), lit(vocab.length)) + 1).cast("int"))))
        .as("text"))

    val (_, genSec) = timed(docs.count())

    val (dedupOut, dedupSec) = timed {
      docs.groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("c"))
        .agg(count(lit(1)), sum(when(col("c") > 1, col("c") - 1).otherwise(0L)))
        .collect()(0)
    }
    val (bandOut, bandSec) = timed {
      val bands = graft.operators.MinHashLSH.bands(docs, "doc_id", "text")
      graft.operators.MinHashLSH
        .candidatePairsRouted(docs, bands, "doc_id", "text")
        .agg(count(lit(1))).collect()(0)
    }
    val (scoreOut, scoreSec) = timed {
      docs.select(graft.operators.TextAnalysis.docScores(col("text")).as("sc"))
        .agg(round(avg(col("sc.quality")), 6),
          count(when(col("sc.lang") =!= "und", 1)))
        .collect()(0)
    }
    val (lmOut, lmSec) = timed {
      graft.operators.TextAnalysis.unigramLogProb(docs, "doc_id", "text")
        .agg(round(avg(col("logprob")), 6), count(lit(1))).collect()(0)
    }

    def r(x: Double): Double = math.round(x * 1000) / 1000.0
    println(s"""{"n":$n,"gen_sec":${r(genSec)},""" +
      s""""dedup_sec":${r(dedupSec)},"distinct_docs":${dedupOut.getLong(0)},"dup_rows":${dedupOut.getLong(1)},""" +
      s""""minhash_sec":${r(bandSec)},"cand_pairs":${bandOut.getLong(0)},""" +
      s""""score_sec":${r(scoreSec)},"mean_quality":${scoreOut.getDouble(0)},""" +
      s""""lm_sec":${r(lmSec)},"mean_logprob":${lmOut.getDouble(0)},"scored_docs":${lmOut.getLong(1)}}""")
    spark.stop()
  }
}
