package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection — the training-data dedup
  * primitive the reference lacks (its roadmap stops at metadata filtering,
  * README.md:52; this is the §2-beyond operator for LLM pipelines).
  *
  * Shape, built for 100 TB:
  *  - signatures are a pure per-row projection (no shuffle): shingle set →
  *    H minhashes, each the array_min of a deterministic per-shingle hash
  *    (md5 of `seed:shingle`, lexicographic min — cross-engine stable)
  *  - banding explodes H/r band keys per doc and finds candidates with an
  *    equi-join on (band_idx, band_key): one hash shuffle keyed by band,
  *    NEVER an all-pairs cross join; cost tracks the number of colliding
  *    docs per bucket, not n²
  *  - verification joins candidate pairs back to their exact shingle sets
  *    and filters on true Jaccard — false positives from banding die here
  */
object MinHashLSH {

  /** Word w-shingles of lower-cased, whitespace-split text; docs shorter
    * than w shingle to their whole token string.
    */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    when(size(toks) >= w,
      transform(sequence(lit(1), size(toks) - (w - 1)), i =>
        concat_ws(" ", (0 until w).map(o => element_at(toks, i + o)): _*)))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** H-element MinHash signature (array<string>): element s is the
    * lexicographic min of md5(s + ":" + shingle) over the shingle set.
    */
  def signature(shingleCol: Column, numHashes: Int = 12): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), s =>
      array_min(transform(shingleCol, sh =>
        md5(concat(s.cast("string"), lit(":"), sh)))))

  /** (band_idx, band_key) rows, `numHashes / r` bands per doc. */
  def bands(df: DataFrame, idCol: String, sigCol: String, r: Int = 3): DataFrame = {
    val sig = col(sigCol)
    val bandKeys = transform(sequence(lit(0), (size(sig) / r).cast("int") - 1), b =>
      md5(concat_ws("", (0 until r).map(o => element_at(sig, b * r + o + 1)): _*)))
    df.select(col(idCol), posexplode(bandKeys).as(Seq("band_idx", "band_key")))
  }

  /** Distinct candidate pairs (a < b) sharing at least one band bucket —
    * a single equi-join shuffle on (band_idx, band_key).
    */
  def candidatePairs(bandsDf: DataFrame, idCol: String): DataFrame = {
    val a = bandsDf.select(col(idCol).as("doc_a"), col("band_idx"), col("band_key"))
    val b = bandsDf.select(col(idCol).as("doc_b"), col("band_idx"), col("band_key"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Exact Jaccard over two pre-distinct shingle-set columns. */
  def jaccard(setA: Column, setB: Column): Column = {
    val inter = size(array_intersect(setA, setB)).cast("double")
    inter / (size(setA) + size(setB) - inter)
  }
}
