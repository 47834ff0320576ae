package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 32-bit SimHash fingerprint over the token multiset — near-dup keying by
  * Hamming distance on a single long. Computed as a pure per-row
  * projection: each token hashes to 32 bits (first 8 hex chars of md5, a
  * cross-engine-stable hash), each bit position accumulates ±1 votes over
  * all tokens, the fingerprint sets bit i iff votes(i) > 0.
  *
  * Bit extraction uses integer divide/mod (h < 2³² so doubles are exact)
  * rather than shift builtins so the exact same arithmetic is expressible
  * in the DuckDB oracle.
  */
object SimHash {

  val Bits = 32

  def tokenHashes(toks: Column): Column =
    transform(toks, t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))

  /** votes(i) = Σ_tokens (2·bit_i − 1), i = 0..31, as array<long>. */
  def bitVotes(hashes: Column): Column =
    aggregate(hashes,
      array_repeat(lit(0L), Bits),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(Bits - 1)), (a, i) =>
        a + lit(2L) * ((h.cast("long") / pow(lit(2.0), i).cast("long")).cast("long") % 2L) - 1L))

  def fingerprint(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val votes = bitVotes(tokenHashes(toks))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(Bits - 1)), (v, i) =>
        when(v > 0, pow(lit(2.0), i).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two fingerprints (bit-count of xor). */
  def hamming(a: Column, b: Column): Column = {
    val x = a.bitwiseXOR(b)
    aggregate(sequence(lit(0), lit(Bits - 1)), lit(0L), (acc, i) =>
      acc + (x / pow(lit(2.0), i).cast("long")).cast("long") % 2L)
  }

  /** Near-dup pairs within Hamming distance `maxHamming` of each other —
    * the pigeonhole-banded scale construction: split the 32-bit
    * fingerprint into `maxHamming + 1` byte-ish bands; ≤ maxHamming bit
    * flips cannot touch every band, so every true pair shares at least
    * one exact band value. Candidates come from ONE equi-join on
    * (band_idx, band_value) — never an n² cross join — and the exact
    * Hamming check kills band false-positives. Complete (recall 1.0) by
    * construction for maxHamming < numBands.
    *
    * `df` must carry (idCol, fpCol) with the fingerprint as a long.
    */
  def nearDupPairs(df: org.apache.spark.sql.DataFrame, idCol: String,
                   fpCol: String, maxHamming: Int): org.apache.spark.sql.DataFrame = {
    val numBands = maxHamming + 1
    val bandBits = Bits / numBands // 32/4 = 8 for the default maxHamming=3
    require(Bits % numBands == 0, s"$Bits bits not divisible by $numBands bands")
    val bandSize = math.pow(2.0, bandBits).toLong
    val bands = df.select(col(idCol), col(fpCol),
      posexplode(array((0 until numBands).map { b =>
        (col(fpCol) / lit(math.pow(2.0, b * bandBits).toLong)).cast("long") % bandSize
      }: _*)).as(Seq("band_idx", "band_value")))
    val a = bands.select(col(idCol).as("doc_a"), col(fpCol).as("fp_a"),
      col("band_idx"), col("band_value"))
    val b = bands.select(col(idCol).as("doc_b"), col(fpCol).as("fp_b"),
      col("band_idx"), col("band_value"))
    a.join(b, Seq("band_idx", "band_value"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        hamming(col("fp_a"), col("fp_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
