package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 32-bit SimHash fingerprint over the token multiset — near-dup keying by
  * Hamming distance on a single long. Computed as a pure per-row kernel:
  * each token hashes to 32 bits (first 8 hex chars of md5, a
  * cross-engine-stable hash), each bit position accumulates ±1 votes over
  * all tokens, the fingerprint sets bit i iff votes(i) > 0. All-integer
  * math, so the DuckDB oracle reproduces it exactly.
  *
  * Kernel-over-HOF for the same reason as [[MinHashLSH]]: a Catalyst
  * formulation (aggregate of zip_with over 32 bit positions) re-evaluates
  * the whole fold wherever CollapseProject inlines the column — measured
  * as the dominant cost of the banded near-dup self-join. The kernel
  * hashes each token once, total cost |tokens| md5 calls per row.
  */
object SimHash {

  val Bits = 32

  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val HexChars = "0123456789abcdef".toCharArray

  /** First 32 bits of md5(token) — same value as
    * `conv(substring(md5(t), 1, 8), 16, 10)`.
    */
  private def tokenHash32(s: String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 4) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** Whitespace tokens of lower-cased trimmed text (the
    * TextAnalysis.tokens contract: `split(trim(lower(text)), '\\s+')` —
    * SQL trim strips spaces only and SQL split KEEPS a trailing empty
    * token, so the kernel uses a space-only trim and split limit −1;
    * Java's defaults would strip edge tabs and drop the trailing empty,
    * changing the fingerprint vs the oracle).
    */
  def fingerprintLocal(text: String): Long = {
    val toks = MinHashLSH.sqlTrim(text.toLowerCase(Locale.ROOT)).split("\\s+", -1)
    val votes = new Array[Int](Bits)
    var t = 0
    while (t < toks.length) {
      val h = tokenHash32(toks(t))
      var i = 0
      while (i < Bits) {
        votes(i) += (if (((h >> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < Bits) { if (votes(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  /** Null text → null fingerprint (the null-propagation a Catalyst
    * formulation would have), not a task-killing NPE.
    */
  def fingerprint(text: Column): Column = {
    val f = udf { (t: String) =>
      if (t == null) None else Some(fingerprintLocal(t))
    }
    f(text)
  }

  /** Hamming distance between two fingerprints (bit-count of xor). */
  def hamming(a: Column, b: Column): Column = {
    val f = udf { (x: Long, y: Long) => java.lang.Long.bitCount(x ^ y).toLong }
    f(a, b)
  }

  /** Near-dup pairs within Hamming distance `maxHamming` of each other —
    * the pigeonhole-banded scale construction: split the 32-bit
    * fingerprint into `maxHamming + 1` byte-ish bands; ≤ maxHamming bit
    * flips cannot touch every band, so every true pair shares at least
    * one exact band value. Candidates come from ONE equi-join on
    * (band_idx, band_value) — never an n² cross join. Complete
    * (recall 1.0) by construction for maxHamming < numBands.
    *
    * Verify order matters at scale: popcount(xor) is one integer op per
    * joined row and cuts the candidate stream first; the dedup then keeps
    * a pair only in its FIRST colliding band — a per-row filter over the
    * carried band arrays instead of a multi-million-row DISTINCT shuffle
    * (same result set: exactly one row per true pair).
    *
    * `df` must carry (idCol, fpCol) with the fingerprint as a long.
    */
  def nearDupPairs(df: org.apache.spark.sql.DataFrame, idCol: String,
                   fpCol: String, maxHamming: Int): org.apache.spark.sql.DataFrame = {
    val numBands = maxHamming + 1
    val bandBits = Bits / numBands // 32/4 = 8 for the default maxHamming=3
    require(Bits % numBands == 0, s"$Bits bits not divisible by $numBands bands")
    val mask = (1L << bandBits) - 1
    val bandsUdf = udf { (fp: Long) =>
      Array.tabulate(numBands)(b => (fp >> (b * bandBits)) & mask)
    }
    val bands = df.select(col(idCol), col(fpCol), bandsUdf(col(fpCol)).as("bands"))
      .select(col(idCol), col(fpCol), col("bands"),
        posexplode(col("bands")).as(Seq("band_idx", "band_value")))
    val a = bands.select(col(idCol).as("doc_a"), col(fpCol).as("fp_a"),
      col("bands").as("bands_a"), col("band_idx"), col("band_value"))
    val b = bands.select(col(idCol).as("doc_b"), col(fpCol).as("fp_b"),
      col("bands").as("bands_b"), col("band_idx"), col("band_value"))
    a.join(b, Seq("band_idx", "band_value"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", hamming(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .filter(expr("NOT exists(zip_with(slice(bands_a, 1, band_idx), " +
        "slice(bands_b, 1, band_idx), (x, y) -> x = y), p -> p)"))
      .select("doc_a", "doc_b", "hamming")
  }
}
