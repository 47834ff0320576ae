package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Random-hyperplane LSH over an embedding column — the scale path for
  * embedding-cosine near-duplicate detection, with the standard
  * OR-of-ANDs banding construction: `b` bands of `r` hyperplanes each; a
  * pair is a candidate iff it agrees on ALL `r` signs of SOME band. AND
  * within a band keeps buckets selective; OR across bands recovers recall
  * for mid-similarity pairs (a pair at cosine 0.8 agrees on one 4-plane
  * band with p≈0.40, but on at least one of 8 bands with p≈0.98 — a
  * single 8-plane AND would find it with only p≈0.16).
  *
  * Candidates come from one equi-join shuffle keyed by
  * (band_idx, band_key) — never an n² cross join — then exact cosine
  * verification kills banding false-positives, mirroring
  * [[MinHashLSH.candidatePairs]].
  *
  * Hyperplanes are ±1 vectors derived from md5 ("g-j" per global plane
  * index/dim) so the exact same planes are reproducible in the SQL oracle.
  */
object EmbeddingLSH {

  /** Deterministic ±1 hyperplane weights: +1 iff the first hex digit of
    * md5("g-j") is even (g = global plane index, j = 1-based dimension).
    */
  def planes(numPlanes: Int, dim: Int): Array[Array[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes) { p =>
      Array.tabulate(dim) { j0 =>
        val hex = md.digest(s"$p-${j0 + 1}".getBytes(StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
        if (Integer.parseInt(hex.substring(0, 1), 16) % 2 == 0) 1.0 else -1.0
      }
    }
  }

  /** Per-band signature keys: array of `b` longs where band i packs the
    * sign bits of planes [i·r, (i+1)·r) as Σ_p 2^p · [dot(v, plane) ≥ 0].
    * One per-row JVM kernel computes all b·r projections in a tight loop
    * (the same kernel-over-HOF choice as MinHashLSH.bandKeys: b·r
    * separate Catalyst dot expressions each codegen their own d-element
    * literal loop, and a shared-subexpression formulation re-evaluates
    * after CollapseProject inlining). Double math in the same
    * left-to-right fold order as the SQL oracle.
    */
  def bandKeys(vec: Column, planes: Array[Array[Double]], r: Int): Column = {
    require(planes.length % r == 0, s"${planes.length} planes not divisible by r=$r")
    val b = planes.length / r
    val f = udf { (v: Seq[Double]) =>
      if (v == null) null // null embedding: posexplode drops the row
      else {
        val arr = v.toArray
        Array.tabulate(b) { i =>
          var key = 0L
          var p = 0
          while (p < r) {
            val plane = planes(i * r + p)
            var s = 0.0
            var j = 0
            while (j < arr.length) { s += arr(j) * plane(j); j += 1 }
            if (s >= 0) key |= (1L << p)
            p += 1
          }
          key
        }
      }
    }
    f(vec.cast("array<double>"))
  }

  /** Distinct candidate pairs (a < b) sharing at least one band bucket —
    * a single equi-join shuffle on (band_idx, band_key). `maxBucket` caps
    * degenerate buckets before the join (see
    * [[MinHashLSH.candidatePairs]] — same skew guard, same rationale).
    */
  def candidatePairs(df: DataFrame, idCol: String, vecCol: String,
                     numBands: Int, planesPerBand: Int, dim: Int,
                     maxBucket: Int = Int.MaxValue): DataFrame = {
    val pl = planes(numBands * planesPerBand, dim)
    val sigs = df.select(col(idCol),
      posexplode(bandKeys(col(vecCol), pl, planesPerBand)).as(Seq("band_idx", "band_key")))
    val src = MinHashLSH.capBuckets(sigs, Seq("band_idx", "band_key"), maxBucket)
    val a = src.select(col(idCol).as("id_a"), col("band_idx"), col("band_key"))
    val b = src.select(col(idCol).as("id_b"), col("band_idx"), col("band_key"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Candidate pairs with the skew cap ON and dropped buckets ROUTED
    * through exact-vector dedup: members of over-cap buckets group by
    * their exact embedding (identical vectors — the flood case: default
    * embeddings, zero vectors, template docs embedded repeatedly) and
    * each group emits star pairs (minId, memberId). Mirrors
    * [[MinHashLSH.candidatePairsRouted]].
    */
  def candidatePairsRouted(df: DataFrame, idCol: String, vecCol: String,
                           numBands: Int, planesPerBand: Int, dim: Int,
                           maxBucket: Int = MinHashLSH.DefaultMaxBucket): DataFrame =
    candidatePairsRoutedFromSigs(df,
      signatures(df, idCol, vecCol, numBands, planesPerBand, dim),
      idCol, vecCol, maxBucket)

  /** (id, band_idx, band_key) signature rows — the per-row projection
    * kernel as a standalone stage (mirrors [[MinHashLSH.bands]]) so a
    * pipeline can materialize it ONCE and fan out; the kernel is the
    * expensive part (b·r dot products per row) and a plan that references
    * the input several times would otherwise re-execute it per reference.
    */
  def signatures(df: DataFrame, idCol: String, vecCol: String,
                 numBands: Int, planesPerBand: Int, dim: Int): DataFrame = {
    val pl = planes(numBands * planesPerBand, dim)
    df.select(col(idCol),
      posexplode(bandKeys(col(vecCol), pl, planesPerBand)).as(Seq("band_idx", "band_key")))
  }

  /** [[candidatePairsRouted]] over precomputed [[signatures]].
    *
    * Runtime adaptivity (AQE-style): one cheap aggregation over the
    * (cached) signature table probes the max bucket size first. When no
    * bucket exceeds the cap — the common case on healthy corpora — the
    * whole skew apparatus (window count, over-cap routing, exact-vector
    * star pairs, union) is pruned from the plan and the operator is just
    * band-join + distinct; the routed plan only materializes when
    * flooding is actually present. The probe costs one shuffle of rows
    * the window count would shuffle anyway.
    */
  def candidatePairsRoutedFromSigs(df: DataFrame, sigs: DataFrame,
                                   idCol: String, vecCol: String,
                                   maxBucket: Int = MinHashLSH.DefaultMaxBucket): DataFrame =
    candidateRawFromSigs(df, sigs, idCol, vecCol, maxBucket).distinct()

  /** [[candidatePairsRoutedFromSigs]] WITHOUT the final distinct — a pair
    * appears once per shared band. The verify path consumes this form and
    * dedups AFTER the cosine threshold: the deterministic per-pair cos9
    * makes duplicate rows identical, so distinct-after-filter yields the
    * same set while the heavy exchange dedups only the few surviving
    * pairs instead of every banding candidate.
    */
  private def candidateRawFromSigs(df: DataFrame, sigs: DataFrame,
                                   idCol: String, vecCol: String,
                                   maxBucket: Int): DataFrame = {
    val maxRow = sigs.groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("n")).agg(max(col("n"))).first()
    // Global max over zero groups is a null row: empty input takes the
    // fast path (empty band join → empty result) instead of an NPE.
    val maxN = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    if (maxN <= maxBucket) {
      val a = sigs.select(col(idCol).as("id_a"), col("band_idx"), col("band_key"))
      val b = sigs.select(col(idCol).as("id_b"), col("band_idx"), col("band_key"))
      return a.join(b, Seq("band_idx", "band_key"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band_idx"), col("band_key"))
    val counted = sigs.withColumn("bucket_n", count(lit(1)).over(w))
    val kept = counted.filter(col("bucket_n") <= maxBucket).drop("bucket_n")
    val a = kept.select(col(idCol).as("id_a"), col("band_idx"), col("band_key"))
    val b = kept.select(col(idCol).as("id_b"), col("band_idx"), col("band_key"))
    val lsh = a.join(b, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val dropped = counted.filter(col("bucket_n") > maxBucket)
      .select(col(idCol)).distinct()
    val exact = df.join(dropped, Seq(idCol), "left_semi")
      .select(col(idCol), col(vecCol))
      .withColumn("keep", min(col(idCol)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(vecCol))))
      .filter(col(idCol) =!= col("keep"))
      .select(col("keep").as("id_a"), col(idCol).as("id_b"))
    lsh.union(exact)
  }

  /** Near-dup pairs (a < b) from the banded buckets with cosine ≥ tau
    * (exact verification over vectors joined back by id — pairs are small
    * post-banding, the vector table is never shuffled twice). Cosine is
    * rounded to 9dp before the threshold compare so a last-ulp
    * cross-engine difference cannot flip membership.
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   numBands: Int, planesPerBand: Int, dim: Int,
                   tau: Double, maxBucket: Int = Int.MaxValue): DataFrame =
    verifyCosine(df, idCol, vecCol, tau,
      candidatePairs(df, idCol, vecCol, numBands, planesPerBand, dim, maxBucket))

  /** [[nearDupPairs]] over the ROUTED candidate set (default-on skew cap,
    * flooded buckets resolved by exact-vector star pairs — which pass the
    * cosine verify at exactly 1.0).
    */
  def nearDupPairsRouted(df: DataFrame, idCol: String, vecCol: String,
                         numBands: Int, planesPerBand: Int, dim: Int,
                         tau: Double,
                         maxBucket: Int = MinHashLSH.DefaultMaxBucket): DataFrame =
    verifyCosine(df, idCol, vecCol, tau,
      candidatePairsRouted(df, idCol, vecCol, numBands, planesPerBand, dim, maxBucket))

  /** [[nearDupPairsRouted]] over precomputed [[signatures]] (one kernel
    * materialization shared by the window count, both join sides, and any
    * sibling consumer).
    */
  def nearDupPairsRoutedFromSigs(df: DataFrame, sigs: DataFrame,
                                 idCol: String, vecCol: String, tau: Double,
                                 maxBucket: Int = MinHashLSH.DefaultMaxBucket): DataFrame =
    // raw (per-band) candidates; dedup AFTER the tau filter — identical
    // pair set (cos9 is deterministic per pair), but the distinct's
    // exchange carries only the surviving near-dups, not every banding
    // candidate (see candidateRawFromSigs)
    verifyCosine(df, idCol, vecCol, tau,
      candidateRawFromSigs(df, sigs, idCol, vecCol, maxBucket))
      .distinct()

  /** Exact cosine verification over candidate (id_a, id_b) pairs: vectors
    * joined back by id — pairs are small post-banding, the vector table is
    * never shuffled twice. Cosine is rounded to 9dp before the threshold
    * compare so a last-ulp cross-engine difference cannot flip membership.
    */
  private def verifyCosine(df: DataFrame, idCol: String, vecCol: String,
                           tau: Double, pairs: DataFrame): DataFrame = {
    // Each vector's norm is computed ONCE on the per-vector side of the
    // joins (O(n) evals) instead of inside the per-pair cosine (O(pairs)
    // interpreted re-evals — 2 norms per candidate, and once more in the
    // output projection). dot/(na·nb) runs the exact double op sequence
    // of VectorFunctions.cosine — sqrt of the same left-to-right Σx²
    // fold, then the same multiply/divide order — so cos9 is
    // bit-identical to the inline form.
    val vecs = df.select(col(idCol), col(vecCol),
      VectorFunctions.l2Norm(col(vecCol)).as("nrm"))
    pairs
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("va"),
        col("nrm").as("na")), Seq("id_a"))
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
        col("nrm").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(VectorFunctions.dot(col("va"), col("vb")) /
          (col("na") * col("nb")), 9).as("cos9"))
      .filter(col("cos9") >= tau)
  }
}
