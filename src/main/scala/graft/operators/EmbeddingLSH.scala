package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Random-hyperplane LSH over an embedding column — the scale path for
  * embedding-cosine near-duplicate detection: bucket by the sign pattern
  * of P hyperplane projections, then score cosine only within buckets.
  * One equi-join shuffle keyed by signature; never an n² cross join.
  * Two vectors with cosine ≈ 1 agree on every hyperplane sign with high
  * probability, so true near-dups share a bucket.
  *
  * Hyperplanes are ±1 vectors derived from md5 ("p-j" per plane/dim) so
  * the exact same planes are reproducible in the SQL oracle.
  */
object EmbeddingLSH {

  /** Deterministic ±1 hyperplane weights: +1 iff the first hex digit of
    * md5("p-j") is even (p = plane, j = 1-based dimension).
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

  /** Signature = Σ_p 2^p · [dot(v, plane_p) ≥ 0], as a long column. */
  def signature(vec: Column, planes: Array[Array[Double]]): Column = {
    val terms = planes.zipWithIndex.map { case (plane, p) =>
      val dp = VectorFunctions.dot(vec, typedLit(plane.toSeq))
      when(dp >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }
    terms.reduce(_ + _)
  }

  /** Near-dup pairs (a < b) within a signature bucket with cosine ≥ tau.
    * Cosine is rounded to 9dp before the threshold compare so a last-ulp
    * cross-engine difference cannot flip membership.
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   numPlanes: Int, dim: Int, tau: Double): DataFrame = {
    val pl = planes(numPlanes, dim)
    val sigs = df.select(col(idCol), col(vecCol),
      signature(col(vecCol), pl).as("sig"))
    val a = sigs.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("sig"))
    val b = sigs.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("sig"))
    a.join(b, Seq("sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(VectorFunctions.cosine(col("va"), col("vb")), 9).as("cos9"))
      .filter(col("cos9") >= tau)
  }
}
