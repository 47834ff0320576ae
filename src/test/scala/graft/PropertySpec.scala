package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.VectorFunctions
import graft.operators.MinHashLSH

/** Property-based invariants the reference's test suite lacks (SURVEY §5
  * port strategy): normalization idempotence, ranking-score bounds,
  * shingle/minhash structure, and order-insensitivity of the simhash vote
  * accumulation. Plain ScalaCheck generators sampled with fixed seeds
  * (deterministic, no scalatestplus bridge needed); Spark-side checks are
  * batched into one DataFrame per property.
  */
class PropertySpec extends SparkSpec {

  private val params = Gen.Parameters.default

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(params, Seed(i.toLong)))

  private val vecGen: Gen[List[Float]] =
    Gen.chooseNum(1, 32).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100f, 100f))).map(_ :+ 1.0f) // never all-zero

  test("property: l2 normalize is idempotent and unit-norm (A2 invariant)") {
    import spark.implicits._
    val vecs = samples(vecGen, 60)
    val rows = vecs.map(Tuple1(_)).toDF("v").select(
      VectorFunctions.l2Norm(VectorFunctions.l2Normalize(col("v"))).as("n1"),
      VectorFunctions.l2Norm(
        VectorFunctions.l2Normalize(VectorFunctions.l2Normalize(col("v")))).as("n2"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9, "normalize → unit norm")
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9, "normalize idempotent")
    }
  }

  test("property: cosine of normalized vectors is within [-1, 1]") {
    import spark.implicits._
    val pairs = samples(Gen.zip(vecGen, vecGen), 40).map { case (a0, b0) =>
      val d = math.max(a0.length, b0.length)
      (a0.padTo(d, 0.0f), b0.padTo(d, 0.0f))
    }
    val sims = pairs.toDF("a", "b")
      .select(VectorFunctions.dot(
        VectorFunctions.l2Normalize(col("a")),
        VectorFunctions.l2Normalize(col("b"))))
      .collect().map(_.getDouble(0))
    sims.foreach(s => assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9))
  }

  private val textGen: Gen[String] =
    Gen.chooseNum(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta"))
        .map(_.mkString(" ")))

  test("property: shingle count and minhash monotonicity") {
    samples(textGen, 100).foreach { t =>
      val sh = MinHashLSH.shingleStrings(t, 3)
      val nTok = t.split("\\s+").length
      assert(sh.length == math.max(1, nTok - 2))
      val sig = MinHashLSH.signatureLocal(sh, 8)
      assert(sig.length == 8 && sig.forall(v => v >= 0L && v < 2147483647L))
      // each element is a min over per-shingle hashes → adding a shingle
      // can only keep or lower every element
      val sig2 = MinHashLSH.signatureLocal(sh :+ "extra shingle here", 8)
      sig.zip(sig2).foreach { case (a, b) => assert(b <= a) }
      // determinism: band keys reproduce exactly
      val b1 = MinHashLSH.bandKeysLocal(MinHashLSH.signatureLocal(sh, 12), 3)
      val b2 = MinHashLSH.bandKeysLocal(MinHashLSH.signatureLocal(sh, 12), 3)
      assert(b1.toSeq == b2.toSeq && b1.length == 4)
    }
  }

  test("minhash permutations are not scalar multiples of one base hash") {
    // With a linear constant schedule (a_s, b_s both ∝ s+1) every signature
    // element collapses to h_s(x) = (s+1)·h_0(x) mod p — the hashes are one
    // permutation rescaled, which ~doubles the band false-negative rate at
    // J≈0.8. For single-shingle docs sig(s) IS h_s(base), so the degenerate
    // identity would hold exactly for every input; reject it.
    val P = 2147483647L
    val singles = Seq("alpha", "beta gamma", "delta-7", "zeta eps theta", "x")
    val degenerate = singles.forall { t =>
      val sig = MinHashLSH.signatureLocal(Array(t), 12)
      (1 until 12).forall(s => sig(s) == ((s + 1) * sig(0)) % P)
    }
    assert(!degenerate, "signature elements are scalar multiples of sig(0)")
    // and the constants differ across seeds: 12 distinct values per input
    singles.foreach { t =>
      assert(MinHashLSH.signatureLocal(Array(t), 12).distinct.length == 12)
    }
  }

  private val whitespaceTextGen: Gen[String] = {
    val piece = Gen.oneOf(
      Gen.oneOf("alpha", "beta", "Gamma", "DELTA", "x1", "..", "a-b"),
      Gen.oneOf(" ", "  ", "\t", "\n", " \t", "\r\n"))
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, piece).map(_.mkString))
  }

  test("property: kernel tokenization ≡ Spark SQL split(trim(lower)) on hostile whitespace") {
    import spark.implicits._
    // the differential guard for the oracle contract: the JVM kernels
    // (MinHash shingles, SimHash fingerprints) must tokenize EXACTLY like
    // the Catalyst column the SQL oracle mirrors — space-only trim, keep
    // trailing empty tokens. This property catches the Java trim/split
    // divergence class of bug on edge tabs/newlines.
    val texts = samples(whitespaceTextGen, 150).filter(_.nonEmpty).distinct
    val sparkSide = texts.toDF("t")
      .select(col("t"), graft.operators.TextAnalysis.tokens(col("t")).as("w"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    texts.foreach { t =>
      // w=1 shingles are the raw token list
      val kernelToks = MinHashLSH.shingleStrings(t, 1).toSeq
      assert(kernelToks == sparkSide(t),
        s"kernel vs Spark tokenization diverged on ${t.map(_.toInt)}: " +
          s"$kernelToks vs ${sparkSide(t)}")
    }
  }

  test("property: simhash is word-order insensitive (vote sums commute)") {
    import spark.implicits._
    val texts = samples(Gen.zip(textGen, Gen.long), 25)
    val both = texts.flatMap { case (t, seed) =>
      val shuffled = new scala.util.Random(seed)
        .shuffle(t.split("\\s+").toSeq).mkString(" ")
      Seq((t, 0), (shuffled, 1))
    }
    val fps = both.toDF("text", "variant")
      .select(graft.operators.SimHash.fingerprint(col("text")))
      .collect().map(_.getLong(0))
    fps.grouped(2).foreach { case Array(a, b) => assert(a == b) }
  }
}
