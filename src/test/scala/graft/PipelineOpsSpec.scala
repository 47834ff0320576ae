package graft

import org.apache.spark.sql.functions._

import graft.operators.{Quantization, TextAnalysis}

/** Behavioral invariants of the dataset-curation operators (split /
  * repetition / quantization); cross-engine value parity is covered by
  * their DuckDB oracle rows.
  */
class PipelineOpsSpec extends SparkSpec {

  import spark.implicits._

  test("dataset split: deterministic, content-addressed, ~90/5/5") {
    val docs = (0 until 2000).map(i => (i.toLong, s"document number $i body"))
      .toDF("doc_id", "text")
    val (bucket, split) = TextAnalysis.datasetSplit(col("text"))
    val out = docs.select(col("doc_id"), col("text"), bucket.as("b"), split.as("s"))
    val frac = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / 2000).toMap
    assert(math.abs(frac("train") - 0.90) < 0.03, s"train frac ${frac("train")}")
    assert(frac("validation") > 0.02 && frac("test") > 0.02)
    // content-addressed: an exact duplicate text lands in the same split
    val dup = Seq((9000L, "document number 7 body")).toDF("doc_id", "text")
      .select(split.as("s")).head().getString(0)
    val orig = out.filter(col("doc_id") === 7L).head().getString(3)
    assert(dup == orig, "duplicate content must not straddle splits")
    // stable across evaluations
    assert(out.select("doc_id", "s").collect().toSeq ==
      docs.select(col("doc_id"), split.as("s")).collect().toSeq)
  }

  test("dataset split: null text propagates null bucket AND null split") {
    val docs = Seq((0L, "real text"), (1L, null: String)).toDF("doc_id", "text")
    val (bucket, split) = TextAnalysis.datasetSplit(col("text"))
    val out = docs.select(col("doc_id"), bucket.as("b"), split.as("s")).collect()
      .map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(out(0L) == (false, false))
    assert(out(1L) == (true, true),
      "null text must yield null split, not fall through to 'test'")
  }

  test("repetition scores: known values on crafted docs") {
    val docs = Seq(
      (0L, "spam spam spam spam"),          // all repeats of one token
      (1L, "alpha beta gamma delta"),       // no repetition
      (2L, "one")                           // single token, no bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionScores(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(0L) == (0.75, 1.0), s"got ${out(0L)}") // 3/4 dup tokens; bigram 'spam spam' = 3/3
    assert(out(1L)._1 == 0.0, s"no dup tokens expected: ${out(1L)}")
    assert(math.abs(out(1L)._2 - 0.333333) < 1e-6) // each bigram once, max 1 of 3
    assert(out(2L) == (0.0, 0.0), "no bigrams -> zero top-bigram mass")
  }

  test("contamination: overlapping 5-grams counted, clean docs zero") {
    val bench = Seq(
      (0L, "the capital of france is paris and always was")).toDF("doc_id", "text")
    val docs = Seq(
      // shares exactly two benchmark 5-grams: "the capital of france is"
      // and "capital of france is paris"
      (20L, "we know the capital of france is paris indeed"),
      (21L, "completely unrelated sentence about spark engines here"),
      (22L, "tiny doc")                      // < 5 tokens → whole-string gram
    ).toDF("doc_id", "text")
    val out = TextAnalysis.contaminationCounts(docs, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(20L) == 2L, s"expected 2 overlapping 5-grams, got ${out(20L)}")
    assert(out(21L) == 0L && out(22L) == 0L)
  }

  test("int8 quantization: exact codes, reconstruction within half a step") {
    val vecs = Seq(
      (0L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (1L, Seq(0.0f, 0.0f, 0.0f, 0.0f)) // zero vector must not divide by zero
    ).toDF("vec_id", "embedding")
    val out = Quantization.int8Stats(vecs, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // scale 1.0 -> q = [127, -64, 32, 0] (round half away from zero)
    assert(out(0L) == (1.0, 95L, 223L, 127L, 0L), s"got ${out(0L)}")
    assert(out(1L) == (0.0, 0L, 0L, 0L, 0L), s"zero vector: ${out(1L)}")

    // codes stay in [-127, 127] and reconstruct within scale/254 per element
    val e = sf("sf0.001", "embeddings")
    val scale = Quantization.maxAbsScale(col("embedding"))
    val q = Quantization.int8Codes(col("embedding"), scale)
    val checked = e.select(
      aggregate(q, lit(true), (acc, x) => acc && x >= -127L && x <= 127L).as("in_range"),
      aggregate(zip_with(col("embedding"), q, (x, qi) =>
          abs(x.cast("double") - qi * scale / 127.0)),
        lit(0.0), (acc, d) => greatest(acc, d)).as("max_err"),
      (scale / 254.0 + lit(1e-12)).as("half_step"))
    val rows = checked.collect()
    assert(rows.forall(_.getBoolean(0)), "a code left [-127, 127]")
    assert(rows.forall(r => r.getDouble(1) <= r.getDouble(2)),
      "reconstruction error exceeded half a quantization step")
  }

  test("unigram logprob: matches hand computation, ranks common above rare") {
    // corpus: "a" appears 6x, "b" 3x, "z" 1x; total 10 tokens
    val docs = Seq(
      (0L, "a a a b"), (1L, "a a a b b"), (2L, "z")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def lp(cnt: Int): Double = math.log(cnt / 10.0)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0L)._1 == 4 && out(0L)._2 == r6((3 * lp(6) + lp(3)) / 4))
    assert(out(1L)._1 == 5 && out(1L)._2 == r6((3 * lp(6) + 2 * lp(3)) / 5))
    assert(out(2L)._1 == 1 && out(2L)._2 == r6(lp(1)))
    // the all-rare doc scores strictly below the common-token docs
    assert(out(2L)._2 < out(0L)._2 && out(2L)._2 < out(1L)._2)
  }

  test("bigram logprob: word order matters - a shuffled doc scores below fluent twins") {
    import spark.implicits._
    // Same unigrams everywhere; doc 3 reorders so its first transition
    // is the minority continuation of prefix 'the' - unigram-blind,
    // bigram-visible. Pair counts: (the,cat)=3 (cat,sat)=3 (the,sat)=1
    // (sat,cat)=1; prefixes: the->4, cat->3, sat->1.
    val docs = Seq(
      (0L, "the cat sat"),
      (1L, "the cat sat"),
      (2L, "the cat sat"),
      (3L, "the sat cat"),
      (4L, "x")                    // <2 tokens -> no bigram row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def r6b(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(!out.contains(4L))
    assert(out(0L) == out(1L) && out(1L) == out(2L))
    // fluent: avg(ln(3/4), ln(3/3)); shuffled: avg(ln(1/4), ln(1/1))
    assert(out(0L) == ((2L, r6b(math.log(3.0 / 4) / 2))))
    assert(out(3L) == ((2L, r6b(math.log(1.0 / 4) / 2))))
    assert(out(3L)._2 < out(0L)._2)
  }

  test("kmv sketch: estimate within 3/sqrt(k) of a 20k-token truth; exact below k") {
    import spark.implicits._
    // one group with 20,000 distinct tokens (k=256 -> ~6% rel error,
    // assert 3x that); one tiny group below k -> exact count
    val big = (0 until 200).map(i =>
      (0L + i, (i * 100 until (i + 1) * 100).map(t => s"tok$t").mkString(" "), "big"))
    val small = Seq((9000L, "a b c d e", "small"))
    val docs = (big ++ small).toDF("doc_id", "text", "source")
    val out = TextAnalysis.kmvDistinct(docs, "source", "text", k = 256)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val (bigK, bigEst) = out("big")
    assert(bigK == 256)
    assert(math.abs(bigEst - 20000.0) / 20000.0 < 3.0 / math.sqrt(256),
      s"estimate $bigEst too far from 20000")
    assert(out("small") == ((5L, 5.0)), "below-k group must be exact")
  }

  test("kmv overlap: sketch-only jaccard within 3/sqrt(k) of a controlled truth") {
    import spark.implicits._
    // A = tokens 0..2999, B = 2000..4999 → true J = 1000/5000 = 0.2;
    // C = 0..2999 (identical to A) → J(A,C) = 1.0 exactly
    def doc(lo: Int, hi: Int, id: Long, g: String) =
      (id, (lo until hi).map(t => s"tok$t").mkString(" "), g)
    val docs = ((0 until 30).map(i => doc(i * 100, (i + 1) * 100, i, "a")) ++
      (0 until 30).map(i => doc(2000 + i * 100, 2000 + (i + 1) * 100, 100 + i, "b")) ++
      (0 until 30).map(i => doc(i * 100, (i + 1) * 100, 200 + i, "c")))
      .toDF("doc_id", "text", "source")
    val sk = TextAnalysis.kmvSketches(docs, "source", "text", k = 256)
    val out = TextAnalysis.kmvOverlap(sk, "source", k = 256)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    val (jab, uab) = out(("a", "b"))
    assert(math.abs(jab - 0.2) < 3.0 / math.sqrt(256), s"J(a,b)=$jab vs 0.2")
    assert(math.abs(uab - 5000.0) / 5000.0 < 3.0 / math.sqrt(256), s"U=$uab")
    val (jac, _) = out(("a", "c"))
    assert(jac == 1.0, s"identical vocabularies must estimate J=1, got $jac")
  }

  test("chunk docs: full coverage, exact overlap, short doc is one whole chunk") {
    import spark.implicits._
    // 10 tokens, window 4, stride 3 → chunks at 1,4,7: [t1..t4][t4..t7][t7..t10]
    val docs = Seq(
      (0L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (1L, "a b"),            // shorter than window → ONE whole-doc chunk
      (2L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocs(docs, "doc_id", "text", window = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val d0 = out.filter(_._1 == 0L).sortBy(_._2)
    assert(d0.map(_._3).toSeq == Seq("w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    assert(d0.forall(_._4 == 4))
    // every token covered; consecutive chunks overlap by window - stride
    assert(d0.flatMap(_._3.split(" ")).toSet == (1 to 10).map(i => s"w$i").toSet)
    assert(out.filter(_._1 == 1L).toSeq == Seq((1L, 0, "a b", 2)))
    assert(!out.exists(_._1 == 2L), "null text emits no chunks")
  }

  test("dsir weights: target-like docs score positive, divergent negative, NULL flag scored but unmodeled") {
    import spark.implicits._
    // Bigram counts — target: (the,cat)=1 (cat,sat)=1; raw: (the,cat)=1
    // (cat,sat)=1 (the,sat)=1 (sat,cat)=1. nt=2 nr=4 v=4. Weight of a
    // shared bigram: ln(2/6)-ln(2/8)=ln(4/3); raw-only: ln(1/6)-ln(2/8)
    // =ln(2/3). Doc 3's NULL flag counts it in NEITHER model (nt/nr/v
    // unchanged) yet it is still scored; doc 4 has <2 tokens -> no row.
    val docs = Seq(
      (0L, "the cat sat", Some(true)),
      (1L, "the sat cat", Some(false)),
      (2L, "the cat sat", Some(false)),
      (3L, "the cat sat", None: Option[Boolean]),
      (4L, "x", Some(false))
    ).toDF("doc_id", "text", "tgt")
    val out = TextAnalysis.dsirWeights(docs, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def r6d(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(!out.contains(4L))
    assert(out(0L) == ((2L, r6d(math.log(4.0 / 3)))))
    assert(out(2L) == out(0L) && out(3L) == out(0L))
    assert(out(1L) == ((2L, r6d(math.log(2.0 / 3)))))
    assert(out(1L)._2 < 0 && out(0L)._2 > 0)
  }
}
