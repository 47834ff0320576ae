package graft

import org.apache.spark.sql.functions._

import graft.operators.{EmbeddingLSH, MinHashLSH, Multimodal, SimHash, TextAnalysis}

/** Behavioral invariants of the LLM-pipeline near-dup / analysis
  * operators (their cross-engine value parity is covered by the DuckDB
  * oracle rows; this pins the semantics).
  */
class NearDupSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (3L, "completely different words appear here today friends"),
    (4L, "short")
  ).toDF("doc_id", "text")

  test("minhash LSH: exact dup always pairs; jaccard(identical) = 1") {
    val pairs = MinHashLSH.candidatePairs(
      MinHashLSH.bands(docs, "doc_id", "text"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L)), s"exact dup must collide in every band: $pairs")
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(3L) },
      "unrelated doc must not pair")

    val sets = docs.select(col("doc_id"),
      MinHashLSH.shingleSet(col("text")).as("s"))
    val j = sets.as("a").join(sets.as("b"),
        col("a.doc_id") === 0 && col("b.doc_id") === 2)
      .select(MinHashLSH.jaccard(col("a.s"), col("b.s"))).head().getDouble(0)
    assert(j == 1.0)
  }

  test("simhash: identical text -> identical fingerprint, hamming 0; near-dup close") {
    val fp = docs.select(col("doc_id"), SimHash.fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(2L))
    assert(fp.values.forall(f => f >= 0 && f < (1L << 32)))
    val ham01 = docs.sparkSession.range(1).select(
      SimHash.hamming(lit(fp(0L)), lit(fp(1L)))).head().getLong(0)
    val ham03 = docs.sparkSession.range(1).select(
      SimHash.hamming(lit(fp(0L)), lit(fp(3L)))).head().getLong(0)
    assert(ham01 < ham03, s"near-dup hamming $ham01 must beat unrelated $ham03")
  }

  test("embedding LSH: identical vectors share a bucket and score cosine 1") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.5f, -0.25f, 2.0f)),
      (1L, Seq(1.0f, 0.5f, -0.25f, 2.0f)),
      (2L, Seq(-1.0f, 3.0f, 0.25f, -2.0f))
    ).toDF("vec_id", "embedding")
    val pairs = EmbeddingLSH.nearDupPairs(vecs, "vec_id", "embedding",
      numPlanes = 6, dim = 4, tau = 0.9).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 0L && pairs.head.getLong(1) == 1L)
    assert(math.abs(pairs.head.getDouble(2) - 1.0) < 1e-9)
  }

  test("text analysis: langId picks profile language; quality in [0,1]") {
    val d = Seq(
      (0L, "the cat is a friend of the dog and it is fine"),
      (1L, "der hund ist nicht das problem und die katze"),
      (2L, "xyz qqq zzz www")
    ).toDF("doc_id", "text")
    val (pred, _) = TextAnalysis.langId(TextAnalysis.tokens(col("text")))
    val preds = d.select(col("doc_id"), pred.as("p")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(0L) == "en" && preds(1L) == "de" && preds(2L) == "und")

    val q = d.select(TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(_.getDouble(0))
    assert(q.forall(x => x >= 0.0 && x <= 1.0))
  }

  test("multimodal stub decode: deterministic, byte-length preserved") {
    val out = Multimodal.mediaMeta(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(0L) == out(2L), "same payload -> same decoded metadata")
    assert(out(4L)._4 == "short".getBytes("UTF-8").length.toLong)
    assert(out.values.forall { case (w, h, f, _) =>
      w >= 16 && w <= 1024 && h >= 16 && h <= 1024 && f >= 1 && f <= 32 })
    // determinism across evaluation
    val again = Multimodal.mediaMeta(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == again)
  }
}
