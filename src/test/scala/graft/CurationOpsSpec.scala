package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Behavioral invariants of the round-11 curation operators (pii_redact,
  * tfidf_topk, dup_spans) — cross-engine value parity is covered by their
  * DuckDB oracle rows; this pins the semantics on constructed corpora.
  */
class CurationOpsSpec extends SparkSpec {

  import spark.implicits._

  test("piiRedact: counts are pre-redaction, placeholders replace every match") {
    val docs = Seq(
      (0L, "mail a@b.co and c.d+x@e-f.org ip 10.0.0.1 ssn 123-45-6789"),
      (1L, "no pii here at all"),
      (2L, "ssn 999-88-7777 twice 111-22-3333 and ip 255.255.255.255")
    ).toDF("doc_id", "text")
    val (red, ne, ns, ni) = TextAnalysis.piiRedact(col("text"))
    val out = docs.select(col("doc_id"), ne.as("e"), ns.as("s"), ni.as("i"),
      red.as("r")).orderBy("doc_id").collect()
    assert(out(0).getInt(1) == 2 && out(0).getInt(2) == 1 && out(0).getInt(3) == 1)
    assert(out(0).getString(4) ==
      "mail <EMAIL> and <EMAIL> ip <IP> ssn <SSN>")
    assert(out(1).getInt(1) == 0 && out(1).getInt(2) == 0 && out(1).getInt(3) == 0)
    assert(out(1).getString(4) == "no pii here at all")
    assert(out(2).getInt(2) == 2 && out(2).getInt(3) == 1)
    // redacted text holds no residual matches of any class
    assert(!out.exists(r => r.getString(4).matches(
      s".*(${TextAnalysis.PiiEmailPattern}|${TextAnalysis.PiiSsnPattern}|${TextAnalysis.PiiIpv4Pattern}).*")))
  }

  test("tfIdfTopK: corpus-wide terms get zero-ish idf, unique terms rank first") {
    // 'shared' appears in every doc → idf ln(4/4)=0 → tfidf 0;
    // each doc's unique term must outrank it
    val docs = Seq(
      (0L, "shared unique0 unique0"),
      (1L, "shared unique1"),
      (2L, "shared unique2")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdfTopK(docs, "doc_id", "text", k = 1)
      .orderBy("doc_id").collect()
    assert(top.map(_.getString(2)).toSeq == Seq("unique0", "unique1", "unique2"))
    // rank-1 score strictly positive, and doc 0's doubled tf doubles the score
    val s0 = top(0).getDouble(3); val s1 = top(1).getDouble(3)
    assert(s0 > 0 && math.abs(s0 - 2 * s1) < 1e-9)
  }

  test("dupSpans: repeated span flags both docs, unique docs stay zero") {
    val span = "a b c d e f g h" // exactly w=8 tokens
    val docs = Seq(
      (0L, s"$span tail0 tail1 tail2"),
      (1L, s"head0 head1 $span"),
      (2L, "w x y z only five tokens here"), // < 8 tokens → whole-doc span
      (3L, "w x y z only five tokens here")  // exact dup of 2
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dupSpans(docs, "doc_id", "text", w = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // docs 0 and 1 share exactly the one 8-token span
    assert(out(0)._3 == 1L && out(1)._3 == 1L)
    assert(out(0)._2 == 4 && out(1)._2 == 3) // 11 tokens → 4 spans; 10 → 3
    // short exact-dup docs share their whole-doc fallback span
    assert(out(2) == (2L, 1, 1L, 1.0) && out(3) == (3L, 1, 1L, 1.0))
  }
}
