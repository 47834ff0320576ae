package graft

import org.apache.spark.sql.functions._

import graft.operators.MixtureSample

class MixtureSampleSpec extends SparkSpec {
  import spark.implicits._

  // 1000 common docs, 100 mid docs, 10 rare docs
  private lazy val docs = ((0 until 1000).map(i => (i.toLong, "common")) ++
    (1000 until 1100).map(i => (i.toLong, "mid")) ++
    (1100 until 1110).map(i => (i.toLong, "rare")))
    .toDF("doc_id", "source")

  test("temperature < 1 upweights rare sources: rate(rare) > rate(mid) > rate(common)") {
    val r = MixtureSample.mixtureSample(docs, "doc_id", "source",
      temperature = 0.7, frac = 0.5).collect()
    val rates = r.map(x => x.getString(1) -> x.getDouble(2)).toMap
    assert(rates("rare") > rates("mid") && rates("mid") > rates("common"))
    // τ→1 degenerates to uniform frac
    val uni = MixtureSample.mixtureSample(docs, "doc_id", "source",
      temperature = 1.0, frac = 0.5).collect()
      .map(x => x.getString(1) -> x.getDouble(2)).toMap
    assert(uni.values.forall(v => math.abs(v - 0.5) < 1e-6))
  }

  test("sample is deterministic and roughly budget-sized") {
    val a = MixtureSample.mixtureSample(docs, "doc_id", "source").collect()
      .map(x => x.getLong(0) -> x.getBoolean(3)).toMap
    val b = MixtureSample.mixtureSample(docs, "doc_id", "source").collect()
      .map(x => x.getLong(0) -> x.getBoolean(3)).toMap
    assert(a == b)
    val kept = a.values.count(identity)
    // hash coin flips: binomial around the 555-doc budget, loose ±20%
    assert(kept > 440 && kept < 670, s"kept $kept of 1110")
  }

  test("a source with rate 1.0 keeps every doc") {
    // tiny source vs frac large enough that min(1, ...) clips
    val d2 = ((0 until 400).map(i => (i.toLong, "big")) ++
      (400 until 402).map(i => (i.toLong, "tiny"))).toDF("doc_id", "source")
    val r = MixtureSample.mixtureSample(d2, "doc_id", "source",
      temperature = 0.5, frac = 0.9).collect()
    val tiny = r.filter(_.getString(1) == "tiny")
    assert(tiny.forall(_.getDouble(2) == 1.0) && tiny.forall(_.getBoolean(3)))
  }
}
