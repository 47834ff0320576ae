package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temperature-based dataset mixture sampling — the data-mixing step of
  * an LM pretraining pipeline (the τ-scaled source proportions of
  * multilingual/multi-corpus training sets; cf. the sampling-temperature
  * scheme popularized by multilingual LM work): source s with cᵢ docs
  * gets target share pₛ ∝ cₛ^τ (τ < 1 flattens the mix toward rare
  * sources), and a global budget of `frac`·N docs is drawn WITHOUT
  * replacement by deterministic content-free coin flips — keep doc iff
  * hash(id) < floor(rateₛ·2³²) with rateₛ = min(1, budget·pₛ/cₛ).
  *
  * Every decision is a pure projection against a broadcast source→
  * threshold map, so the pass is scan-speed and reproducible: the same
  * corpus always yields the same sample, adding a source only reshuffles
  * rates, not the coin flips. Per-source counts are one map-side-combined
  * aggregate (|sources| rows on the driver). The τ-power/normalize
  * arithmetic is replayed by the DuckDB oracle with the same operation
  * order (pow parity with the JVM is established by the
  * heuristics_goldens grid), rates rounded to 9dp before the integer
  * threshold so a last-ulp pow difference cannot flip a membership.
  */
object MixtureSample {

  def mixtureSample(docs: DataFrame, idCol: String, srcCol: String,
                    temperature: Double = 0.7,
                    frac: Double = 0.5): DataFrame = {
    val counts = docs.filter(col(srcCol).isNotNull)
      .groupBy(col(srcCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    require(counts.nonEmpty, "mixtureSample: empty corpus")
    val n = counts.map(_._2).sum
    val budget = math.ceil(n * frac)
    val powed = counts.map { case (s, c) => s -> math.pow(c.toDouble, temperature) }
    // fixed source-order fold — double addition order matches the
    // oracle's list_sum(list(p ORDER BY source))
    val tot = powed.map(_._2).foldLeft(0.0)(_ + _)
    val rate9 = powed.map { case (s, p) =>
      val c = counts.find(_._1 == s).get._2
      s -> BigDecimal(math.min(1.0, budget * (p / tot) / c))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val thr = rate9.map { case (s, r) => s -> math.floor(r * 4294967296.0).toLong }
    val u = conv(substring(md5(concat(lit("mix-"), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("long")
    // a null source has no rate — dropped, matching the oracle's inner
    // join on source (a real pipeline routes unattributed docs upstream)
    docs.filter(col(srcCol).isNotNull)
      .select(col(idCol), col(srcCol),
        round(element_at(typedLit(rate9), col(srcCol)), 6).as("rate"),
        (u < element_at(typedLit(thr), col(srcCol))).as("kept"))
  }
}
