package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar pipelines for LLM training-data curation:
  * language-ID (stopword n-gram heuristic), quality scoring, BPE-ish
  * tokenization, rolling char-shingle fingerprinting. All pure per-row
  * projections (no UDFs, no shuffles) so they run at scan speed and are
  * reproducible in ANSI SQL for the oracle.
  */
object TextAnalysis {

  /** Stopword profiles per language, alphabetical by code — the n-gram
    * heuristic's model. Tiny by design; swap in real profiles at will.
    */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "nicht", "ein"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it"),
    "es" -> Seq("el", "los", "las", "y", "es", "que", "un", "una"),
    "fr" -> Seq("le", "les", "et", "est", "que", "une", "dans", "pour"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有"))

  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Fraction of tokens found in `words` (a language's stopword profile). */
  def stopwordRatio(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")

  /** Predicted language: argmax of per-language stopword ratio; ties go to
    * the alphabetically-first language; all-zero scores → "und".
    */
  def langId(toks: Column): (Column, Column) = {
    val scores = StopwordProfiles.map { case (lang, words) =>
      lang -> stopwordRatio(toks, words)
    }
    val best = greatest(scores.map(_._2): _*)
    // nested when(): first match wins → ties resolve to the alphabetically
    // first language; zero everywhere → "und"
    val pred = scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(best > 0 && s === best, lit(lang)).otherwise(els)
    }
    (pred, best)
  }

  /** Heuristic quality score in [0,1]: stopword coverage + length prior −
    * punctuation penalty. Plain linear arithmetic (identical fp result in
    * any engine; no transcendental functions).
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val stopRatio = stopwordRatio(toks, StopwordProfiles.toMap.apply("en"))
    val lowered = lower(text)
    val punct = (length(lowered) -
      length(regexp_replace(lowered, "[^a-z0-9\\s]", ""))).cast("double") /
      greatest(length(lowered), lit(1)).cast("double")
    val lenPrior = least(nTok / lit(100.0), lit(1.0))
    lit(0.4) * least(stopRatio * 4.0, lit(1.0)) + lit(0.4) * lenPrior +
      lit(0.2) * (lit(1.0) - punct)
  }

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * marks each count as one token (the pre-merge vocabulary shape).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(trim(lower(text)), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Rolling char-shingle fingerprint: lexicographic-min md5 over all
    * k-char windows — winnowing's "min hash in window" reduced to one
    * global min per doc. Short docs fall back to hashing the whole text.
    */
  def charShingleMin(text: Column, k: Int = 8): Column = {
    val t = trim(lower(text))
    when(length(t) >= k,
      array_min(transform(sequence(lit(1), length(t) - (k - 1)), i =>
        md5(t.substr(i, lit(k))))))
      .otherwise(md5(t))
  }
}
