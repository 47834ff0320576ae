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

  /** Vocabulary ceiling for [[unigramLogProb]]'s driver-materialized
    * dictionary: 20M types ≈ 1-2 GB driver heap — far beyond any natural
    * language's Zipf vocabulary, low enough to fail loud before an OOM.
    */
  val MaxUnigramVocab: Long = 20L * 1000 * 1000

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

  /** Benchmark decontamination — the n-gram-overlap check a training
    * pipeline runs against held-out eval sets: count, per corpus doc, how
    * many of its distinct word `w`-grams appear in the benchmark's gram
    * set. The benchmark side is eval-set-sized (tiny vs the corpus) so it
    * broadcasts; the corpus explodes once and hash-joins against the
    * broadcast — the 100 TB side is never shuffled except the final
    * per-doc count (map-side partial). Gram extraction reuses the MinHash
    * shingle kernel (SQL-exact trim/split semantics).
    */
  def contaminationCounts(docs: org.apache.spark.sql.DataFrame,
                          benchmark: org.apache.spark.sql.DataFrame,
                          idCol: String, textCol: String,
                          w: Int = 5): org.apache.spark.sql.DataFrame = {
    val benchGrams = benchmark
      .select(explode(MinHashLSH.shingleSet(col(textCol), w)).as("gram")).distinct()
    val corpusGrams = docs
      .select(col(idCol), explode(MinHashLSH.shingleSet(col(textCol), w)).as("gram"))
    val hits = corpusGrams.join(broadcast(benchGrams), Seq("gram"))
      .groupBy(idCol).agg(count(lit(1)).as("hits"))
    docs.select(col(idCol)).join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("hits"), lit(0L)).as("contaminated"))
  }

  /** PII patterns for [[piiRedact]] — the scrub a training pipeline runs
    * before corpus release. Deliberately restricted to regex features with
    * identical semantics in Java (`java.util.regex`, Spark's engine) and
    * RE2 (DuckDB's): character classes, bounded/unbounded greedy
    * quantifiers, `\b` ASCII word boundaries. No backrefs, no lookaround
    * (RE2 has neither).
    */
  val PiiEmailPattern = "[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}"
  val PiiIpv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PiiSsnPattern = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** PII detection + redaction: counts each PII class on the raw text,
    * then replaces matches with typed placeholders. Order matters and is
    * part of the contract — emails first (an email can embed digit runs),
    * then SSNs (dash-digit shape is more specific than a bare IP octet
    * run), then IPv4 — each count is measured on the ORIGINAL text so the
    * classes don't steal each other's matches. Pure per-row regex
    * projections (codegen'd `RegExpReplace`/`RegExpExtractAll`): runs at
    * scan speed, embarrassingly parallel at any corpus size.
    * Returns (redacted, n_email, n_ssn, n_ip).
    */
  def piiRedact(text: Column): (Column, Column, Column, Column) = {
    val nEmail = size(regexp_extract_all(text, lit(PiiEmailPattern), lit(0)))
    val nSsn = size(regexp_extract_all(text, lit(PiiSsnPattern), lit(0)))
    val nIp = size(regexp_extract_all(text, lit(PiiIpv4Pattern), lit(0)))
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(text, PiiEmailPattern, "<EMAIL>"),
          PiiSsnPattern, "<SSN>"),
        PiiIpv4Pattern, "<IP>")
    (redacted, nEmail, nSsn, nIp)
  }

  /** Per-document top-k keywords by TF-IDF — the salience extraction a
    * curation pipeline uses for topic filtering / cluster labeling.
    * tf = term count within the doc; idf = ln((N+1)/(df+1)) with df =
    * docs containing the term; top-k per doc by (tf·idf desc, term asc).
    *
    * Scale shape (the 100 TB reading): one explode feeding TWO partial
    * aggregations — (doc, term) counts and per-term doc frequencies —
    * both map-side combined before their key-partitioned shuffles; the
    * df side is vocab-sized (Zipf-bounded, [[MaxUnigramVocab]]-class) so
    * its join back is a shuffle of corpus-grams × small map side; the
    * final per-doc top-k is a WindowGroupLimit (rank ≤ k pushed into the
    * sort) — no all-pairs stage, no driver materialization.
    */
  def tfIdfTopK(docs: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, k: Int = 3): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = docs.count()
    val terms = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df as a per-term window count over tf (one row per (doc, term), so
    // the partition count IS the document frequency — same integer the
    // old groupBy("term") rollup produced). Single-reference lineage:
    // no persist (r18's leaked for the session's lifetime — ADVICE r18),
    // no df-side join, and the corpus explode+aggregate runs exactly once
    // even on a cold first execution (the mode the driver times).
    val scored = tf
      .withColumn("df", count(lit(1)).over(
        Window.partitionBy(col("term"))))
      .withColumn("tfidf",
        col("tf").cast("double") *
          log(lit(n + 1.0) / (col("df").cast("double") + lit(1.0))))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("tfidf").desc, col("term").asc)))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"),
        round(col("tfidf"), 6).as("tfidf"))
  }

  /** Span-level exact dedup signal — the substring-dedup mode document-
    * and near-dup passes miss: a doc that is globally unique can still be
    * stitched from boilerplate spans that repeat across the corpus
    * (license headers, templates, quoted chains). Marks each doc with how
    * many of its distinct `w`-token spans appear in 2+ DISTINCT docs,
    * plus the fraction. (Within-doc repeats are collapsed before counting
    * — `shingleSet` is per-doc distinct, matching the SQL oracle's
    * `list_distinct` — so a span occurring twice in only one doc is NOT
    * flagged; the signal is cross-doc boilerplate, not self-repetition,
    * which `repetition_score` covers.)
    *
    * Scale shape: one explode of per-doc distinct spans (reuses the
    * MinHash shingle kernel → SQL-exact tokenization), a map-side-
    * combined count per span, and a key-partitioned join back on the
    * span — corpus-gram-sized shuffles, never all-pairs, no driver
    * materialization. The count>1 filter makes the join's right side the
    * repeated-span set only (boilerplate-sized, far smaller than the
    * corpus gram set).
    */
  def dupSpans(docs: org.apache.spark.sql.DataFrame, idCol: String,
               textCol: String, w: Int = 8): org.apache.spark.sql.DataFrame = {
    val grams = docs.select(col(idCol),
      explode(MinHashLSH.shingleSet(col(textCol), w)).as("gram"))
    val shared = grams.groupBy("gram")
      .agg(count(lit(1)).as("nd")).filter(col("nd") > 1).select("gram")
    val hits = grams.join(shared, "gram")
      .groupBy(idCol).agg(count(lit(1)).as("dup_spans"))
    docs.select(col(idCol),
        size(MinHashLSH.shingleSet(col(textCol), w)).as("n_spans"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_spans"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        round(coalesce(col("dup_spans"), lit(0L)).cast("double") /
          greatest(col("n_spans"), lit(1)).cast("double"), 6).as("dup_frac"))
  }

  /** One-pass scoring kernel: quality + language-ID from a SINGLE
    * tokenization. The column formulation above re-evaluates
    * `split(trim(lower(text)))` once per derived ratio after
    * CollapseProject inlining (≈12 splits/row: 5 language ratios + the
    * quality terms), which measured 2 ms/doc at the 10M-doc scale run —
    * the kernel is one tokenize + one scan (same trade as
    * MinHashLSH.bandKeys). Arithmetic mirrors the column/SQL versions
    * EXACTLY (same operand order, same `\s`/trim semantics via the
    * MinHash tokenizer, same [^a-z0-9\s] punctuation class), so the
    * DuckDB oracle rows stay hash-identical — asserted by the
    * differential property spec against the column formulation.
    */
  final case class DocScores(quality: Double, lang: String, lang_score: Double)

  private val WsPattern = java.util.regex.Pattern.compile("\\s+")
  private val StopwordSets: Seq[(String, Set[String])] =
    StopwordProfiles.map { case (l, ws) => (l, ws.toSet) }
  private val EnStopwords: Set[String] = StopwordSets.toMap.apply("en")

  private def isQualityChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def scoreDoc(text: String): DocScores = {
    val lowered = text.toLowerCase(java.util.Locale.ROOT)
    val toks = WsPattern.split(MinHashLSH.sqlTrim(lowered), -1)
    val n = toks.length
    val nD = math.max(n, 1).toDouble
    var en = 0
    val perLang = new Array[Int](StopwordSets.length)
    var i = 0
    while (i < n) {
      val t = toks(i)
      var l = 0
      while (l < StopwordSets.length) {
        if (StopwordSets(l)._2.contains(t)) perLang(l) += 1
        l += 1
      }
      if (EnStopwords.contains(t)) en += 1
      i += 1
    }
    var punct = 0
    var j = 0
    while (j < lowered.length) {
      if (!isQualityChar(lowered.charAt(j))) punct += 1
      j += 1
    }
    val stopRatio = en.toDouble / nD
    val lenPrior = math.min(n.toDouble / 100.0, 1.0)
    val punctFrac = punct.toDouble / math.max(lowered.length, 1).toDouble
    val quality = 0.4 * math.min(stopRatio * 4.0, 1.0) + 0.4 * lenPrior +
      0.2 * (1.0 - punctFrac)
    var best = 0.0
    var l = 0
    while (l < perLang.length) {
      val r = perLang(l).toDouble / nD
      if (r > best) best = r
      l += 1
    }
    // first language (alphabetical profile order) hitting the max wins —
    // same tie rule as the nested when() chain in langId
    var lang = "und"
    if (best > 0) {
      var k = 0
      var found = false
      while (k < perLang.length && !found) {
        if (perLang(k).toDouble / nD == best) { lang = StopwordSets(k)._1; found = true }
        k += 1
      }
    }
    DocScores(quality, lang, best)
  }

  /** [[scoreDoc]] as a column: struct (quality, lang, lang_score); null
    * text → null struct.
    */
  def docScores(text: Column): Column = {
    val f = udf { (t: String) => if (t == null) null else scoreDoc(t) }
    f(text)
  }

  /** Corpus-level boilerplate detection: word `w`-grams ranked by DOCUMENT
    * frequency (each doc contributes its distinct grams once). Grams that
    * recur across ≥ `minDf` documents are header/footer/template
    * candidates a curation pipeline strips before training. One explode +
    * one map-side-combining groupBy — the gram table after the partial
    * aggregate is vocabulary-sized, not corpus-sized, so the single
    * shuffle stays small at any corpus scale. Gram extraction reuses the
    * MinHash shingle kernel (SQL-exact trim/split semantics).
    */
  def boilerplateGrams(df: org.apache.spark.sql.DataFrame, textCol: String,
                       w: Int = 5, minDf: Int = 2): org.apache.spark.sql.DataFrame =
    df.select(explode(MinHashLSH.shingleSet(col(textCol), w)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)

  /** Deterministic content-addressed train/validation/test assignment:
    * bucket = first 32 md5 bits of the text mod 100 → 90/5/5 split.
    * Content-addressed on purpose — exact duplicates always land in the
    * SAME split (id-keyed splits leak dup pairs across train/test), and
    * the assignment is stable across runs, partitionings and engines.
    */
  def datasetSplit(text: Column): (Column, Column) = {
    val bucket = conv(substring(md5(text), 1, 8), 16, 10).cast("long") % 100
    // null text → null bucket → null split (not "test": both when()
    // branches are null on null input, so a bare otherwise would fire)
    val split = when(bucket.isNotNull,
      when(bucket < 90, "train").when(bucket < 95, "validation").otherwise("test"))
    (bucket, split)
  }

  /** Repetition scores (the Gopher-rule family, arXiv:2112.11446 §A1.1,
    * adapted to single-line docs): `dup_word_frac` = fraction of tokens
    * that are repeats of an earlier token; `top_bigram_frac` = fraction
    * of all word-bigrams taken by the single most frequent bigram. High
    * values flag boilerplate/spam for pipeline filtering. One explode +
    * two grouped aggregations — no self-joins.
    */
  def repetitionScores(df: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String): org.apache.spark.sql.DataFrame = {
    val base = df.select(col(idCol), tokens(col(textCol)).as("w"))
    val dup = base.select(col(idCol),
      round(lit(1.0) - size(array_distinct(col("w"))).cast("double") /
        greatest(size(col("w")), lit(1)), 6).as("dup_word_frac"))
    val bigrams = base
      .filter(size(col("w")) >= 2)
      .select(col(idCol), explode(transform(sequence(lit(1), size(col("w")) - 1),
        i => concat(element_at(col("w"), i), lit(" "),
          element_at(col("w"), i + 1)))).as("g"))
    val top = bigrams.groupBy(idCol, "g").count()
      .groupBy(idCol).agg(max("count").as("mx"), sum("count").as("tot"))
    dup.join(top, Seq(idCol), "left")
      .select(col(idCol), col("dup_word_frac"),
        round(coalesce(col("mx").cast("double") / col("tot"), lit(0.0)), 6)
          .as("top_bigram_frac"))
  }

  /** Corpus-statistical quality score: mean unigram log-probability of a
    * document under the corpus's OWN unigram language model — the
    * perplexity-proxy filter a curation pipeline runs to drop
    * out-of-distribution/garbage documents. Two stages, both
    * Spark-shaped for 100 TB:
    *
    *  1. dictionary build: ONE explode + groupBy over all tokens (the
    *     token frequency table; Zipf keeps it tiny relative to the
    *     corpus) and one scalar aggregate for the total count
    *  2. scoring: tokens join the broadcast dictionary and average
    *     `ln(cnt/total)` per document — a broadcast hash join at scan
    *     speed, no corpus-sized shuffle
    *
    * Output: (id, n_toks, round(mean log p, 6)). The fold order of the
    * average differs across engines only at ~1e-15 — the 6dp rounding
    * absorbs it (same contract as every other averaged metric here).
    */
  def unigramLogProb(df: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    // The dictionary is consumed twice (total count + scoring join), and
    // the scoring join BROADCASTS it — i.e. it must fit on the driver
    // regardless. So materialize it there once: one corpus-wide
    // explode+aggregate, total summed locally, and the scoring side
    // joins a rebuilt local frame. No persist → nothing cached for the
    // life of the session (the old persisted frame could never be
    // unpersisted safely because the returned lazy plan referenced it).
    val freqRows = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    // Guard while collecting: natural-language vocabularies are Zipf
    // (≲ millions of types at any corpus size), but an adversarial corpus
    // of random strings grows the dictionary with the corpus — collecting
    // that OOMs the driver. ONE action does both: collect at most
    // MaxUnigramVocab+1 rows (the limit bounds what can ever reach the
    // driver) and fail loud with the remedy if the extra row came back —
    // no persist/count pre-pass, so the corpus is aggregated exactly once.
    val dictRows = freqRows.limit(MaxUnigramVocab.toInt + 1).collect()
    require(dictRows.length <= MaxUnigramVocab,
      s"unigramLogProb: vocabulary exceeds $MaxUnigramVocab types. " +
        "The dictionary must be broadcast-small; pre-filter tokens (min " +
        "frequency, length caps) or score against a fixed dictionary.")
    val total = dictRows.iterator.map(_.getLong(1)).sum.max(1L)
    val dict = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(dictRows: _*), freqRows.schema)
    toks.join(broadcast(dict), Seq("tok"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"),
        round(avg(log(col("cnt").cast("double") / total)), 6).as("logprob"))
  }

  /** Bigram corpus-LM scoring — the step past [[unigramLogProb]] toward
    * real perplexity filtering: each document's mean log P(w₂|w₁) under
    * the corpus's own bigram model (P = pair count / prefix count, no
    * smoothing needed because every scored bigram is by construction in
    * the model). Low scores mark text whose WORD ORDER is improbable
    * even when its vocabulary is fine — shuffled/garbled text that
    * unigram scoring cannot see.
    *
    * Scale shape — fully distributed, and unlike the unigram pass there
    * is NO driver-side dictionary at all: bigram extraction is a
    * shuffle-free slice-zip projection (no self-join, no per-doc
    * window); pair and prefix counts are two map-side-combined
    * aggregates; scoring is two key-partitioned joins of corpus-gram ×
    * gram-vocab frames. Everything is ∝ corpus grams, nothing is
    * all-pairs, nothing lands on the driver.
    */
  def bigramLogProb(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String): org.apache.spark.sql.DataFrame =
    // Convenience form: extraction inline. The corpus-gram subtree is
    // referenced once per plan use below — callers that score repeatedly
    // or fan several scorers off one corpus should persist the extraction
    // themselves and use [[bigramLogProbFromBigrams]] (the r18 in-operator
    // persist leaked for the session's lifetime — ADVICE r18 — so
    // persistence now belongs to the caller, the crossCorpusDups pattern).
    bigramLogProbFromBigrams(
      bigramsWithTarget(docs, idCol, textCol, lit(false))
        .drop("tgt"), idCol)

  /** [[bigramLogProb]] over a pre-extracted (idCol, w1, w2) corpus-bigram
    * frame (extra columns ride along ignored). Holds no persist of its
    * own: pass a persisted artifact when the extraction is expensive —
    * the model aggregation and the scoring join each reference it.
    */
  def bigramLogProbFromBigrams(bg: org.apache.spark.sql.DataFrame,
                               idCol: String): org.apache.spark.sql.DataFrame = {
    // pair is referenced by the prefix rollup AND the scoring join —
    // one GC-scoped materialization (see dsirWeightsFromBigrams note)
    val pair = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cp"))
      .localCheckpoint(true)
    val pref = pair.groupBy("w1").agg(sum("cp").as("c1"))
    bg.join(pair, Seq("w1", "w2")).join(pref, Seq("w1"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(col("cp").cast("double") / col("c1"))), 6).as("logprob"))
  }

  /** DSIR-style importance weighting (Xie et al., 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how much more probable its bigrams are under a TARGET
    * subcorpus's bigram model than under the RAW remainder's — the
    * data-selection signal used to resample a web-scale raw corpus
    * toward a high-quality target distribution (select by logweight
    * desc, or compose with [[graft.operators.MixtureSample]] for
    * per-source rates). `isTarget` marks the target docs (a NULL
    * evaluation counts the doc in neither model, but it still gets
    * scored). Add-1 smoothing over the joint bigram vocabulary keeps
    * every weight finite; both models come from ONE conditional
    * aggregate over the corpus bigrams.
    *
    * This is the exact-feature form (bigram identity as the feature
    * key) — DSIR's hashed buckets exist only to bound model size, and
    * exact features are the more faithful small-corpus signal; the
    * production 100-TB form is [[dsirWeightsHashed]] (same extraction,
    * md5-bucketed features, broadcast model).
    *
    * Scale shape: identical to [[bigramLogProb]] — shuffle-free
    * slice-zip bigram extraction, one map-side-combined conditional agg
    * for both models, key-partitioned join back, and exactly three
    * scalars (the two totals and the vocab size) ever touch the driver.
    */
  def dsirWeights(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String,
                  isTarget: org.apache.spark.sql.Column)
      : org.apache.spark.sql.DataFrame =
    dsirWeightsFromBigrams(bigramsWithTarget(docs, idCol, textCol, isTarget),
      idCol)

  /** [[dsirWeights]] over a pre-extracted (idCol, tgt, w1, w2) frame —
    * no in-operator persist (caller owns the artifact's lifecycle, the
    * crossCorpusDups pattern): the totals action and the scoring join
    * each re-reference the frame, so pass a persisted one when the
    * extraction is the dominant cost.
    */
  def dsirWeightsFromBigrams(bg: org.apache.spark.sql.DataFrame,
                             idCol: String): org.apache.spark.sql.DataFrame = {
    // model is referenced by the totals action AND the scoring join —
    // localCheckpoint materializes the vocab-sized (Zipf-bounded) frame
    // once with a GC-scoped lifetime (no persist: the returned lazy
    // plan would pin it for the session, ADVICE r18)
    val model = bg.groupBy("w1", "w2").agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("tgt"), 1L).otherwise(0L)).as("cr"))
      .localCheckpoint(true)
    val tot = model.agg(sum("ct"), sum("cr"), count(lit(1))).head()
    val nt = tot.getLong(0); val nr = tot.getLong(1); val v = tot.getLong(2)
    bg.join(model, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(
          log((col("ct") + lit(1L)).cast("double") / lit((nt + v).toDouble)) -
            log((col("cr") + lit(1L)).cast("double") / lit((nr + v).toDouble))),
          6).as("logweight"))
  }

  /** The hashed-feature DSIR form — the 100-TB variant [[dsirWeights]]
    * promises: bigram identity collapses to
    * `md5(w1 ' ' w2)[0,15) mod nBuckets` (the same 60-bit md5 parse the
    * MinHash kernel already proves portable to the oracle), so the model
    * is AT MOST nBuckets rows — BROADCAST to the scoring join instead of
    * shuffling the corpus bigrams by key. Exactly DSIR's own design: the
    * paper hashes n-grams into 10k buckets precisely so the importance
    * model stays driver/broadcast sized at web scale. Smoothing is add-1
    * over the FIXED bucket space (denominator nt + nBuckets), so absent
    * buckets are well-defined without materializing them.
    *
    * Bench note: at small SF this form measures SLOWER than the exact
    * one (the md5 per bigram costs more than shuffling a tiny vocab);
    * the crossover is where the exact form's vocab-keyed corpus shuffle
    * stops fitting comfortably — the hashed form's shuffle volume is
    * zero regardless of corpus size, which is the 100-TB property the
    * variant exists for (and the BroadcastHashJoin plan spec pins).
    */
  def dsirWeightsHashed(docs: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String,
                        isTarget: org.apache.spark.sql.Column,
                        nBuckets: Int = 4096)
      : org.apache.spark.sql.DataFrame =
    dsirWeightsHashedFromBigrams(
      bigramsWithTarget(docs, idCol, textCol, isTarget), idCol, nBuckets)

  /** [[dsirWeightsHashed]] over a pre-extracted (idCol, tgt, w1, w2)
    * frame. The md5-bucketed model is AT MOST nBuckets rows and is
    * broadcast to the scoring join regardless — so materialize it on the
    * driver with ONE action (the unigramLogProb pattern): the totals come
    * from the collected rows for free and nothing is persisted (the r18
    * in-operator persists leaked for the session's lifetime — ADVICE
    * r18). The bigram frame is referenced twice (model pass + scoring
    * pass); pass a persisted artifact when extraction dominates.
    */
  def dsirWeightsHashedFromBigrams(bgRaw: org.apache.spark.sql.DataFrame,
                                   idCol: String, nBuckets: Int = 4096)
      : org.apache.spark.sql.DataFrame = {
    val bg = bgRaw
      .select(col(idCol), col("tgt"),
        (conv(substring(md5(concat(col("w1"), lit(" "), col("w2"))), 1, 15),
          16, 10).cast("long") % nBuckets).as("bucket"))
    val modelAgg = bg.groupBy("bucket").agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("tgt"), 1L).otherwise(0L)).as("cr"))
    val modelRows = modelAgg.collect() // ≤ nBuckets rows by construction
    val nt = modelRows.iterator.map(_.getLong(1)).sum
    val nr = modelRows.iterator.map(_.getLong(2)).sum
    val model = bgRaw.sparkSession.createDataFrame(
      java.util.Arrays.asList(modelRows: _*), modelAgg.schema)
    bg.join(broadcast(model), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(
          log((col("ct") + lit(1L)).cast("double") /
            lit((nt + nBuckets).toDouble)) -
            log((col("cr") + lit(1L)).cast("double") /
              lit((nr + nBuckets).toDouble))),
          6).as("logweight"))
  }

  /** Overlapping token-window document chunking — the upstream step that
    * produces a retrieval corpus from raw documents (the reference's own
    * published eval runs over "57,638 corpus CHUNKS" of FIQA docs,
    * README.md:12; this is how those rows come to exist). Each doc with
    * ≥1 token emits `max(1, ceil((n − window)/stride) + 1)` chunks; chunk
    * k covers tokens `[k·stride+1, k·stride+window]` (truncated at the
    * doc end), so consecutive chunks overlap by `window − stride` tokens
    * and every token lands in ≥1 chunk. Pure per-row kernel — zero
    * shuffles at any corpus size; feed the output straight into the
    * engine's add path or the BM25/embedding stages.
    */
  def chunkDocs(docs: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, window: Int = 64, stride: Int = 48)
      : org.apache.spark.sql.DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    val toks = filter(tokens(col(textCol)), x => x =!= "")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), toks.as("t"))
      .filter(size(col("t")) >= 1)
      .select(col(idCol), col("t"), explode(sequence(lit(0),
        greatest(lit(0),
          ceil((size(col("t")) - window).cast("double") / stride)
            .cast("int")))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("t"), col("chunk_idx") * stride + 1, lit(window)), " ")
          .as("chunk_text"),
        size(slice(col("t"), col("chunk_idx") * stride + 1, lit(window)))
          .as("chunk_toks"))
  }

  /** KMV (k-minimum-values) distinct-count sketch per group — the
    * classic mergeable cardinality sketch (Bar-Yossef et al. 2002) over
    * the corpus token vocabulary: hash every distinct token to the
    * 60-bit md5 base the MinHash kernel already proves portable, keep
    * the k smallest per group, and estimate |distinct| as
    * (k−1)·U / h_(k) (U = the hash universe). Relative error ~1/√k.
    * Unlike HLL/CMS binaries, every intermediate here is plain integer
    * arithmetic the DuckDB oracle replays bit-for-bit — estimate
    * INCLUDED.
    *
    * Scale shape: the explode feeds ONE distinct on (group, token) —
    * map-side combined, shuffle ∝ vocabulary (Zipf-bounded, the
    * [[MaxUnigramVocab]] class), never corpus rows; the per-group rank
    * window sorts each group's VOCABULARY hash set (≤ ~1e7 rows per
    * group at web scale — one task-local sort of longs), not its
    * documents. Groups don't co-reside: each sorts in its own task. The
    * sketches themselves are k longs per group — mergeable downstream
    * by taking the k smallest of a union, which is how a 100-TB
    * pipeline unions per-shard sketches without re-touching text.
    */
  def kmvDistinct(docs: org.apache.spark.sql.DataFrame, groupCol: String,
                  textCol: String, k: Int = 256)
      : org.apache.spark.sql.DataFrame =
    kmvDistinctFromTokens(distinctTokens(docs, groupCol, textCol), groupCol, k)

  /** The per-group DISTINCT token table — the one tokenize+explode pass
    * both the exact count and the sketch consume; callers that need both
    * persist this frame and fan out instead of tokenizing twice.
    */
  def distinctTokens(docs: org.apache.spark.sql.DataFrame, groupCol: String,
                     textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = filter(tokens(col(textCol)), x => x =!= "")
    docs.filter(col(textCol).isNotNull)
      .select(col(groupCol), explode(toks).as("tok"))
      .distinct()
  }

  /** One exchange for the whole k-min pipeline: hash-partition the
    * (group, h) rows by GROUP first, so the dedup aggregate (keys are a
    * superset of the partitioning — co-located already) and the per-group
    * rank window (same key) both run without further shuffles. One
    * Exchange instead of two (distinct's (group,h) + the window's group);
    * the h-set is identical — hash collisions collapse in the same
    * distinct, just laid out per group. Group skew bound is unchanged:
    * one task per group sorts that group's vocabulary either way.
    */
  private def kMinRanked(withH: org.apache.spark.sql.DataFrame,
                         groupCol: String): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("h"))
    withH.repartition(col(groupCol)).distinct()
      .withColumn("rk", row_number().over(w))
  }

  /** [[kmvDistinct]] over a pre-distinct (group, tok) frame. */
  def kmvDistinctFromTokens(dtoks: org.apache.spark.sql.DataFrame,
                            groupCol: String, k: Int = 256)
      : org.apache.spark.sql.DataFrame = {
    require(k >= 16, s"k=$k too small for a usable estimate")
    kMinRanked(dtoks
      .select(col(groupCol),
        (conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long") %
          graft.operators.MinHashLSH.P).as("h")), groupCol)
      .filter(col("rk") <= k)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("kmv_k"), max(col("h")).as("kth_min"),
        round(
          when(count(lit(1)) < k, count(lit(1)).cast("double"))
            .otherwise((lit(k - 1).cast("double") *
              graft.operators.MinHashLSH.P.toDouble) / max(col("h"))),
          2).as("kmv_estimate"))
  }

  /** The KMV sketches themselves: one row per group with its sorted
    * k-minimum hash list — the mergeable artifact ([[kmvDistinct]]
    * derives its estimate from exactly this). `collect_list` here is
    * bounded by k per group BY CONSTRUCTION (the rank filter runs
    * first), so the sketch table is |groups|·k longs at any corpus
    * size.
    */
  def kmvSketches(docs: org.apache.spark.sql.DataFrame, groupCol: String,
                  textCol: String, k: Int = 256)
      : org.apache.spark.sql.DataFrame =
    // ONE distinct on (group, h) instead of distinct-on-token THEN
    // distinct-on-hash: hashing per occurrence costs a few extra md5s,
    // but drops a whole exchange of (group, token-string) rows — the
    // surviving shuffle carries (group, long). The distinct (group, h)
    // set — and so the sketch — is identical: both token duplicates and
    // hash collisions collapse in the same final distinct.
    kmvSketchesFromH(docs.filter(col(textCol).isNotNull)
      .select(col(groupCol),
        explode(filter(tokens(col(textCol)), x => x =!= "")).as("tok"))
      .select(col(groupCol),
        (conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long") %
          graft.operators.MinHashLSH.P).as("h")), groupCol, k)

  /** [[kmvSketches]] over a pre-distinct (group, tok) frame — the same
    * shared artifact [[kmvDistinctFromTokens]] consumes; the per-token
    * md5 runs once per distinct token instead of once per occurrence.
    */
  def kmvSketchesFromTokens(dtoks: org.apache.spark.sql.DataFrame,
                            groupCol: String, k: Int = 256)
      : org.apache.spark.sql.DataFrame =
    kmvSketchesFromH(dtoks.select(col(groupCol),
      (conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long") %
        graft.operators.MinHashLSH.P).as("h")), groupCol, k)

  private def kmvSketchesFromH(withH: org.apache.spark.sql.DataFrame,
                               groupCol: String, k: Int)
      : org.apache.spark.sql.DataFrame =
    kMinRanked(withH, groupCol)
      .filter(col("rk") <= k)
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(col("h"))).as("kmins"))

  /** Pairwise set-overlap estimation from the SKETCHES ALONE — the
    * operation KMV's mergeability exists for: the union sketch of two
    * groups is the k smallest of their combined k-min lists, and with
    * τ = that union's k-th value, J ≈ |{h ∈ A∩B : h ≤ τ}| / k and
    * |A∪B| ≈ (k−1)·U/τ (Beyer et al. 2007). Nothing here touches text
    * or vocabulary: the input is |groups|·k longs, so at 100 TB the
    * pairwise pass costs |groups|² tiny array ops — the whole point of
    * sketching per shard and combining later. Groups whose sketch holds
    * fewer than k values (small vocabularies) are exact: τ covers both
    * sets entirely and J is the true Jaccard of the hash sets.
    */
  def kmvOverlap(sketches: org.apache.spark.sql.DataFrame, groupCol: String,
                 k: Int = 256): org.apache.spark.sql.DataFrame = {
    val a = sketches.select(col(groupCol).as("group_a"), col("kmins").as("ka"))
    val b = sketches.select(col(groupCol).as("group_b"), col("kmins").as("kb"))
    val pairs = a.crossJoin(b).filter(col("group_a") < col("group_b"))
    val unionK = slice(array_sort(array_union(col("ka"), col("kb"))), 1, k)
    val tau = element_at(unionK, size(unionK))
    val interBelow = size(filter(array_intersect(col("ka"), col("kb")),
      h => h <= tau))
    pairs.select(col("group_a"), col("group_b"),
      size(unionK).cast("long").as("union_k"),
      round(interBelow.cast("double") /
        size(unionK).cast("double"), 6).as("jaccard_est"),
      round(when(size(unionK) < k, size(unionK).cast("double"))
        .otherwise(lit((k - 1).toDouble) *
          graft.operators.MinHashLSH.P.toDouble / tau), 2).as("union_est"))
  }

  /** Shared DSIR upstream: (id, tgt, w1, w2) corpus bigrams — the
    * shuffle-free slice-zip extraction; null text drops, <2-token docs
    * emit nothing, a NULL target flag keeps the doc scored but counted
    * in neither model.
    */
  def bigramsWithTarget(docs: org.apache.spark.sql.DataFrame,
                        idCol: String, textCol: String,
                        isTarget: org.apache.spark.sql.Column)
      : org.apache.spark.sql.DataFrame = {
    val toks = filter(tokens(col(textCol)), x => x =!= "")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), isTarget.as("tgt"), toks.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col(idCol), col("tgt"), explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(idCol), col("tgt"),
        col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** Okapi BM25 keyword retrieval (Robertson et al., TREC-3) — the lexical
    * half of hybrid search next to the engine's vector kNN. Scores every
    * document against a fixed bag of query terms with the standard
    * saturating-tf / length-normalized formula (k1 = 1.2, b = 0.75,
    * idf = ln(1 + (N − df + ½)/(df + ½)) — the Lucene-default variant
    * that never goes negative) and returns the top-k by (score desc, id).
    *
    * Cross-engine determinism: the per-term partial scores are rounded to
    * 9 dp and summed IN TERM ORDER via an ordered-list fold (not a
    * commutative agg), so the double addition order matches the SQL
    * oracle bit for bit; constants are written as the same decimal
    * literals on both sides (2.2, not k1 + 1, which is a different
    * double).
    *
    * Scale shape: the explode is filtered to the |Q| query terms before
    * any shuffle, so the tf side is corpus-hits-of-Q-sized, not
    * corpus-gram-sized; doc lengths are a shuffle-free per-row
    * projection; df is |Q| rows (broadcast); the final global top-k is a
    * sort-limit (TakeOrdered — no single-partition window). Corpus
    * constants (N, total tokens) come from one map-side-combined agg
    * action, not extra passes over the corpus.
    */
  def bm25TopK(docs: org.apache.spark.sql.DataFrame, idCol: String,
               textCol: String, queryTerms: Seq[String],
               k: Int = 10): org.apache.spark.sql.DataFrame = {
    // doc length as a shuffle-free projection (no explode+groupBy), and
    // both corpus constants (N, total tokens) from ONE tiny action.
    // Null text is ZERO-length, not size(null) = -1 (the legacy
    // sizeOfNull default): the oracle's unnest(NULL) contributes no
    // token rows, so a null-text doc must count in N but add nothing to
    // the token total on this side either (ADVICE r12).
    val dlCol = when(col(textCol).isNotNull,
      size(filter(tokens(col(textCol)), t => t =!= ""))
    ).otherwise(lit(0)).cast("long")
    val stats = docs.agg(count(lit(1)), sum(dlCol)).head()
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n
    val dl = docs.select(col(idCol), dlCol.as("dl"))
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "term").join(dl, idCol)
      .withColumn("s", round(
        log(lit(1.0) + (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          col("tf") * lit(2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl))), 9))
    // ordered fold, not sum(): double addition is order-sensitive in the
    // last bit and groupBy-sum order is nondeterministic — the oracle
    // folds list(s ORDER BY term) left-to-right, so match it exactly
    val perDoc = scored.groupBy(col(idCol))
      .agg(aggregate(
        sort_array(collect_list(struct(col("term"), col("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")).as("bm25"))
    perDoc.orderBy(col("bm25").desc, col(idCol)).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("bm25").desc, col(idCol))))
      .select(col(idCol), col("rank"), round(col("bm25"), 6).as("bm25"))
  }

  /** CCNet-style quality bucketing (Wenzek et al., 2020): rank documents
    * by corpus-LM score ([[unigramLogProb]] — higher = more fluent under
    * the corpus unigram model) and split into head / middle / tail
    * tertiles, the partition CCNet uses to keep head+middle for LM
    * training. Ordering is on the ROUNDED logprob with the id as
    * tiebreak, so cross-engine float noise cannot move a doc across a
    * bucket boundary.
    *
    * Scale shape: THIS form is the exact global ntile — a single final
    * sort of every (id, 2 numbers) row through one partition, kept as
    * the oracle-replayable reference form and for corpora where an exact
    * balanced split is required. The 100-TB production form is
    * [[ccnetBucketSampled]]: percentile cutoffs from a deterministic
    * sample (exactly CCNet's own approach, Wenzek et al. 2020 §4) and a
    * shuffle-free bucket projection — no global window anywhere.
    */
  def ccnetBucket(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String): org.apache.spark.sql.DataFrame =
    ccnetBucketFromScores(unigramLogProb(docs, idCol, textCol), idCol)

  /** [[ccnetBucket]] over an already-computed [[unigramLogProb]] frame —
    * lets a pipeline that also consumes the raw scores pay the corpus
    * pass once.
    */
  def ccnetBucketFromScores(lp: org.apache.spark.sql.DataFrame,
                            idCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    lp.withColumn("nt", ntile(3).over(
        Window.orderBy(col("logprob").desc, col(idCol))))
      .select(col(idCol), col("n_toks"), col("logprob"),
        when(col("nt") === 1, "head").when(col("nt") === 2, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** The 100-TB production form of [[ccnetBucketFromScores]]: tertile
    * CUTOFFS computed on a deterministic sample (CCNet itself computes
    * its percentile thresholds on a sample of the corpus, Wenzek et al.
    * 2020 §4), then a SHUFFLE-FREE bucket projection over every doc —
    * no global window, no single-partition sort anywhere in the plan
    * (PlanShapeSpec asserts this). The split is approximate at the two
    * boundaries: per-cutoff rank error ≈ √(p(1−p)(1−f)/m) for an m-row
    * sample covering fraction f of the corpus — measured 99.7% row
    * agreement with the exact ntile at sf0.1 with a 90% sample, and at
    * the 100-TB operating point a 4M-row sample (f≈1e-5) bounds the
    * expected disagreement under 0.05% of rows. Every
    * doc's bucket is a pure function of the corpus scores, reproducible
    * cross-engine: the sample membership is a modular hash of the id
    * (no RNG), and the cutoffs are composite (logprob, id) keys so ties
    * can't straddle a boundary.
    *
    * Driver contract: the collected sample is BOUNDED by
    * `maxSampleRows` and the call FAILS LOUDLY past it (same doctrine
    * as unigram's MaxUnigramVocab cap) — at 100 TB pick a
    * `samplePermille` such that corpus·permille/1000 stays
    * driver-sized; cutoff estimation error shrinks as 1/√sample, so
    * even 1e-6 of a 100-TB corpus is a tighter estimate than sf0.1's
    * 20%.
    */
  def ccnetBucketSampled(lp: org.apache.spark.sql.DataFrame, idCol: String,
                         samplePermille: Int = 200,
                         maxSampleRows: Int = 4 << 20)
      : org.apache.spark.sql.DataFrame = {
    require(samplePermille >= 1 && samplePermille <= 1000,
      s"samplePermille must be in [1, 1000], got $samplePermille")
    // Knuth-multiplier modular hash of the id — deterministic, replayable
    // verbatim in the SQL oracle (the % 100003 pre-fold keeps the product
    // far from Int64 overflow, which would throw under ANSI on both
    // engines rather than wrap consistently)
    val bucketHash =
      (col(idCol) % lit(100003L)) * lit(2654435761L) % lit(4294967296L)
    val sampled = lp
      .filter(bucketHash % lit(1000L) < lit(samplePermille.toLong))
      .select(col("logprob").cast("double"), col(idCol).cast("long"))
      .limit(maxSampleRows + 1).collect()
    require(sampled.length <= maxSampleRows,
      s"ccnetBucketSampled: sample exceeds maxSampleRows=$maxSampleRows — " +
        s"lower samplePermille (cutoff precision needs far fewer rows)")
    require(sampled.length >= 3,
      s"ccnetBucketSampled: sample of ${sampled.length} rows cannot place " +
        "tertile cutoffs — raise samplePermille")
    val s = sampled.map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy { case (lpv, id) => (-lpv, id) }
    val n = s.length
    // 1-indexed ranks ceil(n/3), ceil(2n/3) under (logprob desc, id asc)
    // — the last row of each sample tertile, i.e. the inclusive cutoff
    val c1 = s(math.ceil(n / 3.0).toInt - 1)
    val c2 = s(math.ceil(2.0 * n / 3.0).toInt - 1)
    def atOrAbove(c: (Double, Long)) =
      col("logprob") > c._1 || (col("logprob") === c._1 && col(idCol) <= c._2)
    lp.select(col(idCol), col("n_toks"), col("logprob"),
      when(atOrAbove(c1), "head").when(atOrAbove(c2), "middle")
        .otherwise("tail").as("bucket"))
  }
}
