package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection — the training-data dedup
  * primitive the reference lacks (its roadmap stops at metadata filtering,
  * README.md:52; this is the §2-beyond operator for LLM pipelines).
  *
  * Shape, built for 100 TB:
  *  - signatures + band keys are a pure per-row kernel (no shuffle): the
  *    text tokenizes once, each shingle md5-hashes ONCE to a 60-bit base,
  *    and the H minhashes are universal-hash permutations of that base
  *    (`(a_s·x + b_s) mod p`, p = 2³¹−1) — so the per-row cost is
  *    |shingles| md5 calls + |shingles|·H multiply-mods, not
  *    |shingles|·H md5 calls (measured ~3× on the md5-bound sf0.1 bench).
  *    (A nested Catalyst higher-order-function formulation is semantically
  *    identical but re-evaluates the tokenizer inside every lambda after
  *    CollapseProject inlining — measured 100×+ slower.)
  *  - banding finds candidates with an equi-join on (band_idx, band_key):
  *    one hash shuffle keyed by band, NEVER an all-pairs cross join; cost
  *    tracks colliding docs per bucket, not n²
  *  - verification joins candidate pairs back to their exact shingle sets
  *    and filters on true Jaccard — banding false-positives die here
  *
  * Every step is reproducible in ANSI SQL for the oracle: the base is the
  * first 15 hex chars of md5 parsed as an integer (DuckDB
  * `('0x' || substr(md5(x),1,15))::BIGINT`), and the permutations are
  * plain 64-bit integer arithmetic with identical semantics in the JVM
  * and DuckDB (all operands positive, products < 2⁶³).
  */
object MinHashLSH {

  /** SQL `trim` semantics: strip leading/trailing SPACES only. Java's
    * `String.trim` also strips tabs/newlines/control chars, which would
    * silently diverge from the `trim(lower(text))` the Spark columns and
    * the DuckDB oracle compute (a doc with an edge tab tokenizes to a
    * leading "" there).
    */
  private[operators] def sqlTrim(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  /** Word w-shingles of lower-cased, trimmed, whitespace-split text; docs
    * shorter than w shingle to their whole token string. Matches
    * `regexp_split_to_array(trim(lower(text)), '\s+')` semantics exactly:
    * space-only trim AND split limit −1 — Spark's `split` and DuckDB both
    * KEEP a trailing empty token after edge tabs/newlines (verified
    * empirically); Java's default limit-0 split would drop it.
    */
  def shingleStrings(text: String, w: Int): Array[String] = {
    val toks = sqlTrim(text.toLowerCase(Locale.ROOT)).split("\\s+", -1)
    if (toks.length >= w)
      Array.tabulate(toks.length - w + 1)(i => toks.slice(i, i + w).mkString(" "))
    else Array(toks.mkString(" "))
  }

  // hot path: thread-local digest (getInstance does provider lookup) and
  // table-based hex (String.format per byte costs more than the md5 itself)
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val HexChars = "0123456789abcdef".toCharArray

  private def md5hex(s: String): String = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Mersenne prime 2³¹−1: the universal-hash modulus. Keeping the base
    * and multipliers < p bounds `a·x + b` < 2⁶² — no overflow in either
    * the JVM or DuckDB.
    */
  private[operators] val P: Long = 2147483647L

  /** 60-bit md5-derived base for one shingle, reduced mod p. */
  private[operators] def shingleBase(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16) % P

  /** Permutation constants for seed s — md5-derived so each (a_s, b_s) pair
    * is independent of every other seed's (a linear schedule like
    * a_s = (s+1)·c mod p makes every hash an exact scalar multiple of the
    * first — h_s(x) = (s+1)·h_0(x) mod p — which correlates the minhashes
    * and roughly doubles the band-collision false-negative rate at J≈0.8).
    * a_s ∈ [1, p−1] (never 0, so the map stays a permutation),
    * b_s ∈ [0, p−1]. Reproduced literally in the oracle SQL via
    * `('0x' || substr(md5('a:' || s), 1, 15))::BIGINT` — same 60-bit parse
    * already proven portable for the shingle base. Memoized per JVM: the
    * md5 runs once per seed, not once per row.
    */
  private val permCache = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
  private def perm(seed: Int): (Long, Long) =
    permCache.computeIfAbsent(seed, s => (
      java.lang.Long.parseLong(md5hex("a:" + s).substring(0, 15), 16) % (P - 1) + 1,
      java.lang.Long.parseLong(md5hex("b:" + s).substring(0, 15), 16) % P))
  private[operators] def hashA(seed: Int): Long = perm(seed)._1
  private[operators] def hashB(seed: Int): Long = perm(seed)._2

  /** H-element MinHash signature: element s is
    * `min over shingles of (a_s · base(shingle) + b_s) mod p`.
    */
  def signatureLocal(shingles: Array[String], numHashes: Int): Array[Long] = {
    val bases = new Array[Long](shingles.length)
    var i = 0
    while (i < shingles.length) { bases(i) = shingleBase(shingles(i)); i += 1 }
    Array.tabulate(numHashes) { s =>
      val a = hashA(s)
      val b = hashB(s)
      var min = Long.MaxValue
      var j = 0
      while (j < bases.length) {
        val h = (a * bases(j) + b) % P
        if (h < min) min = h
        j += 1
      }
      min
    }
  }

  /** numHashes/r band keys: md5 of the ':'-joined signature slice. */
  def bandKeysLocal(sig: Array[Long], r: Int): Array[String] =
    Array.tabulate(sig.length / r)(b => md5hex(sig.slice(b * r, b * r + r).mkString(":")))

  /** Band keys straight from text — the whole per-row kernel as a column.
    * Null text → null (the downstream posexplode drops the row, matching
    * the null-propagation a Catalyst formulation would have).
    */
  def bandKeys(text: Column, w: Int = 3, numHashes: Int = 12, r: Int = 3): Column = {
    val f = udf { (t: String) =>
      if (t == null) null
      else bandKeysLocal(signatureLocal(shingleStrings(t, w), numHashes), r)
    }
    f(text)
  }

  /** Distinct shingle set (for exact-Jaccard verification); null-safe. */
  def shingleSet(text: Column, w: Int = 3): Column = {
    val f = udf { (t: String) =>
      if (t == null) null else shingleStrings(t, w).distinct
    }
    f(text)
  }

  /** (id, band_idx, band_key) rows, numHashes/r per doc. */
  def bands(df: DataFrame, idCol: String, textCol: String,
            w: Int = 3, numHashes: Int = 12, r: Int = 3): DataFrame =
    df.select(col(idCol),
      posexplode(bandKeys(col(textCol), w, numHashes, r)).as(Seq("band_idx", "band_key")))

  /** Distinct candidate pairs (a < b) sharing at least one band bucket —
    * a single equi-join shuffle on (band_idx, band_key).
    *
    * `maxBucket` is the skew guard for degenerate keys at scale: a bucket
    * of n rows emits n²/2 candidates, and real corpora have pathological
    * buckets (boilerplate, empty docs, templates) that would dominate the
    * join. Buckets larger than the cap are dropped BEFORE the join (one
    * windowed count over the same key the join shuffles by). Pairs inside
    * a dropped bucket are typically exact/near-exact duplicates — route
    * them through exact hash dedup, which handles any multiplicity in one
    * group-by. Default: uncapped.
    */
  /** The shared skew guard: drop band buckets with more than `maxBucket`
    * members (one windowed count over the same key the candidate join
    * shuffles by; a no-op when uncapped).
    */
  private[operators] def capBuckets(bandsDf: DataFrame, keyCols: Seq[String],
                                    maxBucket: Int): DataFrame =
    if (maxBucket == Int.MaxValue) bandsDf
    else bandsDf
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(keyCols.map(col): _*)))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")

  /** Public face of the band-bucket skew guard for pipelines composed
    * outside this package (e.g. the streaming stream-static twin).
    */
  def cappedBands(bandsDf: DataFrame, maxBucket: Int): DataFrame =
    capBuckets(bandsDf, Seq("band_idx", "band_key"), maxBucket)

  /** [[cappedBands]] with the [[candidatePairsRouted]]-style runtime skew
    * probe: ONE max-bucket aggregation over the band table; when no
    * bucket exceeds the cap (every healthy corpus) the windowed-count cap
    * is skipped outright — bit-identical by construction, since nothing
    * would have been dropped. BATCH-ONLY (the probe is an eager action)
    * and meant for a PERSISTED band table: on an unpersisted one the
    * probe re-runs the band kernel once.
    */
  def cappedBandsProbed(bandsDf: DataFrame, maxBucket: Int): DataFrame = {
    if (maxBucket == Int.MaxValue) return bandsDf
    val maxRow = bandsDf.groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("n")).agg(max(col("n"))).first()
    val maxN = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    if (maxN <= maxBucket) bandsDf
    else capBuckets(bandsDf, Seq("band_idx", "band_key"), maxBucket)
  }

  def candidatePairs(bandsDf: DataFrame, idCol: String,
                     maxBucket: Int = Int.MaxValue): DataFrame = {
    val src = capBuckets(bandsDf, Seq("band_idx", "band_key"), maxBucket)
    val a = src.select(col(idCol).as("doc_a"), col("band_idx"), col("band_key"))
    val b = src.select(col(idCol).as("doc_b"), col("band_idx"), col("band_key"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Default bucket cap for the routed candidate join: a bucket this big
    * means a degenerate key (boilerplate/template/empty docs), where the
    * n²/2 within-bucket pairs would dominate the join at scale.
    */
  val DefaultMaxBucket: Int = 1000

  /** Candidate pairs with the skew cap ON and dropped buckets ROUTED, not
    * lost: members of over-cap buckets go through exact content-hash
    * dedup, each exact-duplicate group emitting star pairs
    * (minId, memberId) — n−1 edges instead of a flooded bucket's n²/2,
    * with duplicate-cluster resolution (ConnectedComponents) still
    * reaching every member through the star. The accepted loss is pairs
    * between NON-identical members of a dropped bucket: buckets only
    * flood on degenerate keys whose members are exact-duplicate classes,
    * and any such member also appearing in a healthy bucket still pairs
    * there. This is the production entry point; the uncapped
    * [[candidatePairs]] stays for oracle-exact replay.
    *
    * BATCH-ONLY + persisted-input caveat (ADVICE r18): the skew probe
    * below is an EAGER `.first()` at call time, so `bandsDf` must be a
    * batch frame, and an unpersisted one pays one extra evaluation of
    * the band kernel for the probe — pass the persisted band artifact
    * (as every in-repo caller does).
    */
  def candidatePairsRouted(docs: DataFrame, bandsDf: DataFrame, idCol: String,
                           textCol: String,
                           maxBucket: Int = DefaultMaxBucket): DataFrame = {
    // Runtime adaptivity (same AQE-style probe as
    // EmbeddingLSH.candidatePairsRoutedFromSigs): one cheap aggregation
    // over the (persisted) band table finds the max bucket size; when no
    // bucket exceeds the cap — every healthy corpus — the whole skew
    // apparatus (two windowed-count evaluations of the band table, the
    // over-cap exact route, the union) is pruned and the operator is just
    // band-join + distinct, which is bit-identical to the routed plan by
    // construction (nothing is capped, the exact route is empty). The
    // probe costs one shuffle of rows the window would shuffle anyway.
    val maxRow = bandsDf.groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("n")).agg(max(col("n"))).first()
    val maxN = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    if (maxN <= maxBucket) return candidatePairs(bandsDf, idCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band_idx"), col("band_key"))
    val counted = bandsDf.withColumn("bucket_n", count(lit(1)).over(w))
    val kept = counted.filter(col("bucket_n") <= maxBucket).drop("bucket_n")
    val a = kept.select(col(idCol).as("doc_a"), col("band_idx"), col("band_key"))
    val b = kept.select(col(idCol).as("doc_b"), col("band_idx"), col("band_key"))
    val lsh = a.join(b, Seq("band_idx", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    val dropped = counted.filter(col("bucket_n") > maxBucket)
      .select(col(idCol)).distinct()
    val exact = docs.join(dropped, Seq(idCol), "left_semi")
      .select(col(idCol), md5(col(textCol)).as("h"))
      .withColumn("keep", min(col(idCol)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .filter(col(idCol) =!= col("keep"))
      .select(col("keep").as("doc_a"), col(idCol).as("doc_b"))
    lsh.union(exact).distinct()
  }

  /** Exact Jaccard over two pre-distinct shingle-set columns. */
  def jaccard(setA: Column, setB: Column): Column = {
    val inter = size(array_intersect(setA, setB)).cast("double")
    inter / (size(setA) + size(setB) - inter)
  }

  /** Incremental corpus-growth dedup: score every INCOMING doc against an
    * EXISTING corpus — the shape of continuous ingestion, where each new
    * crawl batch must be deduped against everything already kept without
    * re-pairing the corpus with itself. Returns one row per incoming doc:
    * `n_dups` (corpus docs with exact shingle Jaccard ≥ threshold),
    * `dup_of` (the minimum matching corpus id — the canonical keeper to
    * attribute the duplicate to), `max_j` (the strongest match, 6dp), with
    * `n_dups = 0` and nulls for novel docs.
    *
    * Shape at 100 TB: band keys are the same pure per-row kernel as
    * [[bands]] on BOTH sides (no shuffle to compute), candidates come from
    * ONE equi-join of incoming bands against corpus bands on
    * (band_idx, band_key) — cost tracks bucket collisions, never
    * |incoming| × |corpus|, and the corpus side's band table is exactly
    * the artifact a production pipeline persists once and reuses across
    * every ingest batch. Degenerate buckets are capped per side at
    * `maxBucket` BEFORE the join (≤ maxBucket² candidate pairs per
    * bucket); members of a dropped bucket are near-exact template classes
    * whose match, if real, also surfaces through their healthy buckets.
    * Verification joins the candidates back to distinct shingle sets and
    * filters on true Jaccard, so banding false-positives never reach the
    * output.
    */
  def crossCorpusDups(corpus: DataFrame, incoming: DataFrame, idCol: String,
                      textCol: String, threshold: Double,
                      w: Int = 3, numHashes: Int = 12, r: Int = 3,
                      maxBucket: Int = Int.MaxValue): DataFrame =
    crossCorpusDupsFromArtifacts(
      corpusBands = bands(corpus, idCol, textCol, w, numHashes, r),
      incomingBands = bands(incoming, idCol, textCol, w, numHashes, r),
      incomingIds = incoming.select(col(idCol)),
      isets = incoming.select(col(idCol), shingleSet(col(textCol), w).as("iset")),
      csets = corpus.select(col(idCol).as("corpus_id"),
        shingleSet(col(textCol), w).as("cset")),
      idCol = idCol, threshold = threshold, maxBucket = maxBucket,
      probeSkew = false) // unpersisted bands: a probe would re-run the kernel

  /** [[crossCorpusDups]] over pre-built per-side artifacts — the band
    * tables and shingle sets a production ingest pipeline persists once
    * and reuses across every batch (this is the documented scale shape;
    * the convenience form above derives them inline). With
    * `probeSkew = true` (persisted artifacts only — the probe is an
    * eager aggregation per side) healthy sides skip the windowed-count
    * skew cap entirely, bit-identically: a side whose largest bucket is
    * under the cap drops nothing.
    */
  def crossCorpusDupsFromArtifacts(corpusBands: DataFrame,
                                   incomingBands: DataFrame,
                                   incomingIds: DataFrame,
                                   isets: DataFrame, csets: DataFrame,
                                   idCol: String, threshold: Double,
                                   maxBucket: Int = Int.MaxValue,
                                   probeSkew: Boolean = true): DataFrame = {
    def capped(b: DataFrame): DataFrame =
      if (probeSkew) cappedBandsProbed(b, maxBucket)
      else capBuckets(b, Seq("band_idx", "band_key"), maxBucket)
    val cb = capped(corpusBands)
      .select(col(idCol).as("corpus_id"), col("band_idx"), col("band_key"))
    val ib = capped(incomingBands)
    val cand = ib.join(cb, Seq("band_idx", "band_key"))
      .select(col(idCol), col("corpus_id")).distinct()
    val matches = cand.join(isets, Seq(idCol)).join(csets, Seq("corpus_id"))
      .withColumn("j9", round(jaccard(col("iset"), col("cset")), 9))
      .filter(col("j9") >= threshold)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dups"), min(col("corpus_id")).as("dup_of"),
        round(max(col("j9")), 6).as("max_j"))
    incomingIds
      .join(matches, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        col("dup_of"), col("max_j"))
  }
}
