package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a DataFrame pipeline over the
  * `/root/testdata` parquet tables; [[oracleSql]] holds the equivalent
  * ANSI SQL the driver runs in DuckDB over the same tables. Column names
  * and float rounding match exactly on both sides (the driver's compare
  * is column-name keyed and hash based).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"             -> (Queries.q1Agg _),
    "q3_topk_join"       -> (Queries.q3TopkJoin _),
    "s5_semi_join"       -> (Queries.s5SemiJoin _),
    "s9_anti_join"       -> (Queries.s9AntiJoin _),
    "s10_count"          -> (Queries.s10Count _),
    "a2_normalize"       -> (Queries.a2Normalize _),
    "a4_id_assign"       -> (Queries.a4IdAssign _),
    "knn_flat"           -> (Queries.knnFlat _),
    "knn_batch_topk"     -> (Queries.knnBatchTopk _),
    "ivf_probe_knn"      -> (Queries.ivfProbeKnn _),
    "sim_join_topk"      -> (Queries.simJoinTopk _),
    "t12_centroid_assign" -> (Queries.t12CentroidAssign _),
    "t13_cluster_hist"   -> (Queries.t13ClusterHist _),
    "kmeans_lloyd_iter"  -> (Queries.kmeansLloydIter _),
    "pca_fit_invariants" -> (Queries.pcaFitInvariants _),
    "pq_fit_invariants"  -> (Queries.pqFitInvariants _),
    "train_subsample"    -> (Queries.trainSubsampleGoldens _),
    "knn_filtered"       -> (Queries.knnFiltered _),
    "knn_batch_filtered" -> (Queries.knnBatchFiltered _),
    "lifecycle_ids"      -> (Queries.lifecycleIds _),
    "lifecycle_counters" -> (Queries.lifecycleCounters _),
    "dedup_exact"        -> (Queries.dedupExact _),
    "text_tokens"        -> (Queries.textTokens _),
    "text_fingerprint"   -> (Queries.textFingerprint _),
    "minhash_lsh"        -> (Queries.minhashLsh _),
    "near_dup_jaccard"   -> (Queries.nearDupJaccard _),
    "dedup_incremental"  -> (Queries.dedupIncremental _),
    "dedup_groups"       -> (Queries.dedupGroups _),
    "dedup_keep_best"    -> (Queries.dedupKeepBest _),
    "simhash"            -> (Queries.simhashFp _),
    "simhash_near_dup"   -> (Queries.simhashNearDup _),
    "embed_near_dup"     -> (Queries.embedNearDup _),
    "lang_id"            -> (Queries.langId _),
    "quality_score"      -> (Queries.qualityScore _),
    "bpe_tokens"         -> (Queries.bpeTokens _),
    "pii_redact"         -> (Queries.piiRedact _),
    "tfidf_topk"         -> (Queries.tfidfTopk _),
    "dup_spans"          -> (Queries.dupSpans _),
    "bm25_topk"          -> (Queries.bm25Topk _),
    "hybrid_rrf"         -> (Queries.hybridRrf _),
    "semantic_dedup"     -> (Queries.semanticDedup _),
    "ccnet_bucket"       -> (Queries.ccnetBucket _),
    "ccnet_bucket_sampled" -> (Queries.ccnetBucketSampled _),
    "seq_pack"           -> (Queries.seqPack _),
    "mixture_sample"     -> (Queries.mixtureSample _),
    "bigram_logprob"     -> (Queries.bigramLogprob _),
    "dsir_weights"       -> (Queries.dsirWeights _),
    "dsir_weights_hashed" -> (Queries.dsirWeightsHashed _),
    "chunk_docs"         -> (Queries.chunkDocs _),
    "csv_source"         -> (Queries.csvSourceRoundtrip _),
    "orc_source"         -> (Queries.orcSourceRoundtrip _),
    "partitioned_sink"   -> (Queries.partitionedSink _),
    "corpus_report"      -> (Queries.corpusReport _),
    "kmv_distinct"       -> (Queries.kmvDistinct _),
    "kmv_overlap"        -> (Queries.kmvOverlap _),
    "funnel_steps"       -> (Queries.funnelSteps _),
    "char_shingle_min"   -> (Queries.charShingleMin _),
    "multimodal_meta"    -> (Queries.multimodalMeta _),
    "multimodal_resize"  -> (Queries.multimodalResize _),
    "multimodal_audio"   -> (Queries.multimodalAudio _),
    "multimodal_video"   -> (Queries.multimodalVideo _),
    "events_hourly"      -> (Queries.eventsHourly _),
    "trained_adc_topk"   -> (Queries.trainedAdcTopk _),
    "trained_knn"        -> (Queries.trainedKnn _),
    "prepared_knn"       -> (Queries.preparedKnn _),
    "knn_filtered_trained" -> (Queries.knnFilteredTrained _),
    "knn_filtered_routed" -> (Queries.knnFilteredRouted _),
    "dataset_split"      -> (Queries.datasetSplit _),
    "contamination"      -> (Queries.contamination _),
    "repetition_score"   -> (Queries.repetitionScore _),
    "embed_quantize"     -> (Queries.embedQuantize _),
    "unigram_logprob"    -> (Queries.unigramLogprob _),
    "heuristics_goldens" -> (Queries.heuristicsGoldens _),
    "db_info"            -> (Queries.dbInfo _),
    "trained_counters"   -> (Queries.trainedCounters _),
    "streaming_hourly"   -> (Queries.streamingHourly _),
    "streaming_ingest"   -> (Queries.streamingIngestIds _),
    "streaming_dedup_inc" -> (Queries.streamingDedupInc _),
    "engine_verbs"       -> (Queries.engineVerbs _),
    "rest_api"           -> (Queries.restApi _),
    "retrain_decisions"  -> (Queries.retrainDecisions _),
    "sessionize"         -> (Queries.sessionize _),
    "asof_join"          -> (Queries.asofJoin _),
    "json_props"         -> (Queries.jsonProps _),
    "boilerplate_ngrams" -> (Queries.boilerplateNgrams _),
    "cache_lru"          -> (Queries.cacheLru _),
    "range_join_count"   -> (Queries.rangeJoinCount _),
    "q6_filter_agg"      -> (Queries.q6FilterAgg _),
    "length_percentiles" -> (Queries.lengthPercentiles _),
    "topk_per_group"     -> (Queries.topkPerGroup _),
    "streaming_sessions" -> (Queries.streamingSessions _),
    "json_source"        -> (Queries.jsonSourceRoundtrip _),
    "event_pivot"        -> (Queries.eventPivot _),
    "rolling_stats"      -> (Queries.rollingStats _),
    "stratified_sample"  -> (Queries.stratifiedSample _),
    "frame_sample"       -> ((s, d) => Queries.multimodalFrameSample(s, d))
  )

  /** DuckDB oracle SQL, one per SQL-expressible entry in [[queries]].
    * The trained-fixture rows append theirs at the end: their SQL inlines
    * the actually-trained centroids/codebooks, so it is generated when the
    * fixture builds (Verify runs every query before dumping this map).
    */
  /** Shared DuckDB CTE chain (toks → sh → bs → sig → bands) replaying the
    * MinHashLSH kernel: 3-word shingles, 60-bit md5 base mod p=2³¹−1, H=12
    * md5-derived universal-hash permutations (a_s ∈ [1,p−1] from
    * md5("a:"+s), b_s ∈ [0,p−1] from md5("b:"+s) — independent per seed,
    * mirroring operators/MinHashLSH.scala exactly), 4 bands of r=3.
    * Interpolated into the three minhash-family oracles so a constant
    * change can never desynchronize one copy from the JVM kernel.
    */
  private val MinhashBandsSql: String =
    """toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(w) >= 3 THEN
      |      [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in generate_series(1, len(w)-2)]
      |    ELSE [array_to_string(w, ' ')] END AS shingles
      |  FROM toks),
      |bs AS (
      |  SELECT doc_id, shingles,
      |    [('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647 for x in shingles] AS bases
      |  FROM sh),
      |sig AS (
      |  SELECT doc_id,
      |    [list_min([((('0x' || substr(md5('a:' || s), 1, 15))::BIGINT % 2147483646 + 1) * x
      |                + ('0x' || substr(md5('b:' || s), 1, 15))::BIGINT % 2147483647) % 2147483647
      |       for x in bases])
      |     for s in generate_series(0, 11)] AS sig
      |  FROM bs),
      |bands AS (
      |  SELECT doc_id, b AS band_idx,
      |    md5(array_to_string(sig[3*b+1:3*b+3], ':')) AS band_key
      |  FROM sig, generate_series(0, 3) t(b))""".stripMargin

  /** Incremental cross-corpus dedup replay, shared by the batch row and
    * its streaming twin (whose cross-batch union must equal the batch
    * result exactly). Band keys are per-row, so bands over ALL docs split
    * by id in the join replays the Spark side's per-frame band
    * computation; coalesce keeps n_dups BIGINT; dup_of/max_j stay NULL
    * for novel docs.
    */
  private val DedupIncrementalSql: String =
    (s"WITH $MinhashBandsSql,\n" +
    """cand AS (
      |  SELECT DISTINCT i.doc_id AS doc_id, c.doc_id AS corpus_id
      |  FROM bands i JOIN bands c
      |    ON i.band_idx = c.band_idx AND i.band_key = c.band_key
      |  WHERE i.doc_id % 5 = 0 AND c.doc_id % 5 <> 0),
      |sets AS (SELECT doc_id, list_distinct(shingles) AS sset FROM sh),
      |m AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dups,
      |    min(corpus_id) AS dup_of, round(max(j9), 6) AS max_j
      |  FROM (
      |    SELECT cand.doc_id, cand.corpus_id,
      |      round(CAST(len(list_filter(si.sset, x -> list_contains(sc.sset, x))) AS DOUBLE)
      |        / (len(si.sset) + len(sc.sset)
      |           - len(list_filter(si.sset, x -> list_contains(sc.sset, x)))), 9) AS j9
      |    FROM cand
      |    JOIN sets si ON cand.doc_id = si.doc_id
      |    JOIN sets sc ON cand.corpus_id = sc.doc_id)
      |  WHERE j9 >= 0.1 GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(m.n_dups, CAST(0 AS BIGINT)) AS n_dups,
      |  m.dup_of, m.max_j
      |FROM documents d LEFT JOIN m USING (doc_id)
      |WHERE d.doc_id % 5 = 0""".stripMargin)

  /** The nprobe piecewise-linear factor (index/Heuristics.nProbe) as a SQL
    * CASE over a BIGINT nlist expression — shared by every oracle that
    * replays the heuristic so the anchor constants live once.
    */
  private def nprobeFactorSql(nlist: String): String =
    s"""CASE WHEN ln(CAST($nlist AS DOUBLE)) <= ln(200) THEN 0.5
       |         WHEN ln(CAST($nlist AS DOUBLE)) >= ln(200000) THEN 0.03
       |         WHEN ln(CAST($nlist AS DOUBLE)) <= ln(1000) THEN
       |           0.5 + (0.25 - 0.5) * (ln(CAST($nlist AS DOUBLE)) - ln(200)) / (ln(1000) - ln(200))
       |         WHEN ln(CAST($nlist AS DOUBLE)) <= ln(6350) THEN
       |           0.25 + (0.07 - 0.25) * (ln(CAST($nlist AS DOUBLE)) - ln(1000)) / (ln(6350) - ln(1000))
       |         ELSE 0.07 + (0.03 - 0.07) * (ln(CAST($nlist AS DOUBLE)) - ln(6350)) / (ln(200000) - ln(6350))
       |    END""".stripMargin

  /** The statically-known oracle rows (everything except the trained-fixture
    * rows, whose SQL inlines the trained model and exists only post-build).
    * Split out so local subset checks ([[LocalCheck]]) can dump SQL without
    * forcing a fixture train.
    */
  private[graft] lazy val staticOracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_topk_join" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  round(raw_rev, 2) AS revenue
        |FROM (
        |  SELECT o.o_orderkey, o.o_orderdate,
        |    sum(l.l_extendedprice * (1.0 - l.l_discount)) AS raw_rev
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY o.o_orderkey, o.o_orderdate)
        |ORDER BY raw_rev DESC, o_orderkey LIMIT 10""".stripMargin,

    "q6_filter_agg" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    // Exact interpolated percentiles: Spark `percentile` and DuckDB
    // `quantile_cont` share the linear-interpolation definition.
    "length_percentiles" ->
      """SELECT lang,
        |  round(quantile_cont(n_chars, 0.5), 6) AS p50,
        |  round(quantile_cont(n_chars, 0.9), 6) AS p90,
        |  round(quantile_cont(n_chars, 0.99), 6) AS p99
        |FROM documents GROUP BY lang""".stripMargin,

    // Per-source top-3 by the quality formula (identical arithmetic to
    // the quality_score row), rank ordered by raw score + id tiebreak.
    "topk_per_group" ->
      """WITH scored AS (
        |  SELECT doc_id, source,
        |      0.4 * least(CAST(len(list_filter(w, t -> t IN ('the','a','and','of','to','in','is','it'))) AS DOUBLE) / greatest(len(w), 1) * 4.0, 1.0)
        |    + 0.4 * least(CAST(len(w) AS DOUBLE) / 100.0, 1.0)
        |    + 0.2 * (1.0 - CAST(length(lt) - length(regexp_replace(lt, '[^a-z0-9\s]', '', 'g')) AS DOUBLE) / greatest(length(lt), 1)) AS q
        |  FROM (SELECT doc_id, source, lower(text) AS lt,
        |          regexp_split_to_array(trim(lower(text)), '\s+') AS w
        |        FROM documents)),
        |ranked AS (
        |  SELECT source, doc_id, q,
        |    row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS rank
        |  FROM scored)
        |SELECT source, rank, doc_id, round(q, 6) AS quality
        |FROM ranked WHERE rank <= 3""".stripMargin,

    "s5_semi_join" ->
      """SELECT vec_id, label FROM embeddings
        |WHERE vec_id IN (0, 7, 42, 99, 123, 256, 404, 499)""".stripMargin,

    "s9_anti_join" ->
      """SELECT vec_id, label FROM embeddings
        |WHERE vec_id NOT IN (0, 7, 42, 99, 123, 256, 404, 499)""".stripMargin,

    "s10_count" ->
      """SELECT 'customer' AS tbl, count(*) AS cnt FROM customer
        |UNION ALL SELECT 'documents', count(*) FROM documents
        |UNION ALL SELECT 'embeddings', count(*) FROM embeddings
        |UNION ALL SELECT 'events', count(*) FROM events
        |UNION ALL SELECT 'lineitem', count(*) FROM lineitem
        |UNION ALL SELECT 'nation', count(*) FROM nation
        |UNION ALL SELECT 'orders', count(*) FROM orders
        |UNION ALL SELECT 'part', count(*) FROM part
        |UNION ALL SELECT 'region', count(*) FROM region
        |UNION ALL SELECT 'supplier', count(*) FROM supplier""".stripMargin,

    "a2_normalize" ->
      """SELECT vec_id, round(n, 6) AS norm,
        |  round(CASE WHEN n = 0 THEN 0 ELSE CAST(embedding[1] AS DOUBLE) / n END, 6) AS e0,
        |  round(CASE WHEN n = 0 THEN 0 ELSE CAST(embedding[64] AS DOUBLE) / n END, 6) AS e63
        |FROM (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
        |  FROM embeddings)""".stripMargin,

    "a4_id_assign" ->
      """SELECT row_number() OVER (ORDER BY doc_id) + 1000 AS id, doc_id
        |FROM documents""".stripMargin,

    "knn_flat" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT e.vec_id,
        |    list_sum(list_transform(list_zip(e.embedding, q.qv),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS raw_sim
        |  FROM embeddings e CROSS JOIN q)
        |SELECT vec_id, round(raw_sim, 6) AS cosine_similarity
        |FROM scored ORDER BY raw_sim DESC, vec_id LIMIT 20""".stripMargin,

    "knn_batch_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 4),
        |scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    list_sum(list_transform(list_zip(e.embedding, q.qv),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS raw_sim
        |  FROM embeddings e CROSS JOIN q),
        |ranked AS (
        |  SELECT query_id, vec_id, raw_sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY raw_sim DESC, vec_id) AS rank
        |  FROM scored)
        |SELECT query_id, vec_id, rank, round(raw_sim, 6) AS cosine_similarity
        |FROM ranked WHERE rank <= 10""".stripMargin,

    "ivf_probe_knn" ->
      """WITH ex AS (
        |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
        |    generate_subscripts(embedding, 1) AS dim
        |  FROM embeddings),
        |cent AS (
        |  SELECT label AS cid, dim, avg(x) AS m FROM ex GROUP BY label, dim),
        |q AS (
        |  SELECT generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS qx
        |  FROM embeddings WHERE vec_id = 0),
        |cdist AS (
        |  SELECT c.cid, round(sum((c.m - q.qx) * (c.m - q.qx)), 9) AS d2
        |  FROM cent c JOIN q ON c.dim = q.dim GROUP BY c.cid),
        |probes AS (SELECT cid FROM cdist ORDER BY d2, cid LIMIT 3),
        |scored AS (
        |  SELECT e.vec_id, e.label,
        |    list_sum([CAST(e.embedding[j] AS DOUBLE) * CAST(qq.emb[j] AS DOUBLE)
        |      for j in generate_series(1, 64)]) AS raw_sim
        |  FROM embeddings e,
        |    (SELECT embedding AS emb FROM embeddings WHERE vec_id = 0) qq
        |  WHERE e.label IN (SELECT cid FROM probes))
        |SELECT vec_id, label, round(raw_sim, 6) AS cosine_similarity
        |FROM scored ORDER BY raw_sim DESC, vec_id LIMIT 10""".stripMargin,

    // Large-×-large IVF-bucketed similarity join: item assignment (rn=1),
    // per-query probe selection (rn≤2), bucket equi-join, ranked dots —
    // the full distributed operator replayed relationally.
    "sim_join_topk" ->
      """WITH ex AS (
        |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
        |    generate_subscripts(embedding, 1) AS dim
        |  FROM embeddings),
        |cent AS (
        |  SELECT label AS cid, dim, avg(x) AS m FROM ex GROUP BY label, dim),
        |dist AS (
        |  SELECT e.vec_id, c.cid, sum((e.x - c.m) * (e.x - c.m)) AS d2
        |  FROM ex e JOIN cent c ON e.dim = c.dim
        |  GROUP BY e.vec_id, c.cid),
        |rankd AS (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY round(d2, 9), cid) AS rn
        |  FROM dist),
        |assign AS (SELECT vec_id AS item_id, cid FROM rankd WHERE rn = 1),
        |qprobe AS (
        |  SELECT vec_id AS query_id, cid FROM rankd
        |  WHERE rn <= 2 AND vec_id < 50),
        |cand AS (
        |  SELECT p.query_id, a.item_id
        |  FROM qprobe p JOIN assign a USING (cid)
        |  WHERE a.item_id != p.query_id),
        |scored AS (
        |  SELECT c.query_id, c.item_id,
        |    list_sum(list_transform(list_zip(i.embedding, q.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS raw_sim
        |  FROM cand c
        |  JOIN embeddings i ON i.vec_id = c.item_id
        |  JOIN embeddings q ON q.vec_id = c.query_id),
        |ranked AS (
        |  SELECT query_id, item_id, raw_sim,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY raw_sim DESC, item_id) AS rank
        |  FROM scored)
        |SELECT query_id, item_id AS vec_id, rank,
        |  round(raw_sim, 6) AS cosine_similarity
        |FROM ranked WHERE rank <= 5""".stripMargin,

    "t12_centroid_assign" ->
      """WITH ex AS (
        |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
        |    generate_subscripts(embedding, 1) AS dim
        |  FROM embeddings),
        |cent AS (
        |  SELECT label AS cid, dim, avg(x) AS m FROM ex GROUP BY label, dim),
        |dist AS (
        |  SELECT e.vec_id, c.cid, sum((e.x - c.m) * (e.x - c.m)) AS d2
        |  FROM ex e JOIN cent c ON e.dim = c.dim
        |  GROUP BY e.vec_id, c.cid),
        |best AS (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY round(d2, 9), cid) AS rn
        |  FROM dist)
        |SELECT vec_id, cid FROM best WHERE rn = 1""".stripMargin,

    "t13_cluster_hist" ->
      """WITH ex AS (
        |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
        |    generate_subscripts(embedding, 1) AS dim
        |  FROM embeddings),
        |cent AS (
        |  SELECT label AS cid, dim, avg(x) AS m FROM ex GROUP BY label, dim),
        |dist AS (
        |  SELECT e.vec_id, c.cid, sum((e.x - c.m) * (e.x - c.m)) AS d2
        |  FROM ex e JOIN cent c ON e.dim = c.dim
        |  GROUP BY e.vec_id, c.cid),
        |best AS (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY round(d2, 9), cid) AS rn
        |  FROM dist)
        |SELECT cid, count(*) AS cnt FROM best WHERE rn = 1 GROUP BY cid""".stripMargin,

    // ONE Lloyd iteration of LocalKMeans replayed end-to-end: label-mean
    // init (float-cast, as the kernel stores float32), argmin assignment,
    // per-cluster mean update (float-cast), empty clusters keep position.
    "kmeans_lloyd_iter" ->
      """WITH sub AS (
        |  SELECT vec_id, label, embedding FROM embeddings ORDER BY vec_id LIMIT 500),
        |ex AS (
        |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
        |    generate_subscripts(embedding, 1) AS dim
        |  FROM sub),
        |cent AS (
        |  SELECT label AS cid, dim, CAST(CAST(avg(x) AS REAL) AS DOUBLE) AS m
        |  FROM ex GROUP BY label, dim),
        |dist AS (
        |  SELECT e.vec_id, c.cid, sum((e.x - c.m) * (e.x - c.m)) AS d2
        |  FROM ex e JOIN cent c ON e.dim = c.dim
        |  GROUP BY e.vec_id, c.cid),
        |best AS (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |  FROM dist),
        |asg AS (SELECT vec_id, cid FROM best WHERE rn = 1),
        |upd AS (
        |  SELECT a.cid, e.dim, CAST(CAST(avg(e.x) AS REAL) AS DOUBLE) AS m
        |  FROM asg a JOIN ex e ON a.vec_id = e.vec_id
        |  GROUP BY a.cid, e.dim)
        |SELECT c.cid, c.dim, round(COALESCE(u.m, c.m), 5) AS m
        |FROM cent c LEFT JOIN upd u ON c.cid = u.cid AND c.dim = u.dim""".stripMargin,

    // PCA fit invariants: the fitted mean replayed exactly; component
    // orthonormality ≡ the identity grid; projected variances descending.
    "pca_fit_invariants" ->
      """WITH sub AS (
        |  SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 500),
        |ex AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |    generate_subscripts(embedding, 1) AS dim
        |  FROM sub),
        |mean AS (
        |  SELECT 'mean' AS metric, CAST(dim AS BIGINT) AS i, CAST(0 AS BIGINT) AS j,
        |    CAST(round(avg(x), 6) AS DOUBLE) AS value
        |  FROM ex GROUP BY dim),
        |ortho AS (
        |  SELECT 'ortho' AS metric, CAST(a.i AS BIGINT) AS i, CAST(b.j AS BIGINT) AS j,
        |    CAST(CASE WHEN a.i = b.j THEN 1.0 ELSE 0.0 END AS DOUBLE) AS value
        |  FROM generate_series(0, 15) AS a(i)
        |  CROSS JOIN generate_series(0, 15) AS b(j)
        |  WHERE b.j >= a.i),
        |vd AS (
        |  SELECT 'var_desc' AS metric, CAST(g.k AS BIGINT) AS i,
        |    CAST(0 AS BIGINT) AS j, CAST(1.0 AS DOUBLE) AS value
        |  FROM generate_series(0, 14) AS g(k))
        |SELECT * FROM mean UNION ALL SELECT * FROM ortho
        |UNION ALL SELECT * FROM vd""".stripMargin,

    // PQ fit invariants: geometry + determinism + code range + the
    // quantization-quality gate, all closed-form.
    "pq_fit_invariants" ->
      """WITH base AS (
        |  SELECT 'm' AS metric, CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS j,
        |    CAST(8.0 AS DOUBLE) AS value
        |  UNION ALL SELECT 'sub_dim', 0, 0, 8.0
        |  UNION ALL SELECT 'deterministic', 0, 0, 1.0
        |  UNION ALL SELECT 'codes_in_range', 0, 0, 1.0),
        |per AS (
        |  SELECT 'ksub' AS metric, CAST(g.j AS BIGINT) AS i,
        |    CAST(0 AS BIGINT) AS j, CAST(256.0 AS DOUBLE) AS value
        |  FROM generate_series(0, 7) AS g(j)
        |  UNION ALL
        |  SELECT 'sse_improves', CAST(g.j AS BIGINT), CAST(0 AS BIGINT), 1.0
        |  FROM generate_series(0, 7) AS g(j))
        |SELECT * FROM base UNION ALL SELECT * FROM per""".stripMargin,

    // Seeded-train determinism (T9 subsample strategy) + the A10 flat
    // warning: nlist literal = Heuristics.numClusters(500) = 21; the
    // inflated count replays ceil-multiplier arithmetic over the table.
    "train_subsample" ->
      """WITH n AS (SELECT count(*) AS c FROM embeddings)
        |SELECT 'centroids_equal' AS metric, CAST(1 AS BIGINT) AS value
        |UNION ALL SELECT 'pca_equal', 1
        |UNION ALL SELECT 'codebooks_equal', 1
        |UNION ALL SELECT 'nlist', 21
        |UNION ALL SELECT 'flat_warn_threshold', 50000
        |UNION ALL SELECT 'flat_warning', 1
        |UNION ALL SELECT 'flat_count',
        |  (SELECT CAST(c * CAST(ceil(50001.0 / c) AS BIGINT) AS BIGINT) FROM n)""".stripMargin,

    "knn_filtered" ->
      """WITH nv AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS id, vec_id, label,
        |    [CAST(CAST(x AS DOUBLE) / n AS REAL) for x in embedding] AS v
        |  FROM (
        |    SELECT vec_id, label, embedding,
        |      sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding])) AS n
        |    FROM embeddings)),
        |q AS (SELECT v AS qv FROM nv WHERE vec_id = 0),
        |scored AS (
        |  SELECT nv.id, nv.label,
        |    list_sum([CAST(nv.v[j] AS DOUBLE) * CAST(q.qv[j] AS DOUBLE)
        |      for j in generate_series(1, 64)]) AS sim
        |  FROM nv, q WHERE nv.label IN (2, 5, 8))
        |SELECT row_number() OVER (ORDER BY sim DESC, id) AS rank, id,
        |  CAST(label AS VARCHAR) AS label, round(sim, 6) AS cosine_similarity
        |FROM scored ORDER BY sim DESC, id LIMIT 15""".stripMargin,

    "knn_batch_filtered" ->
      """WITH nv AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS id, vec_id, label,
        |    [CAST(CAST(x AS DOUBLE) / n AS REAL) for x in embedding] AS v
        |  FROM (
        |    SELECT vec_id, label, embedding,
        |      sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding])) AS n
        |    FROM embeddings)),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM nv WHERE vec_id < 4),
        |scored AS (
        |  SELECT q.query_id, nv.id, nv.label,
        |    list_sum([CAST(nv.v[j] AS DOUBLE) * CAST(q.qv[j] AS DOUBLE)
        |      for j in generate_series(1, 64)]) AS sim
        |  FROM nv, q WHERE nv.label IN (2, 5, 8)),
        |rk AS (
        |  SELECT query_id, id, label, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, id, CAST(label AS VARCHAR) AS label,
        |  round(sim, 6) AS cosine_similarity
        |FROM rk WHERE rank <= 10""".stripMargin,

    "knn_filtered_trained" ->
      """WITH nv AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS id, vec_id, label,
        |    [CAST(CAST(x AS DOUBLE) / n AS REAL) for x in embedding] AS v
        |  FROM (
        |    SELECT vec_id, label, embedding,
        |      sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding])) AS n
        |    FROM embeddings)),
        |q AS (SELECT v AS qv FROM nv WHERE vec_id = 0),
        |scored AS (
        |  SELECT nv.id, nv.label,
        |    list_sum([CAST(nv.v[j] AS DOUBLE) * CAST(q.qv[j] AS DOUBLE)
        |      for j in generate_series(1, 64)]) AS sim
        |  FROM nv, q WHERE nv.label = 7 AND nv.id < 60)
        |SELECT row_number() OVER (ORDER BY sim DESC, id) AS rank, id,
        |  CAST(label AS VARCHAR) AS label, round(sim, 6) AS cosine_similarity
        |FROM scored ORDER BY sim DESC, id LIMIT 15""".stripMargin,

    "lifecycle_ids" ->
      """SELECT id, label FROM (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS id,
        |    CAST(label AS VARCHAR) AS label
        |  FROM embeddings)
        |WHERE id NOT IN (0, 7, 42, 99, 123, 256, 404, 499)""".stripMargin,

    "lifecycle_counters" ->
      """SELECT 'num_vectors' AS metric, count(*) - 8 AS value FROM embeddings
        |UNION ALL SELECT 'max_id', count(*) - 1 FROM embeddings
        |UNION ALL SELECT 'num_new_vectors', count(*) - 8 FROM embeddings
        |UNION ALL SELECT 'num_trained_vectors_removed', 0
        |UNION ALL SELECT 'num_vectors_trained_on', 0""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n
        |FROM documents GROUP BY 1""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id, n_chars,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS token_cnt
        |FROM documents""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    regexp_split_to_array(trim(lower(text)), '\s+'))), ' ')) AS fp
        |FROM documents""".stripMargin,

    "minhash_lsh" ->
      (s"WITH $MinhashBandsSql\n" +
        """SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |FROM bands a JOIN bands b
          |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
          | AND a.doc_id < b.doc_id""".stripMargin),

    "near_dup_jaccard" ->
      (s"WITH $MinhashBandsSql,\n" +
      """pairs AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
        |   AND a.doc_id < b.doc_id),
        |sets AS (SELECT doc_id, list_distinct(shingles) AS sset FROM sh),
        |scored AS (
        |  SELECT p.doc_a, p.doc_b,
        |    round(CAST(len(list_filter(sa.sset, x -> list_contains(sb.sset, x))) AS DOUBLE)
        |      / (len(sa.sset) + len(sb.sset)
        |         - len(list_filter(sa.sset, x -> list_contains(sb.sset, x)))), 9) AS j9
        |  FROM pairs p
        |  JOIN sets sa ON p.doc_a = sa.doc_id
        |  JOIN sets sb ON p.doc_b = sb.doc_id)
        |SELECT doc_a, doc_b, round(j9, 6) AS jaccard
        |FROM scored WHERE j9 >= 0.1""".stripMargin),

    // dedup_groups' recursive-CTE clusters + the quality_score formula +
    // a per-cluster first_value window (quality desc, id asc) — the same
    // 6dp rounding both engines already hash-match in their own rows.
    "dedup_keep_best" ->
      (s"WITH RECURSIVE $MinhashBandsSql,\n" +
      """cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
        |   AND a.doc_id < b.doc_id),
        |sets AS (SELECT doc_id, list_distinct(shingles) AS sset FROM sh),
        |scored AS (
        |  SELECT p.doc_a, p.doc_b,
        |    round(CAST(len(list_filter(sa.sset, x -> list_contains(sb.sset, x))) AS DOUBLE)
        |      / (len(sa.sset) + len(sb.sset)
        |         - len(list_filter(sa.sset, x -> list_contains(sb.sset, x)))), 9) AS j9
        |  FROM cand p
        |  JOIN sets sa ON p.doc_a = sa.doc_id
        |  JOIN sets sb ON p.doc_b = sb.doc_id),
        |edges AS (
        |  SELECT doc_a AS a, doc_b AS b FROM scored WHERE j9 >= 0.1
        |  UNION ALL
        |  SELECT doc_b AS a, doc_a AS b FROM scored WHERE j9 >= 0.1),
        |reach AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |clusters AS (
        |  SELECT a AS doc_id, least(a, min(b)) AS canonical_id
        |  FROM reach GROUP BY a),
        |q AS (
        |  SELECT doc_id, round(
        |      0.4 * least(CAST(len(list_filter(w, t -> t IN ('the','a','and','of','to','in','is','it'))) AS DOUBLE) / greatest(len(w), 1) * 4.0, 1.0)
        |    + 0.4 * least(CAST(len(w) AS DOUBLE) / 100.0, 1.0)
        |    + 0.2 * (1.0 - CAST(length(lt) - length(regexp_replace(lt, '[^a-z0-9\s]', '', 'g')) AS DOUBLE) / greatest(length(lt), 1))
        |    , 6) AS quality
        |  FROM (SELECT doc_id, lower(text) AS lt,
        |          regexp_split_to_array(trim(lower(text)), '\s+') AS w
        |        FROM documents))
        |SELECT doc_id, quality, keeper_id,
        |  CAST(doc_id = keeper_id AS INT) AS keep
        |FROM (
        |  SELECT c.doc_id, q.quality, c.canonical_id,
        |    first_value(c.doc_id) OVER (PARTITION BY c.canonical_id
        |      ORDER BY q.quality DESC, c.doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS keeper_id
        |  FROM clusters c JOIN q USING (doc_id))""".stripMargin),

    // Band keys are per-row, so bands over ALL docs split by id in the
    // join replays the Spark side's per-frame band computation exactly.
    // coalesce keeps n_dups BIGINT; max_j/dup_of stay NULL for novel docs.
    "dedup_incremental" -> DedupIncrementalSql,

    // the streaming twin's cross-batch union must EQUAL the batch result
    "streaming_dedup_inc" -> DedupIncrementalSql,

    "simhash" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w FROM documents),
        |hs AS (
        |  SELECT doc_id, [('0x' || substr(md5(t), 1, 8))::BIGINT for t in w] AS h FROM toks),
        |votes AS (
        |  SELECT doc_id,
        |    [list_sum([2 * ((x // (2**i)::BIGINT) % 2) - 1 for x in h])
        |     for i in generate_series(0, 31)] AS v
        |  FROM hs)
        |SELECT doc_id,
        |  CAST(list_sum([CASE WHEN v[i+1] > 0 THEN (2**i)::BIGINT ELSE 0 END
        |    for i in generate_series(0, 31)]) AS BIGINT) AS simhash
        |FROM votes""".stripMargin,

    "dedup_groups" ->
      (s"WITH RECURSIVE $MinhashBandsSql,\n" +
      """cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
        |   AND a.doc_id < b.doc_id),
        |sets AS (SELECT doc_id, list_distinct(shingles) AS sset FROM sh),
        |scored AS (
        |  SELECT p.doc_a, p.doc_b,
        |    round(CAST(len(list_filter(sa.sset, x -> list_contains(sb.sset, x))) AS DOUBLE)
        |      / (len(sa.sset) + len(sb.sset)
        |         - len(list_filter(sa.sset, x -> list_contains(sb.sset, x)))), 9) AS j9
        |  FROM cand p
        |  JOIN sets sa ON p.doc_a = sa.doc_id
        |  JOIN sets sb ON p.doc_b = sb.doc_id),
        |edges AS (
        |  SELECT doc_a AS a, doc_b AS b FROM scored WHERE j9 >= 0.1
        |  UNION ALL
        |  SELECT doc_b AS a, doc_a AS b FROM scored WHERE j9 >= 0.1),
        |reach AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        |SELECT a AS doc_id, least(a, min(b)) AS canonical_id
        |FROM reach GROUP BY a""".stripMargin),

    "simhash_near_dup" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w FROM documents),
        |hs AS (
        |  SELECT doc_id, [('0x' || substr(md5(t), 1, 8))::BIGINT for t in w] AS h FROM toks),
        |votes AS (
        |  SELECT doc_id,
        |    [list_sum([2 * ((x // (2**i)::BIGINT) % 2) - 1 for x in h])
        |     for i in generate_series(0, 31)] AS v
        |  FROM hs),
        |fp AS (
        |  SELECT doc_id,
        |    CAST(list_sum([CASE WHEN v[i+1] > 0 THEN (2**i)::BIGINT ELSE 0 END
        |      for i in generate_series(0, 31)]) AS BIGINT) AS simhash
        |  FROM votes),
        |bands AS (
        |  SELECT doc_id, simhash, b AS band_idx,
        |    (simhash // (256**b)::BIGINT) % 256 AS band_value
        |  FROM fp, generate_series(0, 3) t(b)),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.simhash AS fa, b.simhash AS fb
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.band_value = b.band_value
        |   AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, hamming FROM (
        |  SELECT doc_a, doc_b,
        |    CAST(list_sum([(xor(fa, fb) // (2**i)::BIGINT) % 2
        |      for i in generate_series(0, 31)]) AS BIGINT) AS hamming
        |  FROM pairs)
        |WHERE hamming <= 3""".stripMargin,

    "embed_near_dup" ->
      """WITH nv AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding])) AS nrm
        |  FROM embeddings),
        |bands AS (
        |  SELECT vec_id, b AS band_idx,
        |    CAST(list_sum([
        |      CASE WHEN list_sum([CAST(embedding[j] AS DOUBLE) *
        |        (CASE WHEN ('0x' || substr(md5((b*8+p) || '-' || j), 1, 1))::INT % 2 = 0
        |              THEN 1.0 ELSE -1.0 END)
        |        for j in generate_series(1, 64)]) >= 0
        |      THEN (2**p)::BIGINT ELSE 0 END
        |      for p in generate_series(0, 7)]) AS BIGINT) AS band_key
        |  FROM embeddings, generate_series(0, 15) t(b)),
        |pairs AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
        |   AND a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(c9, 6) AS cos_sim FROM (
        |  SELECT p.id_a, p.id_b,
        |    round(list_sum([CAST(a.embedding[j] AS DOUBLE) * CAST(b.embedding[j] AS DOUBLE)
        |      for j in generate_series(1, 64)]) / (a.nrm * b.nrm), 9) AS c9
        |  FROM pairs p
        |  JOIN nv a ON p.id_a = a.vec_id
        |  JOIN nv b ON p.id_b = b.vec_id)
        |WHERE c9 >= 0.35""".stripMargin,

    "lang_id" ->
      """WITH sc AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(w, t -> t IN ('der','die','das','und','ist','von','nicht','ein'))) AS DOUBLE) / greatest(len(w), 1) AS s_de,
        |    CAST(len(list_filter(w, t -> t IN ('the','a','and','of','to','in','is','it'))) AS DOUBLE) / greatest(len(w), 1) AS s_en,
        |    CAST(len(list_filter(w, t -> t IN ('el','los','las','y','es','que','un','una'))) AS DOUBLE) / greatest(len(w), 1) AS s_es,
        |    CAST(len(list_filter(w, t -> t IN ('le','les','et','est','que','une','dans','pour'))) AS DOUBLE) / greatest(len(w), 1) AS s_fr,
        |    CAST(len(list_filter(w, t -> t IN ('的','了','是','在','我','有'))) AS DOUBLE) / greatest(len(w), 1) AS s_zh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w FROM documents))
        |SELECT doc_id,
        |  CASE WHEN m = 0 THEN 'und'
        |       WHEN s_de = m THEN 'de' WHEN s_en = m THEN 'en'
        |       WHEN s_es = m THEN 'es' WHEN s_fr = m THEN 'fr'
        |       ELSE 'zh' END AS pred_lang,
        |  round(m, 6) AS score
        |FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS m FROM sc)""".stripMargin,

    "quality_score" ->
      """SELECT doc_id, round(
        |    0.4 * least(CAST(len(list_filter(w, t -> t IN ('the','a','and','of','to','in','is','it'))) AS DOUBLE) / greatest(len(w), 1) * 4.0, 1.0)
        |  + 0.4 * least(CAST(len(w) AS DOUBLE) / 100.0, 1.0)
        |  + 0.2 * (1.0 - CAST(length(lt) - length(regexp_replace(lt, '[^a-z0-9\s]', '', 'g')) AS DOUBLE) / greatest(length(lt), 1))
        |  , 6) AS quality
        |FROM (SELECT doc_id, lower(text) AS lt,
        |        regexp_split_to_array(trim(lower(text)), '\s+') AS w
        |      FROM documents)""".stripMargin,

    "bpe_tokens" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(trim(lower(text)), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_cnt
        |FROM documents""".stripMargin,

    "pii_redact" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@mail' || (doc_id % 7)
        |      || '.net ip 10.' || (doc_id % 256) || '.' || (doc_id % 100)
        |      || '.' || (doc_id % 50)
        |      || ' ssn ' || (100 + doc_id % 900) || '-' || (10 + doc_id % 90)
        |      || '-' || (1000 + doc_id % 9000) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')) AS n_email,
        |  len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssn,
        |  len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
        |FROM aug""".stripMargin,

    "dup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, CASE WHEN len(w) >= 8 THEN
        |      list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
        |          || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]
        |        for i in generate_series(1, len(w)-7)])
        |    ELSE [array_to_string(w, ' ')] END AS g
        |  FROM toks),
        |grams AS (SELECT doc_id, unnest(g) AS gram FROM sh),
        |shared AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) > 1),
        |hits AS (
        |  SELECT g.doc_id, count(*) AS dup_spans
        |  FROM grams g JOIN shared s ON g.gram = s.gram GROUP BY 1)
        |SELECT sh.doc_id, len(sh.g) AS n_spans,
        |  CAST(coalesce(h.dup_spans, 0) AS BIGINT) AS dup_spans,
        |  round(coalesce(h.dup_spans, 0) / greatest(len(sh.g), 1), 6) AS dup_frac
        |FROM sh LEFT JOIN hits h ON sh.doc_id = h.doc_id""".stripMargin,

    "tfidf_topk" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
        |       WHERE term <> '' GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    tf.tf * ln((n.n + 1.0) / (df.df + 1.0)) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, rank, term, round(tfidf, 6) AS tfidf
        |FROM (SELECT doc_id, term, tfidf,
        |        row_number() OVER (PARTITION BY doc_id
        |                           ORDER BY tfidf DESC, term ASC) AS rank
        |      FROM scored)
        |WHERE rank <= 3""".stripMargin,

    // Constants written as the same decimal literals as the Scala side
    // (2.2, 1.2, 0.75, 0.25, 0.5) and per-term scores rounded to 9dp then
    // summed IN TERM ORDER — double addition order matches the engine's
    // ordered fold bit for bit.
    "bm25_topk" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tkf AS (SELECT doc_id, term FROM tk WHERE term <> ''),
        |n AS (SELECT count(*) AS n FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tkf GROUP BY 1),
        |ad AS (SELECT CAST(count(*) AS DOUBLE) / (SELECT n FROM n) AS avgdl FROM tkf),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tkf
        |       WHERE term IN ('hash', 'spark', 'vector') GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT tf.doc_id, tf.term,
        |    round(ln(1.0 + (CAST((SELECT n FROM n) AS DOUBLE) - df.df + 0.5) / (df.df + 0.5)) *
        |      tf.tf * 2.2 /
        |      (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / (SELECT avgdl FROM ad))), 9) AS s
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)),
        |agg AS (SELECT doc_id, list_sum(list(s ORDER BY term)) AS bm25 FROM sc GROUP BY doc_id)
        |SELECT doc_id, rank, round(bm25, 6) AS bm25
        |FROM (SELECT doc_id, bm25,
        |        row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank FROM agg)
        |WHERE rank <= 10""".stripMargin,

    "hybrid_rrf" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT e.vec_id,
        |    list_sum(list_transform(list_zip(e.embedding, q.qv),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS raw_sim
        |  FROM embeddings e CROSS JOIN q),
        |vr AS (
        |  SELECT id, rank_v FROM (
        |    SELECT vec_id AS id,
        |      row_number() OVER (ORDER BY raw_sim DESC, vec_id) AS rank_v
        |    FROM scored) WHERE rank_v <= 20),
        |tk AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tkf AS (SELECT doc_id, term FROM tk WHERE term <> ''),
        |n AS (SELECT count(*) AS n FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tkf GROUP BY 1),
        |ad AS (SELECT CAST(count(*) AS DOUBLE) / (SELECT n FROM n) AS avgdl FROM tkf),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tkf
        |       WHERE term IN ('hash', 'spark', 'vector') GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |bsc AS (
        |  SELECT tf.doc_id, tf.term,
        |    round(ln(1.0 + (CAST((SELECT n FROM n) AS DOUBLE) - df.df + 0.5) / (df.df + 0.5)) *
        |      tf.tf * 2.2 /
        |      (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / (SELECT avgdl FROM ad))), 9) AS s
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)),
        |bagg AS (SELECT doc_id, list_sum(list(s ORDER BY term)) AS bm25 FROM bsc GROUP BY doc_id),
        |kr AS (
        |  SELECT id, rank_k FROM (
        |    SELECT doc_id AS id,
        |      row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_k
        |    FROM bagg) WHERE rank_k <= 20),
        |u AS (
        |  SELECT coalesce(vr.id, kr.id) AS id, vr.rank_v, kr.rank_k
        |  FROM vr FULL JOIN kr ON vr.id = kr.id),
        |f AS (
        |  SELECT id, round(coalesce(CAST(1.0 AS DOUBLE) / (60 + rank_v), 0.0) +
        |                   coalesce(CAST(1.0 AS DOUBLE) / (60 + rank_k), 0.0), 9) AS rrf FROM u)
        |SELECT id, rank, rrf FROM (
        |  SELECT id, rrf, row_number() OVER (ORDER BY rrf DESC, id) AS rank FROM f)
        |WHERE rank <= 10""".stripMargin,

    // Assignment CTEs identical to t12_centroid_assign; pair cosines in
    // the embed_near_dup form (index-order dot / norm product, rounded to
    // 9dp BEFORE the threshold so float noise can't flip a pair).
    "semantic_dedup" ->
      """WITH ex AS (
        |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
        |    generate_subscripts(embedding, 1) AS dim
        |  FROM embeddings),
        |cent AS (
        |  SELECT label AS cid, dim, avg(x) AS m FROM ex GROUP BY label, dim),
        |dist AS (
        |  SELECT e.vec_id, c.cid, sum((e.x - c.m) * (e.x - c.m)) AS d2
        |  FROM ex e JOIN cent c ON e.dim = c.dim
        |  GROUP BY e.vec_id, c.cid),
        |best AS (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY round(d2, 9), cid) AS rn
        |  FROM dist),
        |asg AS (SELECT vec_id, cid FROM best WHERE rn = 1),
        |nv AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding])) AS nrm
        |  FROM embeddings),
        |pr AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_sum([CAST(na.embedding[j] AS DOUBLE) * CAST(nb.embedding[j] AS DOUBLE)
        |      for j in generate_series(1, 64)]) / (na.nrm * nb.nrm), 9) AS c9
        |  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |  JOIN nv na ON na.vec_id = a.vec_id
        |  JOIN nv nb ON nb.vec_id = b.vec_id),
        |marks AS (
        |  SELECT id_b AS vec_id, count(*) AS n_dups, max(c9) AS mx
        |  FROM pr WHERE c9 >= 0.35 GROUP BY 1)
        |SELECT a.vec_id, a.cid,
        |  coalesce(m.n_dups, 0) AS n_dups,
        |  round(coalesce(m.mx, 0.0), 6) AS max_dup_sim,
        |  m.vec_id IS NULL AS keep
        |FROM asg a LEFT JOIN marks m ON a.vec_id = m.vec_id""".stripMargin,

    // Ordering on the ROUNDED logprob (6dp) + doc_id so a bucket boundary
    // can't move on cross-engine float noise; ntile is the SQL-standard
    // balanced split in both engines.
    "ccnet_bucket" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents WHERE text IS NOT NULL),
        |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        |tot AS (SELECT sum(cnt) AS t FROM freq),
        |lp AS (
        |  SELECT doc_id, count(*) AS n_toks,
        |    round(avg(ln(CAST(cnt AS DOUBLE) / t)), 6) AS logprob
        |  FROM toks JOIN freq USING (tok), tot
        |  GROUP BY doc_id)
        |SELECT doc_id, n_toks, logprob,
        |  CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM (SELECT doc_id, n_toks, logprob,
        |        ntile(3) OVER (ORDER BY logprob DESC, doc_id) AS nt FROM lp)""".stripMargin,

    // Replays the sampled-cutoff path verbatim: the same Knuth-multiplier
    // id hash selects the sample (no RNG → same membership on both
    // engines), the cutoffs are the (logprob, doc_id) rows at sample
    // ranks ceil(n/3)/ceil(2n/3) under (logprob DESC, doc_id), and the
    // bucket is a pure composite-key comparison — ties can't straddle a
    // boundary, so a 6dp-rounded logprob makes the row hash-exact.
    "ccnet_bucket_sampled" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents WHERE text IS NOT NULL),
        |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        |tot AS (SELECT sum(cnt) AS t FROM freq),
        |lp AS (
        |  SELECT doc_id, count(*) AS n_toks,
        |    round(avg(ln(CAST(cnt AS DOUBLE) / t)), 6) AS logprob
        |  FROM toks JOIN freq USING (tok), tot
        |  GROUP BY doc_id),
        |samp AS (
        |  SELECT logprob, doc_id,
        |    row_number() OVER (ORDER BY logprob DESC, doc_id) AS rn
        |  FROM lp
        |  WHERE (doc_id % 100003) * 2654435761 % 4294967296 % 1000 < 900),
        |nn AS (SELECT count(*) AS n FROM samp),
        |cut1 AS (SELECT logprob AS l1, doc_id AS i1 FROM samp, nn
        |         WHERE rn = CAST(ceil(n / 3.0) AS BIGINT)),
        |cut2 AS (SELECT logprob AS l2, doc_id AS i2 FROM samp, nn
        |         WHERE rn = CAST(ceil(2.0 * n / 3.0) AS BIGINT))
        |SELECT doc_id, n_toks, logprob,
        |  CASE WHEN logprob > l1 OR (logprob = l1 AND doc_id <= i1) THEN 'head'
        |       WHEN logprob > l2 OR (logprob = l2 AND doc_id <= i2) THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM lp, cut1, cut2""".stripMargin,

    // Window sum returns HUGEINT in DuckDB — CAST everything integral
    // back to BIGINT (skill gotcha); // is DuckDB integer division =
    // Spark's `div` on longs for the non-negative values here.
    "seq_pack" ->
      """WITH c AS (
        |  SELECT doc_id, CAST(coalesce(len(list_filter(
        |      regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '')), 0) AS BIGINT) AS n_toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n_toks,
        |    CAST(sum(n_toks) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM c)
        |SELECT doc_id, n_toks,
        |  CAST((cum - n_toks) // 512 AS BIGINT) AS seq_id,
        |  CAST((cum - n_toks) % 512 AS BIGINT) AS seq_offset,
        |  CAST(CASE WHEN n_toks = 0 THEN 0
        |       ELSE (cum - 1) // 512 - (cum - n_toks) // 512 + 1 END AS BIGINT) AS seqs_spanned
        |FROM s""".stripMargin,

    // τ-power / normalize arithmetic replayed with the same operation
    // order as the Scala driver (pow parity per heuristics_goldens);
    // rates rounded to 9dp BEFORE the integer threshold so a last-ulp
    // pow difference can't flip a membership; the fixed source-order
    // list fold matches the driver's foldLeft.
    "mixture_sample" ->
      """WITH cnt AS (SELECT source, count(*) AS c FROM documents
        |            WHERE source IS NOT NULL GROUP BY source),
        |tot AS (SELECT count(*) AS n FROM documents WHERE source IS NOT NULL),
        |pw AS (SELECT source, c, pow(CAST(c AS DOUBLE), 0.7) AS p FROM cnt),
        |tp AS (SELECT list_sum(list(p ORDER BY source)) AS tp FROM pw),
        |rt AS (
        |  SELECT source,
        |    round(least(1.0, ceil(n * 0.5) * (p / tp) / c), 9) AS rate9
        |  FROM pw, tp, tot),
        |th AS (
        |  SELECT source, rate9,
        |    CAST(floor(rate9 * 4294967296) AS BIGINT) AS thr FROM rt)
        |SELECT d.doc_id, d.source, round(t.rate9, 6) AS rate,
        |  d.u < t.thr AS kept
        |FROM (SELECT doc_id, source,
        |        ('0x' || substr(md5('mix-' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS u
        |      FROM documents) d
        |JOIN th t USING (source)""".stripMargin,

    // Bigram extraction = the same slice-zip as the Spark projection;
    // P(w2|w1) = pair count / prefix count over the corpus's own bigram
    // table (self-scoring — every bigram is in the model, no smoothing).
    "bigram_logprob" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |bg AS (
        |  SELECT doc_id, w[1] AS w1, w[2] AS w2
        |  FROM (SELECT doc_id,
        |          unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS w
        |        FROM tk WHERE len(t) >= 2)),
        |pair AS (SELECT w1, w2, count(*) AS cp FROM bg GROUP BY 1, 2),
        |pref AS (SELECT w1, CAST(sum(cp) AS BIGINT) AS c1 FROM pair GROUP BY 1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(avg(ln(CAST(cp AS DOUBLE) / c1)), 6) AS logprob
        |FROM bg JOIN pair USING (w1, w2) JOIN pref USING (w1)
        |GROUP BY doc_id""".stripMargin,

    // Same bigram extraction as bigram_logprob; both models from one
    // conditional agg (NULL target flag lands in ELSE 0 on both
    // engines); add-1 smoothing denominators are integer-valued doubles
    // so the ratio arithmetic is bit-reproducible.
    "dsir_weights" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    source IN ('src0', 'src1', 'src2', 'src3', 'src4') AS tgt,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |bg AS (
        |  SELECT doc_id, tgt, w[1] AS w1, w[2] AS w2
        |  FROM (SELECT doc_id, tgt,
        |          unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS w
        |        FROM tk WHERE len(t) >= 2)),
        |model AS (
        |  SELECT w1, w2,
        |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
        |    CAST(sum(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS BIGINT) AS cr
        |  FROM bg GROUP BY 1, 2),
        |tot AS (
        |  SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr,
        |    count(*) AS v
        |  FROM model)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(avg(
        |    ln(CAST(ct + 1 AS DOUBLE) / (SELECT CAST(nt + v AS DOUBLE) FROM tot)) -
        |    ln(CAST(cr + 1 AS DOUBLE) / (SELECT CAST(nr + v AS DOUBLE) FROM tot))), 6)
        |    AS logweight
        |FROM bg JOIN model USING (w1, w2)
        |GROUP BY doc_id""".stripMargin,

    // chunk k covers tokens [k*48+1, k*48+64]; DuckDB list slicing is
    // inclusive and end-truncating like Spark's slice. ceil on a DOUBLE
    // ratio matches Spark's ceil(cast double); n>=1 docs only.
    "chunk_docs" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |ck AS (
        |  SELECT doc_id, t,
        |    unnest(generate_series(0,
        |      greatest(0, CAST(ceil((len(t) - 64) / 48.0) AS INT)))) AS chunk_idx
        |  FROM tk WHERE len(t) >= 1)
        |SELECT doc_id, chunk_idx,
        |  array_to_string(t[chunk_idx*48+1 : chunk_idx*48+64], ' ') AS chunk_text,
        |  len(t[chunk_idx*48+1 : chunk_idx*48+64]) AS chunk_toks
        |FROM ck""".stripMargin,

    // hashed-feature twin: the 60-bit md5 parse already proven portable
    // by the minhash rows; smoothing denominator is nt/nr + 4096 (the
    // FIXED bucket space), so no bucket materialization is needed.
    "dsir_weights_hashed" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    source IN ('src0', 'src1', 'src2', 'src3', 'src4') AS tgt,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |bg AS (
        |  SELECT doc_id, tgt,
        |    ('0x' || substr(md5(w[1] || ' ' || w[2]), 1, 15))::BIGINT % 4096 AS bucket
        |  FROM (SELECT doc_id, tgt,
        |          unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS w
        |        FROM tk WHERE len(t) >= 2)),
        |model AS (
        |  SELECT bucket,
        |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
        |    CAST(sum(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS BIGINT) AS cr
        |  FROM bg GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr
        |  FROM model)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(avg(
        |    ln(CAST(ct + 1 AS DOUBLE) / (SELECT CAST(nt + 4096 AS DOUBLE) FROM tot)) -
        |    ln(CAST(cr + 1 AS DOUBLE) / (SELECT CAST(nr + 4096 AS DOUBLE) FROM tot))), 6)
        |    AS logweight
        |FROM bg JOIN model USING (bucket)
        |GROUP BY doc_id""".stripMargin,

    "char_shingle_min" ->
      """SELECT doc_id, CASE WHEN length(t) >= 8 THEN
        |    list_min([md5(substr(t, i, 8)) for i in generate_series(1, length(t) - 7)])
        |  ELSE md5(t) END AS shingle_min
        |FROM (SELECT doc_id, trim(lower(text)) AS t FROM documents)""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
        |       WHEN 3 THEN 'bmp' ELSE 'wav' END AS format,
        |  CASE WHEN doc_id % 5 = 4 THEN 8000 * (1 + ('0x' || substr(h, 1, 2))::BIGINT % 4)
        |       ELSE 8 * (1 + ('0x' || substr(h, 1, 2))::BIGINT % 32) END AS width,
        |  CASE WHEN doc_id % 5 = 4 THEN 1 + ('0x' || substr(h, 3, 2))::BIGINT % 2
        |       ELSE 8 * (1 + ('0x' || substr(h, 3, 2))::BIGINT % 32) END AS height,
        |  CASE WHEN doc_id % 5 = 4 THEN 100 + ('0x' || substr(h, 5, 2))::BIGINT
        |       ELSE 1 END AS n_frames
        |FROM (SELECT doc_id, md5(text) AS h FROM documents)""".stripMargin,

    "multimodal_resize" ->
      """SELECT doc_id, 'png' AS format, w AS width, h AS height,
        |  CASE WHEN greatest(w, h) <= 64 THEN w
        |       ELSE greatest(1, (w * 64) // greatest(w, h)) END AS new_width,
        |  CASE WHEN greatest(w, h) <= 64 THEN h
        |       ELSE greatest(1, (h * 64) // greatest(w, h)) END AS new_height
        |FROM (
        |  SELECT doc_id,
        |    8 * (1 + ('0x' || substr(h8, 1, 2))::BIGINT % 32) AS w,
        |    8 * (1 + ('0x' || substr(h8, 3, 2))::BIGINT % 32) AS h
        |  FROM (SELECT doc_id, md5(text) AS h8 FROM documents WHERE doc_id % 5 = 0))""".stripMargin,

    "multimodal_audio" ->
      """SELECT doc_id,
        |  8000 * (1 + ('0x' || substr(h, 1, 2))::BIGINT % 4) AS sample_rate,
        |  1 + ('0x' || substr(h, 3, 2))::BIGINT % 2 AS channels,
        |  100 + ('0x' || substr(h, 5, 2))::BIGINT AS n_frames,
        |  ((100 + ('0x' || substr(h, 5, 2))::BIGINT) * 1000)
        |    // (8000 * (1 + ('0x' || substr(h, 1, 2))::BIGINT % 4)) AS duration_ms,
        |  1000 + ('0x' || substr(h, 7, 3))::BIGINT % 4000 AS peak,
        |  round(CAST(1000 + ('0x' || substr(h, 7, 3))::BIGINT % 4000 AS DOUBLE), 6) AS rms
        |FROM (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 5 = 4)""".stripMargin,

    "multimodal_video" ->
      """SELECT doc_id,
        |  16 * (1 + ('0x' || substr(h, 1, 2))::BIGINT % 80) AS width,
        |  16 * (1 + ('0x' || substr(h, 3, 2))::BIGINT % 45) AS height,
        |  600 * (1 + ('0x' || substr(h, 5, 1))::BIGINT % 4) AS timescale,
        |  ((24 + ('0x' || substr(h, 6, 2))::BIGINT)
        |     * ((600 * (1 + ('0x' || substr(h, 5, 1))::BIGINT % 4)) // 24) * 1000)
        |    // (600 * (1 + ('0x' || substr(h, 5, 1))::BIGINT % 4)) AS duration_ms,
        |  24 + ('0x' || substr(h, 6, 2))::BIGINT AS n_frames,
        |  CAST(1 AS BIGINT) AS video_tracks
        |FROM (SELECT doc_id, md5(text) AS h FROM documents WHERE text IS NOT NULL)""".stripMargin,

    "events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
        |  event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // The REAL Structured-Streaming pipeline (readStream → watermarked
    // tumbling windows → memory sink, AvailableNow) must land exactly
    // where the batch aggregation lands — same oracle as events_hourly.
    "streaming_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
        |  event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // Streaming ingest through the engine write path: two micro-batches of
    // the whole embeddings table → 2n rows with ids exactly 0..2n−1 (the
    // cross-batch sequential-id contract) and the dim inferred.
    "streaming_ingest" ->
      """WITH s AS (SELECT count(*) AS c, max(len(embedding)) AS dim FROM embeddings)
        |SELECT 'ingest_num_vectors' AS metric, CAST(2 * c AS DOUBLE) AS value FROM s
        |UNION ALL SELECT 'ingest_min_id', 0.0
        |UNION ALL SELECT 'ingest_max_id', CAST(2 * c - 1 AS DOUBLE) FROM s
        |UNION ALL SELECT 'ingest_distinct_ids', CAST(2 * c AS DOUBLE) FROM s
        |UNION ALL SELECT 'ingest_dim', CAST(dim AS DOUBLE) FROM s""".stripMargin,

    // S12/D1/D4/A1/Q1/T2/T3/T20 live-engine verb matrix: every value is
    // closed-form from the embeddings count (n adds; n/20 soft deletes stay
    // pending below the 10% compaction threshold; 3·(n/20) total crosses it
    // → physical rewrite, pending reset, data version bump; rejected verbs
    // leave counts/max_id/version untouched).
    "engine_verbs" ->
      """WITH s AS (SELECT count(*) AS c, max(len(embedding)) AS dim FROM embeddings),
        |t AS (SELECT c, dim, c - 3 * (c // 20) AS live,
        |  greatest(1, CAST(trunc(pow(CAST(c - 3 * (c // 20) AS DOUBLE), 0.75) * 0.2)
        |    AS BIGINT)) AS nlist FROM s),
        |f AS (SELECT *, FACTOR_EXPR AS factor FROM t)
        |SELECT 'drop_exists_before' AS metric, 1.0 AS value FROM f
        |UNION ALL SELECT 'drop_rows_before', CAST(c AS DOUBLE) FROM f
        |UNION ALL SELECT 'drop_exists_after', 0.0
        |UNION ALL SELECT 'drop_rows_after_recreate', 0.0
        |UNION ALL SELECT 'soft_pending', CAST(c // 20 AS DOUBLE) FROM f
        |UNION ALL SELECT 'soft_live', CAST(c - c // 20 AS DOUBLE) FROM f
        |UNION ALL SELECT 'soft_data_version', 0.0
        |UNION ALL SELECT 'compact_pending', 0.0
        |UNION ALL SELECT 'compact_live', CAST(live AS DOUBLE) FROM f
        |UNION ALL SELECT 'compact_data_version', 1.0
        |UNION ALL SELECT 'remove_negative_rejected', 1.0
        |UNION ALL SELECT 'add_dim_mismatch_rejected', 1.0
        |UNION ALL SELECT 'add_failure_live', CAST(live AS DOUBLE) FROM f
        |UNION ALL SELECT 'add_failure_max_id', CAST(c - 1 AS DOUBLE) FROM f
        |UNION ALL SELECT 'query_dim_mismatch_rejected', 1.0
        |UNION ALL SELECT 'train_small_bypass_trained', 0.0
        |UNION ALL SELECT 'status_bypass_failed', 1.0
        |UNION ALL SELECT 'train_invalid_params_rejected', 1.0
        |UNION ALL SELECT 'status_invalid_failed', 1.0
        |UNION ALL SELECT 'train_failure_trained', 0.0
        |UNION ALL SELECT 'train_failure_live', CAST(live AS DOUBLE) FROM f
        |UNION ALL SELECT 'train_failure_data_version', 1.0
        |UNION ALL SELECT 'dim_inferred', CAST(dim AS DOUBLE) FROM f
        |UNION ALL SELECT 'status_real_in_progress', 1.0
        |UNION ALL SELECT 'status_real_trained_at_swap', 1.0
        |UNION ALL SELECT 'status_real_complete', 1.0
        |UNION ALL SELECT 'train_real_two_level',
        |  CAST(CASE WHEN (CAST(trunc((CAST(4294967296 AS DOUBLE)
        |    / (live * dim * 4 * 3)) * live) AS BIGINT) // nlist) < 39
        |    THEN 1 ELSE 0 END AS DOUBLE) FROM f
        |UNION ALL SELECT 'train_real_trained', 1.0
        |UNION ALL SELECT 'train_real_trained_on', CAST(live AS DOUBLE) FROM f
        |UNION ALL SELECT 'train_real_new', 0.0
        |UNION ALL SELECT 'train_real_removed', 0.0
        |UNION ALL SELECT 'train_real_nlist', CAST(nlist AS DOUBLE) FROM f
        |UNION ALL SELECT 'train_real_nprobe',
        |  CAST(greatest(1, CAST(trunc(factor * nlist) AS BIGINT)) AS DOUBLE) FROM f
        |UNION ALL SELECT 'train_real_coverage', 1.0
        |UNION ALL SELECT 'posttrain_add_live', CAST(live + 10 AS DOUBLE) FROM f
        |UNION ALL SELECT 'posttrain_add_new', 10.0
        |UNION ALL SELECT 'posttrain_add_max_id', CAST(c + 9 AS DOUBLE) FROM f
        |UNION ALL SELECT 'posttrain_coverage',
        |  round(CAST(live AS DOUBLE) / (live + 10), 6) FROM f
        |UNION ALL SELECT 'posttrain_autotrain_due', 0.0
        |UNION ALL SELECT 'async_status_in_progress', 1.0
        |UNION ALL SELECT 'async_double_train_rejected', 1.0
        |UNION ALL SELECT 'async_status_complete', 1.0
        |UNION ALL SELECT 'async_retrain_trained_on', CAST(live + 10 AS DOUBLE) FROM f
        |UNION ALL SELECT 'async_retrain_new', 0.0
        |UNION ALL SELECT 'drop_during_train_status_cleared', 1.0
        |UNION ALL SELECT 'cache_view_has_db', 1.0
        |UNION ALL SELECT 'cache_view_mem_positive', 1.0
        |UNION ALL SELECT 'cache_removed', 1.0
        |UNION ALL SELECT 'cache_reload_rows', 5.0""".stripMargin
        .replace("FACTOR_EXPR", nprobeFactorSql("nlist")),

    // M1 — the REST transport matrix: every value is a route-behavior
    // flag or closed-form from count(*) (the corpus rides in over HTTP).
    "rest_api" ->
      """WITH s AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM embeddings)
        |SELECT 'health_ok' AS metric, 1.0 AS value FROM s
        |UNION ALL SELECT 'create_ok', 1.0
        |UNION ALL SELECT 'dup_create_rejected', 1.0
        |UNION ALL SELECT 'bad_name_rejected', 1.0
        |UNION ALL SELECT 'add_rows', c FROM s
        |UNION ALL SELECT 'info_dim', 64.0
        |UNION ALL SELECT 'info_trained', 0.0
        |UNION ALL SELECT 'info_envelope_is_string', 1.0
        |UNION ALL SELECT 'query_rows', 5.0
        |UNION ALL SELECT 'query_top1_id', 0.0
        |UNION ALL SELECT 'query_top1_sim_is_1', 1.0
        |UNION ALL SELECT 'query_meta_roundtrip', 1.0
        |UNION ALL SELECT 'query_matches_hits', 1.0
        |UNION ALL SELECT 'query_missing_404', 1.0
        |UNION ALL SELECT 'query_dim_400', 1.0
        |UNION ALL SELECT 'remove_removed', 1.0
        |UNION ALL SELECT 'remove_live', c - 2 FROM s
        |UNION ALL SELECT 'remove_negative_400', 1.0
        |UNION ALL SELECT 'train_status_initial', 1.0
        |UNION ALL SELECT 'save_ok', 1.0
        |UNION ALL SELECT 'reload_ok', 1.0
        |UNION ALL SELECT 'view_cache_ok', 1.0
        |UNION ALL SELECT 'mem_update_applied', 1.0
        |UNION ALL SELECT 'remove_from_cache_ok', 1.0
        |UNION ALL SELECT 'initial_queue_empty', 0.0
        |UNION ALL SELECT 'sweep_queue_empty', 0.0
        |UNION ALL SELECT 'spaces_name_ok', 1.0
        |UNION ALL SELECT 'delete_ok', 1.0
        |UNION ALL SELECT 'deleted_info_404', 1.0
        |UNION ALL SELECT 'deleted_delete_404', 1.0""".stripMargin,

    // M3/M4 auto-(re)train trigger formulas over the churn grid: coverage
    // (trained−removed)/(trained+fresh), initial-train at n ≥ 25000,
    // retrain at n ≥ 25000 ∧ coverage ≤ 0.5, and the in-progress guard
    // always blocking — recomputed closed-form.
    "retrain_decisions" ->
      """WITH g AS (
        |  SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) * m AS trained_on,
        |         rem, newp
        |  FROM (SELECT unnest([1, 100, 10000]) AS m),
        |       (SELECT unnest([0, 25, 50, 75]) AS rem),
        |       (SELECT unnest([0, 50, 200]) AS newp)),
        |c AS (
        |  SELECT trained_on, trained_on * rem // 100 AS removed,
        |         trained_on * newp // 100 AS fresh
        |  FROM g)
        |SELECT trained_on, removed, fresh,
        |  trained_on - removed + fresh AS n_live,
        |  CAST(CASE WHEN trained_on - removed + fresh >= 25000
        |       THEN 1 ELSE 0 END AS BIGINT) AS needs_initial,
        |  CAST(CASE WHEN trained_on - removed + fresh >= 25000
        |        AND CAST(trained_on - removed AS DOUBLE) / (trained_on + fresh) <= 0.5
        |       THEN 1 ELSE 0 END AS BIGINT) AS needs_retrain,
        |  CAST(0 AS BIGINT) AS retrain_blocked_in_progress,
        |  round(CAST(trained_on - removed AS DOUBLE) / (trained_on + fresh), 6)
        |    AS coverage
        |FROM c""".stripMargin,

    // Gap sessionization (30-min idle rule) rolled up per session. µs is
    // the exact common time precision: DuckDB floor-truncates the ns
    // parquet to µs TIMESTAMP, Spark floor-divs the ns long by 1000.
    "sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus, value FROM events),
        |m AS (
        |  SELECT *, CASE WHEN lag(tus) OVER w IS NULL
        |                   OR tus - lag(tus) OVER w > 1800000000
        |            THEN 1 ELSE 0 END AS is_start
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |sx AS (
        |  SELECT *, CAST(sum(is_start) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS session_idx
        |  FROM m)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value,
        |  min(tus) AS start_us, max(tus) - min(tus) AS duration_us
        |FROM sx GROUP BY user_id, session_idx""".stripMargin,

    // JSON round-trip: the Spark side aggregates a JSON re-stage of the
    // events table; the oracle aggregates the parquet directly — any
    // parse/serialize drift (longs, doubles, µs timestamps) breaks it.
    "json_source" ->
      """SELECT event_type, count(*) AS cnt,
        |  round(sum(value), 2) AS sum_value,
        |  min(event_id) AS min_id, max(event_id) AS max_id,
        |  min(epoch_us(ts)) AS min_tus, max(epoch_us(ts)) AS max_tus
        |FROM events GROUP BY event_type""".stripMargin,

    "csv_source" ->
      """SELECT source, count(*) AS cnt,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id,
        |  round(avg(length(text)), 2) AS avg_len,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM documents GROUP BY source""".stripMargin,

    // KMV k-minimum-values: rank distinct token hashes per source, keep
    // the 64 smallest; estimate = 63*P / h_(64) (or the exact count when
    // a source has < 64 distinct hashes). Same 60-bit md5 parse as the
    // minhash rows; P = 2147483647.
    "kmv_distinct" ->
      """WITH tk AS (
        |  SELECT source, unnest(list_filter(
        |    regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '')) AS tok
        |  FROM documents WHERE text IS NOT NULL),
        |ex AS (
        |  SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct_exact
        |  FROM tk GROUP BY source),
        |vh AS (
        |  SELECT DISTINCT source,
        |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 2147483647 AS h
        |  FROM (SELECT DISTINCT source, tok FROM tk)),
        |rk AS (
        |  SELECT source, h,
        |    row_number() OVER (PARTITION BY source ORDER BY h) AS r
        |  FROM vh),
        |sk AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS kmv_k,
        |    max(h) AS kth_min,
        |    round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
        |      ELSE 63.0 * 2147483647.0 / max(h) END, 2) AS kmv_estimate
        |  FROM rk WHERE r <= 64 GROUP BY source)
        |SELECT source, n_distinct_exact, kmv_k, kth_min, kmv_estimate
        |FROM ex JOIN sk USING (source)""".stripMargin,

    // sketch merge replay: per-source 64-min lists, pairwise union's
    // k-th value as tau, J = |intersect <= tau| / |union list|
    "kmv_overlap" ->
      """WITH tk AS (
        |  SELECT source, unnest(list_filter(
        |    regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '')) AS tok
        |  FROM documents WHERE text IS NOT NULL),
        |vh AS (
        |  SELECT DISTINCT source,
        |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 2147483647 AS h
        |  FROM (SELECT DISTINCT source, tok FROM tk)),
        |rk AS (
        |  SELECT source, h,
        |    row_number() OVER (PARTITION BY source ORDER BY h) AS r
        |  FROM vh),
        |sk AS (
        |  SELECT source, list(h ORDER BY h) AS kmins
        |  FROM rk WHERE r <= 64 GROUP BY source),
        |pr AS (
        |  SELECT a.source AS group_a, b.source AS group_b,
        |    list_sort(list_distinct(a.kmins || b.kmins))[1:64] AS u,
        |    a.kmins AS ka, b.kmins AS kb
        |  FROM sk a JOIN sk b ON a.source < b.source)
        |SELECT group_a, group_b,
        |  CAST(len(u) AS BIGINT) AS union_k,
        |  round(CAST(len(list_filter(list_intersect(ka, kb),
        |      x -> x <= u[len(u)])) AS DOUBLE) / len(u), 6) AS jaccard_est,
        |  round(CASE WHEN len(u) < 64 THEN CAST(len(u) AS DOUBLE)
        |    ELSE 63.0 * 2147483647.0 / u[len(u)] END, 2) AS union_est
        |FROM pr""".stripMargin,

    // quality formula = the quality_score row's; dup_docs counts docs
    // whose md5(text) repeats CORPUS-wide (null text never a dup)
    "corpus_report" ->
      """WITH q AS (
        |  SELECT doc_id, source, lang, n_chars,
        |    CASE WHEN text IS NOT NULL THEN
        |      len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                      x -> x <> '')) ELSE 0 END AS n_toks,
        |    CASE WHEN text IS NOT NULL THEN
        |        0.4 * least(CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> t IN ('the','a','and','of','to','in','is','it'))) AS DOUBLE) / greatest(len(regexp_split_to_array(trim(lower(text)), '\s+')), 1) * 4.0, 1.0)
        |      + 0.4 * least(CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS DOUBLE) / 100.0, 1.0)
        |      + 0.2 * (1.0 - CAST(length(lower(text)) - length(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g')) AS DOUBLE) / greatest(length(lower(text)), 1))
        |      ELSE NULL END AS quality,
        |    CASE WHEN text IS NOT NULL THEN md5(text) END AS h
        |  FROM documents),
        |dc AS (SELECT h, count(*) AS h_n FROM q WHERE h IS NOT NULL GROUP BY h)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  round(avg(quality), 6) AS avg_quality,
        |  CAST(count(CASE WHEN h_n > 1 THEN 1 END) AS BIGINT) AS dup_docs,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM q LEFT JOIN dc USING (h)
        |GROUP BY source""".stripMargin,

    "partitioned_sink" ->
      """SELECT lang, count(*) AS cnt,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id,
        |  round(avg(length(text)), 2) AS avg_len,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        |FROM documents GROUP BY lang""".stripMargin,

    "orc_source" ->
      """SELECT source, count(*) AS cnt,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id,
        |  round(avg(length(text)), 2) AS avg_len,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM documents GROUP BY source""".stripMargin,

    "funnel_steps" ->
      """WITH ev AS (
        |  SELECT user_id, event_type AS et, epoch_us(ts) AS tus FROM events),
        |t1 AS (
        |  SELECT user_id, min(tus) AS s1_us FROM ev WHERE et = 'view'
        |  GROUP BY 1),
        |t2 AS (
        |  SELECT e.user_id, min(e.tus) AS s2_us
        |  FROM ev e JOIN t1 USING (user_id)
        |  WHERE e.et = 'click' AND e.tus > t1.s1_us GROUP BY 1),
        |t3 AS (
        |  SELECT e.user_id, min(e.tus) AS s3_us
        |  FROM ev e JOIN t2 USING (user_id)
        |  WHERE e.et = 'purchase' AND e.tus > t2.s2_us GROUP BY 1)
        |SELECT u.user_id, t1.s1_us, t2.s2_us, t3.s3_us,
        |  CASE WHEN t3.s3_us IS NOT NULL THEN 3
        |       WHEN t2.s2_us IS NOT NULL THEN 2
        |       WHEN t1.s1_us IS NOT NULL THEN 1 ELSE 0 END AS steps_completed
        |FROM (SELECT DISTINCT user_id FROM ev) u
        |LEFT JOIN t1 USING (user_id)
        |LEFT JOIN t2 USING (user_id)
        |LEFT JOIN t3 USING (user_id)""".stripMargin,

    // Sliding rows-frame + running total per user (both frames share one
    // exchange + sort).
    "rolling_stats" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS tus, value FROM events)
        |SELECT event_id, user_id,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS avg5,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS UNBOUNDED PRECEDING), 6) AS cum_value
        |FROM e""".stripMargin,

    // Content-addressed per-source downsampling: even-numbered sources
    // keep 20%, odd keep 80% of their md5 buckets.
    "stratified_sample" ->
      """SELECT doc_id, source, bucket, rate FROM (
        |  SELECT doc_id, source,
        |    ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS bucket,
        |    CASE WHEN CAST(regexp_extract(source, '(\d+)$', 1) AS BIGINT) % 2 = 0
        |         THEN 20 ELSE 80 END AS rate
        |  FROM documents)
        |WHERE bucket < rate""".stripMargin,

    // Frame-sampling schedule from the md5-derived video fields the
    // synthesized MP4s carry (same closed forms as multimodal_video);
    // pts uses the per-frame stts delta = timescale // 24.
    "frame_sample" ->
      """SELECT doc_id, i AS sample_idx,
        |  (i * nf) // 4 AS frame_idx,
        |  ((i * nf) // 4) * (tsc // 24) * 1000 // tsc AS pts_ms
        |FROM (
        |  SELECT doc_id, 24 + ('0x' || substr(h, 6, 2))::BIGINT AS nf,
        |    600 * (1 + ('0x' || substr(h, 5, 1))::BIGINT % 4) AS tsc
        |  FROM (SELECT doc_id, md5(text) AS h FROM documents
        |        WHERE text IS NOT NULL)),
        |  generate_series(0, 3) t(i)""".stripMargin,

    "event_pivot" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup
        |FROM events GROUP BY user_id""".stripMargin,

    // Streaming session_window vs the batch gap rule: identical sessions
    // for every session CLOSED by end-of-stream (last + gap ≤ global
    // max); open sessions are each user's last, so the emitted prefix's
    // session_idx numbering agrees with the batch operator's.
    "streaming_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus, value FROM events),
        |m AS (
        |  SELECT *, CASE WHEN lag(tus) OVER w IS NULL
        |                   OR tus - lag(tus) OVER w > 1800000000
        |            THEN 1 ELSE 0 END AS is_start
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |sx AS (
        |  SELECT *, CAST(sum(is_start) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS session_idx
        |  FROM m),
        |g AS (
        |  SELECT user_id, session_idx, count(*) AS n_events,
        |    round(sum(value), 2) AS sum_value,
        |    min(tus) AS start_us, max(tus) - min(tus) AS duration_us,
        |    max(tus) AS last_us
        |  FROM sx GROUP BY user_id, session_idx),
        |mx AS (SELECT max(tus) AS m FROM e)
        |SELECT user_id, session_idx, n_events, sum_value, start_us, duration_us
        |FROM g, mx WHERE last_us + 1800000000 <= m""".stripMargin,

    // As-of join gated against DuckDB's NATIVE ASOF LEFT JOIN — the
    // operator's boundary semantics (build row AT the probe timestamp is
    // visible) must match the reference implementation's `>=`.
    "asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS tus, event_type FROM events),
        |c AS (SELECT event_id, user_id, tus FROM e WHERE event_type = 'click'),
        |r AS (SELECT event_id AS err_event_id, user_id, tus AS err_us
        |      FROM e WHERE event_type = 'error')
        |SELECT c.event_id, c.user_id, r.err_event_id,
        |  c.tus - r.err_us AS us_since_error
        |FROM c ASOF LEFT JOIN r
        |  ON c.user_id = r.user_id AND c.tus >= r.err_us""".stripMargin,

    "json_props" ->
      """SELECT event_type, count(*) AS cnt,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS parsed,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,

    // Attribution-window range join: clicks within the 10 min preceding
    // each purchase (inclusive both ends), 0 for none. The oracle states
    // the range predicate directly; the Spark side is the bucketed
    // two-probe formulation — the hash gates their equivalence.
    "range_join_count" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS tus, event_type FROM events),
        |p AS (SELECT event_id, user_id, tus FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, tus AS ctus FROM e WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id,
        |  count(c.ctus) AS clicks_10m
        |FROM p LEFT JOIN c
        |  ON p.user_id = c.user_id
        | AND c.ctus BETWEEN p.tus - 600000000 AND p.tus
        |GROUP BY p.event_id, p.user_id""".stripMargin,

    // M7/M8 LRU cache script: a/b/c/d costs are the memory-model
    // estimates (flat n, trained n, flat 2n, b+c) — fill, touch a,
    // evicting insert (exactly 2 victims), protect a, shrink to the
    // empty-db floor. Scale-independent arithmetic; see Queries.cacheLru.
    "cache_lru" ->
      """WITH s AS (SELECT count(*) AS n FROM embeddings),
        |m AS (SELECT n, n * 256 + 240090 AS a, n * 16 + 261888 AS b,
        |             2 * n * 256 + 240090 AS c FROM s)
        |SELECT 'fill_size' AS metric, 3.0 AS value FROM m
        |UNION ALL SELECT 'fill_mem', CAST(a + b + c AS DOUBLE) FROM m
        |UNION ALL SELECT 'hit_a', 1.0
        |UNION ALL SELECT 'insert_size', 2.0
        |UNION ALL SELECT 'insert_mem', CAST(a + b + c AS DOUBLE) FROM m
        |UNION ALL SELECT 'a_survives', 1.0
        |UNION ALL SELECT 'b_evicted', 1.0
        |UNION ALL SELECT 'c_evicted', 1.0
        |UNION ALL SELECT 'shrink_size', 1.0
        |UNION ALL SELECT 'shrink_mem', CAST(a AS DOUBLE) FROM m
        |UNION ALL SELECT 'protected_survives', 1.0
        |UNION ALL SELECT 'evict_count', 3.0""".stripMargin,

    // Boilerplate 5-grams by document frequency (distinct grams per doc —
    // same shingle CTE shape as `contamination`).
    "boilerplate_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, CASE WHEN len(w) >= 5 THEN
        |      list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
        |        for i in generate_series(1, len(w)-4)])
        |    ELSE [array_to_string(w, ' ')] END AS g
        |  FROM toks),
        |grams AS (SELECT doc_id, unnest(g) AS gram FROM sh)
        |SELECT gram, count(*) AS df FROM grams
        |GROUP BY gram HAVING count(*) >= 2""".stripMargin,

    "dataset_split" ->
      """SELECT doc_id, b AS bucket,
        |  CASE WHEN b IS NULL THEN NULL
        |       WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'validation'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS b
        |      FROM documents)""".stripMargin,

    "contamination" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, CASE WHEN len(w) >= 5 THEN
        |      list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
        |        for i in generate_series(1, len(w)-4)])
        |    ELSE [array_to_string(w, ' ')] END AS g
        |  FROM toks),
        |bench AS (SELECT DISTINCT unnest(g) AS gram FROM sh WHERE doc_id < 20),
        |corpus AS (SELECT doc_id, unnest(g) AS gram FROM sh WHERE doc_id >= 20),
        |hits AS (
        |  SELECT c.doc_id, count(*) AS hits
        |  FROM corpus c JOIN bench b ON c.gram = b.gram GROUP BY c.doc_id)
        |SELECT d.doc_id, coalesce(h.hits, 0) AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id >= 20) d
        |LEFT JOIN hits h ON d.doc_id = h.doc_id""".stripMargin,

    "repetition_score" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |dup AS (
        |  SELECT doc_id,
        |    round(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / greatest(len(w), 1), 6)
        |      AS dup_word_frac
        |  FROM toks),
        |bg AS (
        |  SELECT doc_id,
        |    unnest([w[i] || ' ' || w[i+1] for i in generate_series(1, len(w)-1)]) AS g
        |  FROM toks WHERE len(w) >= 2),
        |cnt AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
        |top AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM cnt GROUP BY doc_id)
        |SELECT d.doc_id, d.dup_word_frac,
        |  round(coalesce(CAST(t.mx AS DOUBLE) / t.tot, 0), 6) AS top_bigram_frac
        |FROM dup d LEFT JOIN top t ON d.doc_id = t.doc_id""".stripMargin,

    "embed_quantize" ->
      """SELECT vec_id, round(scale, 6) AS scale,
        |  CAST(list_sum([CAST(round(CASE WHEN scale = 0 THEN 0
        |      ELSE CAST(x AS DOUBLE) * 127.0 / scale END) AS BIGINT)
        |    for x in embedding]) AS BIGINT) AS q_sum,
        |  CAST(list_sum([abs(CAST(round(CASE WHEN scale = 0 THEN 0
        |      ELSE CAST(x AS DOUBLE) * 127.0 / scale END) AS BIGINT))
        |    for x in embedding]) AS BIGINT) AS q_abs_sum,
        |  CAST(round(CASE WHEN scale = 0 THEN 0
        |      ELSE CAST(embedding[1] AS DOUBLE) * 127.0 / scale END) AS BIGINT) AS q_first,
        |  CAST(round(CASE WHEN scale = 0 THEN 0
        |      ELSE CAST(embedding[len(embedding)] AS DOUBLE) * 127.0 / scale END) AS BIGINT) AS q_last
        |FROM (SELECT vec_id, embedding,
        |        list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS scale
        |      FROM embeddings)""".stripMargin,

    // Perplexity proxy: mean ln(cnt/total) per doc under the corpus's own
    // unigram frequency table. ln and the int→double division are exact
    // on both engines; the avg's fold-order noise (~1e-15) dies at 6dp.
    "unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents WHERE text IS NOT NULL),
        |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        |tot AS (SELECT sum(cnt) AS t FROM freq)
        |SELECT doc_id, count(*) AS n_toks,
        |  round(avg(ln(CAST(cnt AS DOUBLE) / t)), 6) AS logprob
        |FROM toks JOIN freq USING (tok), tot
        |GROUP BY doc_id""".stripMargin,

    // Closed-form replay of index/Heuristics.scala + index/MemoryModel.scala
    // (which are behavioral parity with the reference's published formulas):
    // truncations via trunc(), integer divisions via //, identical double
    // ops (pow/ln) — 72-point JVM↔DuckDB parity verified on this grid.
    "heuristics_goldens" ->
      """WITH grid AS (
        |  SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) * m AS n, d
        |  FROM (SELECT unnest([1, 10, 100, 1000, 10000, 100000]) AS m),
        |       (SELECT unnest([64, 256, 768, 1536]) AS d)
        |  UNION ALL
        |  SELECT unnest([5000000, 1000000]) AS n, 768 AS d),
        |base AS (
        |  SELECT n, d,
        |    CAST(trunc(pow(CAST(n AS DOUBLE), 0.75) * 0.2) AS BIGINT) AS nlist,
        |    CASE WHEN d < 150 THEN greatest(64, d) WHEN d < 300 THEN 128
        |         WHEN d < 1000 THEN 256 WHEN d < 2000 THEN 512 ELSE 1024 END AS pca_dim,
        |    CASE WHEN d < 150 THEN greatest(64, d) WHEN d < 300 THEN 64
        |         WHEN d < 1000 THEN 128 WHEN d < 2000 THEN 256 ELSE 512 END AS opq_dim,
        |    CASE WHEN d < 300 THEN 16 WHEN d < 2000 THEN 32 ELSE 128 END AS pq_bytes
        |  FROM grid),
        |np AS (
        |  SELECT *, FACTOR_EXPR AS factor
        |  FROM base)
        |SELECT n, CAST(d AS BIGINT) AS d, nlist,
        |  CAST(trunc(factor * nlist) AS BIGINT) AS nprobe,
        |  n * d * 4 * 3 AS training_mem_bytes,
        |  CAST(ceil(n * d * 4.0 / (4294967296 / 4.0)) AS BIGINT) AS num_batches,
        |  4294967296 // (d * 4 * 3) // 4 AS vectors_per_batch,
        |  n * d * 4 + 240090 AS flat_bytes,
        |  n * (pq_bytes + 8) + CASE d WHEN 256 THEN 1479168 WHEN 512 THEN 2529792
        |    WHEN 768 THEN 4104704 WHEN 1024 THEN 6203904 ELSE d * 4092 END AS trained_bytes,
        |  CAST(pca_dim AS BIGINT) AS pca_dim, CAST(opq_dim AS BIGINT) AS opq_dim,
        |  CAST(pq_bytes AS BIGINT) AS pq_bytes,
        |  round(CAST(n - n // 100 AS DOUBLE) / (n + n // 10), 6) AS coverage,
        |  CAST(CASE WHEN (CAST(trunc((CAST(4294967296 AS DOUBLE) / (n * d * 4 * 3)) * n) AS BIGINT)
        |             // nlist) < 39 THEN 1 ELSE 0 END AS BIGINT) AS two_level,
        |  CAST(CASE WHEN n >= 25000 THEN 1 ELSE 0 END AS BIGINT) AS needs_initial_train
        |FROM np""".stripMargin
        .replace("FACTOR_EXPR", nprobeFactorSql("nlist")),

    // M9 info endpoint on the lifecycle db (500 adds, 8 deletes, never
    // trained): untrained sentinel fields are -1 per the catalog defaults;
    // memory is the flat-index model n*d*4 + 240090 over live counts.
    "db_info" ->
      """WITH s AS (SELECT count(*) AS c, max(len(embedding)) AS dim FROM embeddings)
        |SELECT 'num_vectors' AS metric, CAST(c - 8 AS DOUBLE) AS value FROM s
        |UNION ALL SELECT 'vector_dimension', CAST(dim AS DOUBLE) FROM s
        |UNION ALL SELECT 'max_id', CAST(c - 1 AS DOUBLE) FROM s
        |UNION ALL SELECT 'trained', 0.0
        |UNION ALL SELECT 'max_trained_id', -1.0
        |UNION ALL SELECT 'num_vectors_trained_on', 0.0
        |UNION ALL SELECT 'num_trained_vectors_removed', 0.0
        |UNION ALL SELECT 'num_new_vectors', CAST(c - 8 AS DOUBLE) FROM s
        |UNION ALL SELECT 'num_pending_deletes', 8.0
        |UNION ALL SELECT 'coverage_ratio', 0.0
        |UNION ALL SELECT 'num_clusters', -1.0
        |UNION ALL SELECT 'n_probe', -1.0
        |UNION ALL SELECT 'index_memory_bytes',
        |  CAST((c - 8) * dim * 4 + 240090 AS DOUBLE) FROM s""".stripMargin,

    // T19/A8/D5/M2/M8 — info endpoint on the trained fixture: the fixture
    // trains on exactly the embeddings table (no deletes, no post-train
    // adds), so every counter, the chosen nlist/nprobe heuristics, and the
    // trained-index memory model are closed-form from count(*). pq bytes
    // is the fixture's fixed 8; dim 64 takes the d*4092 constant branch.
    "trained_counters" ->
      """WITH s AS (SELECT count(*) AS c, max(len(embedding)) AS dim FROM embeddings),
        |nl AS (SELECT c, dim,
        |  greatest(1, CAST(trunc(pow(CAST(c AS DOUBLE), 0.75) * 0.2) AS BIGINT)) AS nlist
        |  FROM s),
        |np AS (SELECT c, dim, nlist, FACTOR_EXPR AS factor FROM nl)
        |SELECT 'num_vectors' AS metric, CAST(c AS DOUBLE) AS value FROM np
        |UNION ALL SELECT 'vector_dimension', CAST(dim AS DOUBLE) FROM np
        |UNION ALL SELECT 'max_id', CAST(c - 1 AS DOUBLE) FROM np
        |UNION ALL SELECT 'trained', 1.0
        |UNION ALL SELECT 'max_trained_id', CAST(c - 1 AS DOUBLE) FROM np
        |UNION ALL SELECT 'num_vectors_trained_on', CAST(c AS DOUBLE) FROM np
        |UNION ALL SELECT 'num_trained_vectors_removed', 0.0
        |UNION ALL SELECT 'num_new_vectors', 0.0
        |UNION ALL SELECT 'num_pending_deletes', 0.0
        |UNION ALL SELECT 'coverage_ratio', 1.0
        |UNION ALL SELECT 'num_clusters', CAST(nlist AS DOUBLE) FROM np
        |UNION ALL SELECT 'n_probe',
        |  CAST(greatest(1, CAST(trunc(factor * nlist) AS BIGINT)) AS DOUBLE) FROM np
        |UNION ALL SELECT 'index_memory_bytes',
        |  CAST(c * (8 + 8) + CASE dim WHEN 256 THEN 1479168 WHEN 512 THEN 2529792
        |    WHEN 768 THEN 4104704 WHEN 1024 THEN 6203904
        |    ELSE dim * 4092 END AS DOUBLE) FROM np""".stripMargin
        .replace("FACTOR_EXPR", nprobeFactorSql("nlist"))
  )

  def oracleSql: Map[String, String] = staticOracleSql ++ {
    // The trained-fixture SQL inlines the actually-trained model, so it
    // exists only after the trained queries have run (Verify runs every
    // query before dumping this map). Fail fast on out-of-order reads —
    // silently omitting the keys would downgrade trained_adc_topk /
    // trained_knn to a rows-only check without anyone noticing.
    val sql = graft.queries.TrainedFixture.oracleSql.toMap
    require(sql.contains("trained_adc_topk") && sql.contains("trained_knn"),
      "oracleSql read before the trained fixture built — run queries first " +
        "(Verify does) so the trained oracle SQL exists")
    sql
  }
}
