package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.{Catalog, CatalogDoc}
import graft.functions.VectorFunctions._
import graft.index._

/** The engine facade — Spark-native re-expression of the reference's
  * `minDB` class + FastAPI service verbs (minDB mindb.py:42-572,
  * api/fastapi.py): named databases of `(id, vector, metadata)` with an
  * optional PCA→IVF→PQ index, two-stage ANN query (compressed coarse
  * search then exact rerank — mindb.py:368-442), sequential id assignment,
  * delete with trained/new counter bookkeeping, and coverage-ratio-driven
  * retraining.
  *
  * Architectural translation (SURVEY §1.3/§4): LMDB row-KV → Parquet
  * columnar snapshots; Faiss index file → centroid/codebook/PCA DataFrames
  * + a PQ-coded table in a bucketed IVF layout — `2^shift` consecutive
  * clusters per `cluster_bucket` hive dir, rows sorted by `cluster_id`
  * within each ~32 MB file ([[Engine.codedBucketShift]]), so probe
  * pruning runs on partition dirs first and parquet row-group/page stats
  * second while file count tracks data bytes, not nlist; locks/queues/
  * dual-writes → immutable versioned tables with an atomic catalog
  * pointer swap.
  */
class Engine(val spark: SparkSession, val root: String) {
  import Engine._

  /** The catalog/maintenance layer resolves every path through the Hadoop
    * [[org.apache.hadoop.fs.FileSystem]] for `root`'s scheme — the engine
    * root can be `file:`, `hdfs:`, or `s3a:` and the catalog json, the
    * atomic pointer swap, version sweeping, and the bin-packing trigger
    * all work there (HadoopRootSpec runs the full lifecycle against an
    * explicit `file:`-scheme root). Public so callers/specs can share it.
    */
  implicit val hadoopConf: org.apache.hadoop.conf.Configuration =
    spark.sparkContext.hadoopConfiguration

  private def fsFor(p: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(hadoopConf)

  /** One executor-side broadcast of the index artifacts per (db, version),
    * reused by every query against that version — the serving path never
    * ships anything whose size depends on nprobe or q per query (the
    * round-4 scale-killer: per-query ADC LUT broadcasts of nprobe·m·256
    * doubles ≈ 400 MB at the reference's nlist=200k heuristic scale).
    * Stale versions are unpersisted (not destroyed — in-flight queries
    * planned against them may still re-fetch lazily). Bounded by the SAME
    * budget as [[indexCache]]: its eviction hook drops the matching
    * broadcast, so a cold db releases its driver-side model copy too.
    */
  private val modelBcCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int), org.apache.spark.broadcast.Broadcast[IndexModel]]

  /** Cached coded-table DataFrame per (db, indexVersion): the frame owns
    * its resolved FileIndex, so the nlist-sized partition-directory
    * listing (6k+ directories at the 1M-row heuristic scale — seconds of
    * driver time) happens once per version instead of on every query.
    * Partition pruning still applies per query via `cluster_id` filters.
    * Invalidated on same-version appends (new files) and swept together
    * with the model broadcasts.
    */
  private val codedDfCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int), DataFrame]

  /** [[codedDfCache]]'s twin for the SERVING session (the internal
    * per-query coarse scans) — same keys, invalidated together.
    */
  private val codedDfServingCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int), DataFrame]

  /** [[ServingScan.Epoch]] per (db, indexVersion) — the plan-free coarse
    * scan's amortized driver state (one conf broadcast, one bucket→file
    * listing). Same keys and invalidation sites as [[codedDfServingCache]]
    * (the listing has exactly the cached FileIndex's staleness rules,
    * including the same-version post-train append).
    */
  private val servingScanCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int), ServingScan.Epoch]

  private def dropServingScanEpoch(k: (String, Int)): Unit =
    servingScanCache.remove(k).foreach(_.close())

  /** M7 — LRU over loaded index artifacts, bounded by their actual driver
    * footprint (reference cache/cache.py:5-102; the M8 estimator backs the
    * info endpoint, MemoryModel.scala). Evicting a model also unpersists
    * its broadcast — the two caches share one memory budget.
    */
  private val indexCache = new LruCache[(String, Int), IndexModel](
    Engine.DefaultMaxMemoryUsage, Engine.modelBytes,
    onEvict = (k, _) => {
      modelBcCache.remove(k).foreach(_.unpersist(false))
      codedDfCache.remove(k)
      codedDfServingCache.remove(k)
      dropServingScanEpoch(k)
      // a cold db releases its auto-routed serving blocks too (same
      // budget story as the model broadcast)
      autoPrepared.get(k._1).filter(_.pinned.indexVersion == k._2)
        .foreach { p => autoPrepared.remove(k._1, p); p.close() }
    })
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Serving handles owned by [[query]]'s prepared auto-routing, one per
    * db; rebuilt when the catalog doc shows a moved version and released
    * with the model cache entry / on drop. `autoRoutePrepared = false`
    * turns the routing off engine-wide (specs, plan-inspection callers).
    */
  private val autoPrepared =
    scala.collection.concurrent.TrieMap.empty[String, PreparedIndex]
  private val prepareLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]
  @volatile var autoRoutePrepared: Boolean = true

  /** r18 (VERDICT r17 next #2): [[queryCatalyst]]'s no-predicate trained
    * branch serves through the engine's auto-prepared handle when one is
    * ALREADY WARM and its blocks exactly cover the freshly-loaded doc
    * (never builds one, never relaxes queryCatalyst's read-your-writes
    * visibility — [[PreparedIndex.coversAddsOf]]). The returned frame is
    * the same local relation the plan-free path builds, bit-identical by
    * the prepared equality gates, but the candidate work runs over the
    * handle's in-memory decoded blocks instead of re-decoding ~4 task-
    * seconds of probed parquet per query (EVAL_r17 35M: occupancy
    * 4,050 ms/query plan-free vs 153 prepared). OFF = the pure plan
    * path, required by every spec/eval that uses queryCatalyst as the
    * independent ground truth for the prepared path (comparing prepared
    * to prepared gates nothing).
    */
  @volatile var catalystWarmServe: Boolean = true

  /** r15 layout knob, off by default: when true, the NEXT train writes
    * the coded table with the PACKED code column (one BIGINT carrying up
    * to 8 code bytes) instead of `array<int>` — 2.2× the scan-decode
    * throughput at identical disk bytes (CodeLayoutProfile; PLANS.md).
    * Per-TABLE, recorded in the catalog (`codedPacked`) so appends,
    * compaction, and every reader follow the table's own layout
    * regardless of the knob's current value. Requires m ≤ 8.
    */
  @volatile var packedCodesOnTrain: Boolean = false

  /** A3 — opt-in flat-index memory guard (reference
    * input_validation.py:101-105 via training_utils.py:58-61): when set,
    * an [[add]] to an UNTRAINED db is rejected — nothing committed — if
    * the reference's flat-model estimate `(ids_ever_assigned + new)·d·4·3`
    * bytes would exceed the cap. Off by default: the flat path here is a
    * spilling parquet scan, not a resident Faiss index, so the reference's
    * RAM ceiling is not a real constraint — the knob exists for callers
    * that want reference-parity admission control. `ids_ever_assigned`
    * (maxId+1) upper-bounds the reference's live count: the guard can
    * only be MORE conservative after deletes, never admit more.
    */
  @volatile var flatAddMemoryGuardBytes: Option[Long] = None

  /** The warm handle serving `doc`'s exact version — build (or rebuild
    * after a swap) under a per-db lock so concurrent first queries share
    * one block build. The build lock is NOT [[dbLock]]: pinning blocks
    * runs a Spark job and must not stall adds/removes.
    */
  /** Adds-refresh debounce of the AUTO-built handle — a test seam
    * (CatalystWarmServeSpec pins read-your-writes with a debounce the
    * test provably cannot outrun).
    */
  protected def autoPreparedAddsRefreshMs: Long =
    Engine.PreparedAddsRefreshIntervalMs

  /** True when an auto-prepared handle exists for `name` (test seam:
    * queryCatalyst's warm-serve must never BUILD one).
    */
  private[core] def hasAutoPrepared(name: String): Boolean =
    autoPrepared.contains(name)

  private def autoPreparedFor(doc: CatalogDoc): PreparedIndex =
    autoPrepared.get(doc.name).filter(!_.isStaleFor(doc)).getOrElse {
      prepareLocks.getOrElseUpdate(doc.name, new Object).synchronized {
        autoPrepared.get(doc.name).filter(!_.isStaleFor(doc)).getOrElse {
          autoPrepared.remove(doc.name).foreach(_.close())
          val p = buildPrepared(doc.name, -1, autoPreparedAddsRefreshMs)
          // close any handle the publish displaces: after a drop+recreate
          // the OLD lock object is gone (delete() removes prepareLocks),
          // so a stale builder still holding it can race this publish —
          // whichever handle loses the put must not leak its pinned
          // blocks until engine shutdown
          autoPrepared.put(doc.name, p).foreach(_.close())
          // publish-then-recheck against a concurrent delete(): the drop
          // removes the catalog BEFORE sweeping autoPrepared, so if the
          // db vanished our just-published handle may have missed the
          // sweep — close it here instead of leaking its pinned blocks
          // until the engine dies. (A drop+recreate leaves a stale-but-
          // bounded handle: the next query's isStaleFor(createdAt)
          // rebuild closes it.)
          if (!exists(doc.name)) {
            autoPrepared.remove(doc.name, p)
            p.close()
            throw new IllegalArgumentException(
              s"database '${doc.name}' was dropped during prepare")
          }
          p
        }
      }
    }

  /** Compile a metadata predicate Column into a directly-evaluable
    * `(id, metadata) => Boolean` — the routed filtered path's replacement
    * for per-query Catalyst planning. The predicate is ANALYZED once
    * against the two-column candidate schema (same resolution + implicit
    * casts a real filter would get), bound, and then evaluated row-wise
    * over the in-memory preliminary candidates. Catalyst filter
    * semantics are preserved exactly: a row survives only when the
    * condition evaluates to TRUE (NULL and FALSE both drop it).
    *
    * `None` when the predicate doesn't resolve against (id, metadata) —
    * e.g. it references `vector` — in which case the caller serves
    * through the Catalyst path, where the full candidate schema is in
    * scope.
    */
  // compiled-predicate cache keyed by the (structural) unresolved
  // expression: a serving loop reusing one predicate must not re-pay the
  // ~50 ms Catalyst analysis per query — with it the routed filtered
  // floor would sit at 2x the unfiltered one. PER-THREAD, because the
  // compiled closure evaluates a shared interpreted Expression tree and
  // some eval nodes keep per-instance scratch state (json parsers,
  // cached regex) that must not be raced across concurrent queries —
  // each serving thread compiles once and reuses privately.
  // Nondeterministic predicates are never cached (reusing their
  // initialized instances would replay state) — detected on the RESOLVED
  // tree, because the unresolved one hides `expr("rand() < 0.5")` behind
  // an UnresolvedFunction node. Bounded per thread by clear-on-overflow
  // (predicate shapes per process are few).
  private val metaPredCache = ThreadLocal.withInitial(() =>
    scala.collection.mutable.HashMap
      .empty[org.apache.spark.sql.catalyst.expressions.Expression,
        Option[(Long, String) => Boolean]])

  private[core] def compileMetaPredicate(
      pred: Column): Option[(Long, String) => Boolean] = {
    val key = org.apache.spark.sql.graftbridge.Bridge.expression(pred)
    val cache = metaPredCache.get()
    cache.get(key) match {
      case Some(cached) => cached
      case None =>
        val (compiled, cacheable) = compileMetaPredicateUncached(pred)
        if (cacheable) {
          if (cache.size >= 64) cache.clear()
          cache.put(key, compiled)
        }
        compiled
    }
  }

  /** `(compiled, cacheable)` — `cacheable` is false exactly when the
    * resolved condition is nondeterministic (its initialized eval
    * instances must not be reused across queries).
    */
  private def compileMetaPredicateUncached(
      pred: Column): (Option[(Long, String) => Boolean], Boolean) = {
    import org.apache.spark.sql.catalyst.expressions.{BindReferences,
      CurrentDate, CurrentTimestamp, LocalTimestamp, Nondeterministic, Now,
      RuntimeReplaceable, Unevaluable}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    try {
      val empty = spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("metadata", StringType, nullable = true))))
      val analyzed = empty.filter(pred).queryExecution.analyzed
      analyzed.collectFirst { case f: LFilter => (f.condition, f.child.output) } match {
        case None => (None, true)
        case Some((cond, out)) =>
          val bound = BindReferences.bindReference(cond, out)
          // Nodes ANALYSIS accepts but direct eval can't serve (r13
          // ADVICE — these crashed query() at serve time where
          // queryCatalyst succeeded):
          //  - Unevaluable (subqueries, optimizer-only nodes);
          //  - RuntimeReplaceable (to_date, now(), …) — replaced only by
          //    the optimizer's ReplaceExpressions, eval ASSERTS;
          //  - the current-time family — evaluable per-row in Spark 4,
          //    but Catalyst pins ONE query-start value via
          //    ComputeCurrentTime, so per-row eval would diverge.
          // After binding every attribute is a BoundReference, so any
          // such node means "serve via Catalyst instead" (None is itself
          // cacheable: analysis is deterministic).
          val unservable = bound.exists {
            case _: Unevaluable | _: RuntimeReplaceable => true
            case _: CurrentDate | _: CurrentTimestamp | _: Now |
                _: LocalTimestamp => true
            case _ => false
          }
          if (unservable) (None, true)
          else {
            val nondet =
              bound.exists { case _: Nondeterministic => true; case _ => false }
            def init(): Unit = bound.foreach {
              case n: Nondeterministic => n.initialize(0)
              case _ => ()
            }
            init()
            val closure = (id: Long, meta: String) => {
              // fresh row per call: eval is re-entrant but the backing row
              // must not be shared across concurrent queries
              val row = new org.apache.spark.sql.catalyst.expressions
                .GenericInternalRow(Array[Any](id,
                  if (meta == null) null
                  else org.apache.spark.unsafe.types.UTF8String.fromString(meta)))
              bound.eval(row) == true
            }
            // trial eval: the safety net for any OTHER node class whose
            // eval throws outside execution — never learn that on a
            // serving thread. Re-initialize afterwards so nondeterministic
            // state is untouched by the probe.
            val servable =
              try { closure(0L, null); closure(1L, "{}"); true }
              catch { case scala.util.control.NonFatal(_) => false }
            init()
            if (!servable) (None, true)
            // nondeterministic closures are marked driver-only: their
            // initialized eval state must never serialize into a task
            // closure (the pushed under-fill round ships its predicate)
            else if (nondet) (Some(new Engine.DriverOnlyPredicate(closure)), false)
            else (Some(closure), true)
          }
      }
    } catch {
      case _: org.apache.spark.sql.AnalysisException => (None, true)
      case _: org.apache.spark.SparkException => (None, true)
    }
  }

  private def hitsDf(hits: Array[PreparedIndex.Hit]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(hits.map(h => org.apache.spark.sql.Row(
        h.rank, h.id, h.metadata, h.cosineSimilarity)): _*),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("metadata", StringType, nullable = true),
        StructField("cosine_similarity", DoubleType, nullable = false))))

  // The probe filter on the bucketed coded layout is `cluster_id IN
  // (…)`; a pushed In is what lets parquet page stats prune the
  // cluster_id-sorted files. Spark's default threshold (10) never
  // pushes a probe list — but the push compiles to a LEFT-NESTED OR
  // CHAIN whose evaluation recurses once per value, so a large
  // threshold is a StackOverflowError at scale (measured: a 40k-value
  // probe-union filter killed every scan task at 35M/nlist-91k).
  // 512 keeps the chain shallow; [[prunedLiveCoded]] chunks bigger
  // probe lists into ≤[[probePushChunk]]-value disjoint scans instead.
  spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "512")
  // Keep generated code LITERAL-FREE for list predicates: every query
  // carries fresh probe/candidate-id lists, and both the small-list `In`
  // codegen and `InSet`'s switch form inline the values into the
  // generated source — a Janino recompile per query (and per partition-
  // prune) instead of a cache hit. Converting at ≥2 values and disabling
  // the switch puts the values in `references` (the source text is
  // stable), trading a hash-set probe per row — noise next to the scan —
  // for zero steady-state compilation in the serving path.
  spark.conf.set("spark.sql.optimizer.inSetConversionThreshold", "1")
  spark.conf.set("spark.sql.optimizer.inSetSwitchThreshold", "0")

  /** Per-db monitor serializing every catalog read-modify-write (add,
    * remove, compact, the train swap, the post-train drain). The
    * reference serializes the same sections with its LMDB/faiss locks
    * (fastapi.py:23-28); queries stay lock-free — they read an immutable
    * snapshot resolved through one atomic catalog load.
    */
  private val dbLocks = scala.collection.concurrent.TrieMap.empty[String, Object]
  private def dbLock(name: String): Object =
    dbLocks.getOrElseUpdate(name, new Object)

  /** M5/M6 — training-operation status per db, reference parity with the
    * `operations` dict behind GET /db/{name}/train (fastapi.py:262-338):
    * "not started" → "in progress" → "trained" (index swapped, drain of
    * during-train adds running) → "complete"; "failed" on any error OR
    * when the train produced no new index (the reference's swap finds
    * `new_faiss_index is None` → "failed", which is also what its <5000
    * bypass reports).
    *
    * Each entry is tagged with the owning train's EPOCH: a train may only
    * transition the status it claimed. Reference parity allows a second
    * train to claim the slot once the first reaches "trained" (its drain
    * still running — fastapi.py:314-326 only rejects "in progress"), so
    * without the tag the first train's final "complete"/"failed" write
    * would clobber the second's "in progress" — silently disabling the
    * double-train guard and the compaction deferral while it runs.
    */
  private val trainOps = scala.collection.concurrent.TrieMap.empty[String, (Long, String)]
  private val trainEpoch = new java.util.concurrent.atomic.AtomicLong(0L)

  /** GET /db/{name}/train parity (fastapi.py:334-338). */
  def trainingStatus(name: String): String =
    trainOps.get(name).map(_._2).getOrElse("not started")

  /** Atomically claim the training slot (fastapi.py:314-326 rejects a
    * second train while one is in progress). Returns the claim's epoch —
    * the token every later status transition must present.
    */
  private def beginTraining(name: String): Long = dbLock(name).synchronized {
    if (trainingStatus(name) == "in progress")
      throw new Engine.AlreadyTrainingException(
        s"database '$name' is in the process of training already")
    val e = trainEpoch.incrementAndGet()
    trainOps(name) = (e, "in progress")
    e
  }

  /** CAS a status transition: applied only while the entry still carries
    * `epoch` — a train that lost its slot (db dropped, or a newer train
    * claimed after "trained") writes nothing.
    */
  @annotation.tailrec
  private def setTrainStatus(name: String, epoch: Long, status: String): Unit =
    trainOps.get(name) match {
      case Some(cur @ (e, _)) if e == epoch =>
        if (!trainOps.replace(name, cur, (epoch, status)))
          setTrainStatus(name, epoch, status)
      case _ => ()
    }

  /** Remove the entry iff this train still owns it (drop-during-train
    * cleanup: a deleted db must read "not started", not a stale "failed").
    */
  private def clearTrainStatus(name: String, epoch: Long): Unit =
    trainOps.get(name) match {
      case Some(cur @ (e, _)) if e == epoch => trainOps.remove(name, cur)
      case _ => ()
    }

  /** Cache-budget control (fastapi.py `update_max_memory_usage`). */
  def updateMaxMemoryUsage(bytes: Long): Unit = indexCache.updateMaxMemory(bytes)

  /** M1 tail — GET /db/view_cache parity (fastapi.py:447-457): the cached
    * db names (deduped across index versions) plus the current/max memory
    * of the model cache. Keys only, never the artifacts.
    */
  def viewCache(): Engine.CacheView = Engine.CacheView(
    indexCache.keys.map(_._1).distinct.sorted,
    indexCache.memoryUsage, indexCache.maxMemory)

  /** M1 tail — POST /db/{name}/remove_from_cache parity
    * (fastapi.py:460-470): drop every cached index version of `name` and
    * release the matching model broadcasts + coded frames. The db itself
    * is untouched — the next query reloads from disk.
    */
  def removeFromCache(name: String): Unit = {
    indexCache.removeIf { case (n, _) => n == name }
    dropModelBroadcasts(name, keepBelow = Int.MaxValue)
    autoPrepared.remove(name).foreach(_.close())
  }

  // ---------------------------------------------------------------- schema

  val dataSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("vector", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("metadata", StringType, nullable = true)))

  /** PQ-coded index table schema (explicit on every read — inference dies
    * on a legitimately-empty index, e.g. after removing every row).
    *
    * COVERING index: alongside the PQ code it stores the full-precision
    * vector and the metadata, so the rerank + hydrate stages read ONLY the
    * probed cluster partitions. The reference gets this for free from LMDB
    * point-lookups (mindb.py:424-428 fetches candidates by id); Parquet
    * has no point-lookup, so without covering columns every query paid a
    * full base-table scan to fetch ~500 candidate rows — measured at the
    * 1M×768 ScaleEval as 20 s/query, SLOWER than brute force. With them,
    * every serving stage's bytes ∝ nprobe/nlist (column pruning keeps the
    * ADC scan reading only id/code/cluster_id). Storage is ~2× the base
    * table — the same trade the reference makes by keeping vectors in both
    * the Faiss index and the LMDB store.
    */
  val codedSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("vector", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("metadata", StringType, nullable = true),
    StructField("code", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("cluster_id", IntegerType, nullable = false)))

  // ------------------------------------------------------------- lifecycle

  /** S1 — create db (mindb.py:42-92). */
  def create(name: String, vectorDimension: Int = -1): CatalogDoc = {
    Catalog.validateName(name)
    require(!Catalog.exists(root, name), s"database '$name' already exists")
    // a terminal status left by a previous incarnation (e.g. trained then
    // dropped) must not leak onto the fresh db; a live train keeps its
    // entry — it will fail its swap's incarnation check and self-clean
    trainOps.get(name) match {
      case Some(cur @ (_, s)) if s == "failed" || s == "complete" =>
        trainOps.remove(name, cur)
      case _ => ()
    }
    val doc = CatalogDoc.empty(name, vectorDimension)
    saveDoc(doc)
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], dataSchema)
      .write.mode("overwrite").parquet(doc.dataPath(root))
    doc
  }

  /** S2 — load db (mindb.py:554-572). Always a fresh catalog read —
    * every read-modify-write and staleness re-check uses this.
    */
  def load(name: String): CatalogDoc = Catalog.load(root, name)

  // ---- serving-doc cache ----------------------------------------------
  //
  // The routed query path's dominant overhead at the published-eval
  // point is its catalog reads (routed p50 35 ms vs 20.6 ms on the raw
  // prepared handle). The ENTRY load may be up to ServingDocTtlNanos
  // stale: this driver's own mutations invalidate the cache inside the
  // save (so same-driver reads stay exact — the reference's per-process
  // cache gives the same guarantee, mindb.py:53-76), and a cross-driver
  // swap inside the TTL is caught by the POST-JOB re-check, which is
  // always fresh ("every result reflects a catalog state observed
  // during the call" still holds). Cross-driver removes/adds inside the
  // TTL window are served at ≤TTL-old visibility — the documented
  // trade, same class as the adds-refresh debounce.
  private val servingDocCache =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Long, CatalogDoc)]
  // bumped by every same-driver catalog write: loadForServing caches a
  // freshly-read doc only if no write landed DURING the read, closing
  // the read-old-doc / save / invalidate / cache-old-doc interleaving
  // that would otherwise pin a pre-swap doc for a full TTL
  private val docGeneration = new java.util.concurrent.atomic.AtomicLong()

  // test seam — CachedDocRaceSpec injects a complete saveDoc between the
  // generation re-check and the cache put to exercise the double-check
  // eviction below deterministically
  private[core] var docCachePutSeam: () => Unit = () => ()

  private def loadForServing(name: String): CatalogDoc = {
    val now = System.nanoTime()
    servingDocCache.get(name) match {
      // the generation stamp must still be CURRENT at read time: an
      // entry put by a reader that raced a writer (pre-write doc cached
      // in the put-to-remove microsecond window below) carries a stale
      // stamp, so no reader ever serves it — this read-side check is
      // what makes "same-driver reads stay exact" unconditional rather
      // than "up to one stale read per race" (ADVICE r17)
      case Some((t, g, doc)) if now - t < Engine.ServingDocTtlNanos &&
          docGeneration.get() == g => doc
      case _ =>
        val g = docGeneration.get()
        val doc = load(name)
        if (docGeneration.get() == g) {
          docCachePutSeam()
          servingDocCache(name) = (System.nanoTime(), g, doc)
          // check-then-put is not atomic: a save can land ENTIRELY
          // between the guard above and the put (save + increment +
          // remove), re-caching the pre-write doc. Re-validate after
          // the put and evict on mismatch; any reader that hits the
          // entry inside this window rejects it anyway, because its
          // stamped generation no longer matches (read-side check
          // above).
          if (docGeneration.get() != g) servingDocCache.remove(name)
        }
        doc
    }
  }

  /** The serving paths' POST-JOB staleness re-check reads the catalog
    * through the same TTL cache as the entry load (r16 — the fresh
    * per-query `listStatus` was the named residual of the 16-thread
    * concurrency gap, VERDICT r15 #3/#4): a SAME-DRIVER swap is seen
    * immediately (`saveDoc` invalidates inside the write lock, and the
    * generation guard above closes the re-cache race), so the contract
    * — "every result reflects a catalog state observed during the call"
    * — still holds against every writer in this driver. A CROSS-DRIVER
    * swap landing inside the TTL window is now seen up to
    * [[Engine.ServingDocTtlNanos]] late — the same documented
    * visibility trade the ENTRY load has made since r12 (and the
    * reference cannot hit at all: its engine is single-process,
    * mindb.py:53-76).
    */
  private[core] def loadRecheck(name: String): CatalogDoc = loadForServing(name)

  /** Catalog write + serving-cache invalidation — every mutation that
    * persists a doc goes through here so a same-driver read after a
    * write is never stale.
    */
  private def saveDoc(doc: CatalogDoc): Unit = {
    Catalog.save(root, doc)
    docGeneration.incrementAndGet()
    servingDocCache.remove(doc.name)
  }

  def exists(name: String): Boolean = Catalog.exists(root, name)

  /** S12 — drop db (mindb.py:549-551). A drop while a train is in flight
    * is allowed (the reference's cleanup re-checks existence,
    * fastapi.py:218-222); the training swap re-checks the catalog and
    * fails cleanly.
    */
  def delete(name: String): Unit = dbLock(name).synchronized {
    indexCache.removeIf { case (n, _) => n == name }
    dropModelBroadcasts(name, keepBelow = Int.MaxValue)
    // catalog delete BEFORE the handle sweep: a prepare racing this drop
    // publishes its handle then re-checks existence (autoPreparedFor), so
    // with the catalog already gone its re-check always closes the handle
    // — in the other order a handle published between our sweep and the
    // catalog delete would pass its existence check and leak its pinned
    // blocks until the engine died
    Catalog.delete(root, name)
    autoPrepared.remove(name).foreach(_.close())
    prepareLocks.remove(name)
    docGeneration.incrementAndGet()
    servingDocCache.remove(name)
    if (trainingStatus(name) != "in progress") trainOps.remove(name)
  }

  /** Main table of the current snapshot (deletion vectors applied). */
  def data(name: String): DataFrame = snapshot(load(name))

  /** The live rows: base Parquet minus pending soft-deletes. The deletes
    * table is broadcast-small (bounded by the compaction threshold), so
    * the filter is a broadcast anti-join — no shuffle of the big side.
    */
  private def snapshot(doc: CatalogDoc): DataFrame = {
    val base = spark.read.schema(dataSchema).parquet(doc.dataPath(root))
    if (doc.numPendingDeletes == 0) base
    else base.join(broadcast(deletes(doc)), Seq("id"), "left_anti")
  }

  private def deletesPath(doc: CatalogDoc): String =
    s"$root/${doc.name}/deletes/d${doc.dataVersion}"

  private def deletes(doc: CatalogDoc): DataFrame =
    spark.read.schema(StructType(Seq(StructField("id", LongType, nullable = false))))
      .parquet(deletesPath(doc))

  /** Typed view of the main table (API boundary; plans stay identical —
    * the Encoder only applies at collect/map sites).
    */
  def dataTyped(name: String): org.apache.spark.sql.Dataset[graft.types.VectorRow] = {
    import spark.implicits._
    data(name).as[graft.types.VectorRow]
  }

  /** S10 — count (footer-metadata-only when no deletes are pending). */
  def count(name: String): Long = data(name).count()

  // ----------------------------------------------------------------- add

  /** A1-A8 — validate, L2-normalize, assign sequential ids, append
    * (mindb.py:162-229). `rows` needs columns `vector: array<float>`,
    * `metadata: string`. Returns the assigned (firstId, lastId).
    *
    * Ids are exact and contiguous (`maxId+1 …`) without a single-partition
    * window: `zipWithIndex` does one count pass per partition and assigns
    * offset-based indices fully distributed.
    */
  def add(name: String, rows: DataFrame): (Long, Long) = dbLock(name).synchronized {
    var doc = load(name)
    val d0 = doc.vectorDimension
    // A7 — dimension inference costs one extra driver job; only pay it on
    // the first-ever add (declared or previously-inferred dims skip it)
    val d =
      if (d0 > 0) d0
      else {
        val firstRow = rows.select("vector").head(1)
        require(firstRow.nonEmpty, "add: empty input")
        firstRow(0).getSeq[Float](0).length
      }

    // A1 dim check fails the job inside the scan (no extra pass) + A2 normalize
    val prepared = rows.select(
      when(size(col("vector")) === d, col("vector"))
        .otherwise(raise_error(concat(lit(s"dimension mismatch: expected $d, got "),
          size(col("vector")).cast("string")))).as("vector"),
      col("metadata").cast("string").as("metadata"))
      .select(transform(l2Normalize(col("vector")), _.cast("float")).as("vector"),
        col("metadata"))

    val base = doc.maxId + 1
    // persist so the id-assigning zipWithIndex and the write see ONE
    // materialization of the upstream — a re-executed non-deterministic
    // source could otherwise diverge between written ids and counted ids
    prepared.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // unpersist on EVERY exit: a validation-rejected batch (dim mismatch
    // fails the count job inside the scan) must not leak its cache blocks
    val added =
      try {
        // ONE job does the count pass (VERDICT r18 #5): per-partition
        // sizes give both the total (the atomic A3 guard input) and the
        // id offsets zipWithIndex would have derived from its own
        // internal count job — the assigned ids are bit-identical (same
        // partition order, same within-partition order, same base), one
        // Spark job fewer per add on the real write path.
        val rdd = prepared.rdd
        val partCounts = rdd.mapPartitionsWithIndex { case (i, it) =>
          var n = 0L; while (it.hasNext) { it.next(); n += 1 }
          Iterator((i, n))
        }.collect().sortBy(_._1).map(_._2)
        val added = partCounts.sum
        require(added > 0, "add: empty input")
        // A3 — the count is in hand and nothing is committed yet, so the
        // guard rejects atomically (same contract as the A1 dim rejection)
        if (!doc.isTrained) flatAddMemoryGuardBytes.foreach { cap =>
          val est = (doc.maxId + 1 + added) * d.toLong * 4L * 3L
          require(est <= cap,
            s"add: flat index would use ~$est bytes > max memory usage $cap")
        }
        val offsets = partCounts.scanLeft(0L)(_ + _)
        val withIds = spark.createDataFrame(
          rdd.mapPartitionsWithIndex { case (i, it) =>
            var next = base + offsets(i)
            it.map { r =>
              val row =
                org.apache.spark.sql.Row(next, r.getSeq[Float](0), r.getString(1))
              next += 1
              row
            }
          }, dataSchema)
        withIds.write.mode("append").parquet(doc.dataPath(root))
        added
      } finally prepared.unpersist()

    // A6 — incremental index insert for a live trained index
    if (doc.isTrained) {
      val model = indexModel(doc)
      appendToCodedTable(doc, model,
        spark.read.schema(dataSchema).parquet(doc.dataPath(root))
          .filter(col("id") >= base))
    }

    doc = doc.copy(maxId = base + added - 1,
      vectorDimension = d,
      numNewVectors = doc.numNewVectors + added)
    saveDoc(doc)
    // a steady trickle of post-train adds must not degrade the pruned
    // scan into a small-file storm — bin-pack when the file count crosses
    // the per-cluster threshold
    if (doc.isTrained) maybeCompactCoded(name)
    // A10 — flat-index size warning (mindb.py:180-184)
    if (flatWarning(doc))
      log.warn(s"database '${doc.name}' has ${doc.maxId + 1} vectors on an " +
        "untrained flat index; queries are exact brute-force — train() is recommended")
    (base, base + added - 1)
  }

  /** A10 — the flat-index size warning as a queryable predicate (the
    * condition [[add]] logs on; `flat_warning` oracle-gates it).
    */
  def flatIndexWarning(name: String): Boolean = flatWarning(load(name))

  private def flatWarning(doc: CatalogDoc): Boolean =
    !doc.isTrained && doc.maxId + 1 > Heuristics.FlatIndexWarnSize

  /** Driver-local convenience add (test/API parity with the reference's
    * `add(list of (vector, metadata))`).
    */
  def addLocal(name: String, vectors: Seq[Array[Float]],
               metadata: Seq[String]): (Long, Long) = {
    val rows = vectors.zipAll(metadata, Array.empty[Float], null)
      .map { case (v, m) => org.apache.spark.sql.Row(v.toSeq, m) }
    val schema = StructType(Seq(
      StructField("vector", ArrayType(FloatType, containsNull = false)),
      StructField("metadata", StringType)))
    add(name, spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, math.max(1, rows.size / 5000)), schema))
  }

  // ---------------------------------------------------------------- remove

  /** D1-D5 — delete ids with deletion vectors: one scan finds the present
    * ids, which append to a broadcast-small deletes table; every reader
    * anti-joins it (snapshot). Physical rewrite is deferred to [[compact]],
    * triggered when pending deletes exceed `compactionThreshold` of the
    * table — O(batch) per delete instead of O(n) rewrite amplification.
    * Counters split by `id > maxTrainedId` exactly as the reference
    * (mindb.py:459-489, 529-540); deletes are immediately invisible to
    * queries (D2 semantics — the index only ever references live rows
    * because candidate fetch goes through the snapshot).
    * Returns the number of rows actually deleted.
    */
  def remove(name: String, ids: Seq[Long],
             compactionThreshold: Double = Engine.CompactionThreshold): Long = dbLock(name).synchronized {
    require(ids.forall(_ >= 0), "negative ids found; all ids must be non-negative")
    var doc = load(name)
    val idDf = spark.createDataFrame(ids.distinct.map(Tuple1(_))).toDF("id")

    // one scan: which of the requested ids are live? (driver-bounded by
    // the request batch size)
    val present = snapshot(doc).join(broadcast(idDf), Seq("id"), "left_semi")
      .select("id").collect().map(_.getLong(0))
    if (present.isEmpty) return 0L
    val removedTrained = present.count(_ <= doc.maxTrainedId).toLong
    val removedNew = present.length - removedTrained

    // soft delete: append the present ids to this data version's deletes
    spark.createDataFrame(present.toSeq.map(Tuple1(_))).toDF("id")
      .coalesce(1).write.mode("append").parquet(deletesPath(doc))

    doc = doc.copy(
      numPendingDeletes = doc.numPendingDeletes + present.length,
      numTrainedVectorsRemoved = doc.numTrainedVectorsRemoved + removedTrained,
      numNewVectors = doc.numNewVectors - removedNew)
    saveDoc(doc)

    val physicalRows = doc.maxId + 1 // upper bound incl. already-deleted
    if (physicalRows > 0 &&
        doc.numPendingDeletes.toDouble / physicalRows >= compactionThreshold)
      compact(name)
    removedTrained + removedNew
  }

  /** Physically apply pending deletes: rewrite the data snapshot (and the
    * coded index table when trained) without the deleted rows, bump the
    * versions atomically, reset the deletes table. Idempotent no-op when
    * nothing is pending.
    */
  def compact(name: String): CatalogDoc = dbLock(name).synchronized {
    var doc = load(name)
    if (doc.numPendingDeletes == 0) return doc
    // Deferred while a train is in flight (the reference defers LMDB
    // removal the same way, fastapi.py:191-205): a compaction here would
    // bump the index version the training swap already allocated. The
    // post-train drain re-checks the threshold and compacts then.
    if (trainingStatus(name) == "in progress") {
      log.info(s"compaction of '$name' deferred: training in progress")
      return doc
    }
    val old = doc
    val newVersion = doc.dataVersion + 1
    snapshot(doc).write.mode("overwrite").parquet(s"$root/$name/data/v$newVersion")

    // Index-side rewrite is PER-BUCKET on the bucketed layout: only the
    // cluster_buckets that actually HOLD deleted rows are rewritten into
    // the new index version; every untouched bucket keeps its existing
    // files and is read from the version dir that owns them
    // (doc.codedOwners). At 100 TB a threshold compact touches ~10% of
    // rows — spread over (usually far) fewer than all buckets — so the
    // rewrite cost is ∝ touched buckets, not table size. The legacy
    // one-dir-per-cluster layout keeps the full rewrite (every retrain
    // upgrades it to the bucketed layout anyway).
    var unreferencedIndexDirs = Seq.empty[String]
    if (doc.isTrained) {
      val model = indexModel(doc)
      val newIdxVersion = doc.indexVersion + 1
      val nlist = math.max(1, doc.numClusters)
      if (doc.codedBucketShift < 0) {
        writeCodedRows(
          codedDf(doc).join(broadcast(deletes(doc)), Seq("id"), "left_anti"),
          doc.codedBucketShift, nlist,
          s"$root/$name/index/v$newIdxVersion/coded", "overwrite")
        IndexStore.saveModel(spark, s"$root/$name/index/v$newIdxVersion", model)
        unreferencedIndexDirs = Seq(doc.indexPath(root))
        doc = doc.copy(indexVersion = newIdxVersion, codedOwners = "")
      } else {
        val buckets = Engine.codedBucketCount(nlist, doc.codedBucketShift)
        val owners = doc.ownerVersions(buckets)
        // one column-pruned pass (id + the partition value) finds the
        // buckets with deletions — no vector/code/metadata decode
        val touched = codedDf(doc)
          .join(broadcast(deletes(doc)), Seq("id"), "left_semi")
          .select("cluster_bucket").distinct().collect().map(_.getInt(0))
        val touchedSet = touched.toSet
        if (touched.nonEmpty)
          writeCodedRows(
            codedDf(doc)
              .filter(col("cluster_bucket").isin(
                touched.toIndexedSeq.map(Integer.valueOf): _*))
              .join(broadcast(deletes(doc)), Seq("id"), "left_anti"),
            doc.codedBucketShift, nlist,
            s"$root/$name/index/v$newIdxVersion/coded", "overwrite")
        IndexStore.saveModel(spark, s"$root/$name/index/v$newIdxVersion", model)
        val newOwners = owners.zipWithIndex.map { case (o, b) =>
          if (touchedSet(b)) newIdxVersion else o }
        // versions that no longer own any bucket become sweepable
        val stillReferenced = newOwners.toSet + newIdxVersion
        unreferencedIndexDirs = (owners.toSet + doc.indexVersion)
          .diff(stillReferenced).toSeq.sorted
          .map(v => s"$root/$name/index/v$v")
        doc = doc.copy(indexVersion = newIdxVersion).withOwners(newOwners)
      }
    }

    doc = doc.copy(dataVersion = newVersion, numPendingDeletes = 0L)
    saveDoc(doc) // atomic swap; old deletes dir is now unreferenced
    markSuperseded((Seq(old.dataPath(root), deletesPath(old)) ++
      unreferencedIndexDirs): _*)
    doc
  }

  // ----------------------------------------------------------------- query

  /** Q1-Q9 — two-stage ANN query (mindb.py:368-442). Returns an ordered
    * DataFrame `(rank, id, metadata, cosine_similarity)` of `finalTopK`
    * rows. Untrained dbs use the exact flat path (mindb.py:396-415).
    *
    * `predicate` is the metadata filter the reference lists as its next
    * major feature (README.md:52): a Column over (id, metadata), e.g.
    * `get_json_object(col("metadata"), "$.lang") === "en"`. On the flat
    * path it pushes into the scan (exact filtered kNN); on the trained
    * path it post-filters the preliminary candidates with an UNDER-FILL
    * GUARD: if the filtered candidate set is smaller than `finalTopK`,
    * ONE pushed round re-runs the preliminary stage with the predicate
    * gating the ADC cut (top-prelimK MATCHING candidates), and if even
    * that under-fills, the query falls back to the exact flat scan — a
    * selective predicate never silently returns fewer rows than the
    * data could supply.
    *
    * VISIBILITY (routed trained path): results are bit-identical to the
    * Catalyst plan over the catalog state the call observed, but that
    * state may lag same-engine mutations by ≤ the adds-refresh debounce
    * window ([[Engine.PreparedAddsRefreshIntervalMs]], 100 ms: adds
    * committed inside the window can be invisible) and cross-driver
    * mutations by ≤ the serving-doc TTL ([[Engine.ServingDocTtlNanos]]:
    * adds AND removes from another driver inside the TTL can be served
    * stale — the post-job re-check catches version moves, not pending-
    * delete drift). The reference folds appends synchronously, so its
    * reads are read-your-writes; callers needing that on this engine set
    * `autoRoutePrepared = false` (or use [[queryCatalyst]]) — or
    * `prepareServing(name, addsRefreshIntervalMs = 0)` for a handle that
    * refreshes on every drift.
    *
    * EXECUTION CONTRACT: on a trained db this method is EAGER — the
    * coarse ADC stage runs (a Spark job) at CALL time, and the returned
    * DataFrame holds only the candidate-fetch + rerank plan over its
    * survivors. Callers that build queries speculatively (EXPLAIN, plan
    * inspection) pay the coarse scan up front; use the flat path or
    * [[prepareServing]] if construction must stay free. This is the Q4
    * trade: collecting the ≤ prelimK survivor ids is what lets the fetch
    * scan read ∝ candidates instead of ∝ probes (the 100M-geometry fix).
    */
  def query(name: String, q: Array[Float], preliminaryTopK: Int = 500,
            finalTopK: Int = 100, predicate: Option[Column] = None): DataFrame = {
    // ≤TTL-stale entry read (same-driver mutations invalidate, the
    // post-job re-check inside the handle is always fresh — see the
    // serving-doc cache note above); the Catalyst path below re-loads
    // fresh itself
    val doc = loadForServing(name)
    // AUTO-ROUTING (VERDICT r11 ask #3, extended to predicates in r13): a
    // single query on a TRAINED db serves through a warm engine-owned
    // [[PreparedIndex]] — one job over pinned blocks instead of a fresh
    // Catalyst plan whose analysis of the chunked probe-union dominated
    // p50 at the 35M geometry (EVAL_r10 scale_run_35m: 944 ms of
    // 1,045 ms was planning). A metadata predicate is compiled ONCE
    // against the (id, metadata) schema and evaluated against the
    // preliminary candidates inside the fused job, with the identical
    // under-fill widening guard — so the filtered form shares the routed
    // floor instead of paying the planning floor (EVAL_r12
    // catalyst_query_ms_p50 1.05-1.53 s at 35M/100M). Results are
    // bit-identical (PreparedIndexSpec; the prepared_knn /
    // knn_filtered_trained DuckDB replays). First routed query per
    // (db, version) pays the block build; staleness falls back inside
    // the handle, and the handle is rebuilt here once the catalog doc
    // shows a moved version. `autoRoutePrepared = false` (or
    // [[queryCatalyst]]) restores the pure-plan path.
    if (autoRoutePrepared && doc.isTrained) {
      // catch IllegalArgumentException on all routed branches: a
      // concurrent close (cache eviction / drop) can void the handle
      // mid-call — the plan path serves the same observed state. This
      // also covers validation failures: queryCatalyst re-runs the
      // identical require()s, so a genuine bad query surfaces the same
      // error from the plan path instead of racing the handle check.
      predicate match {
        case None =>
          try {
            val p = autoPreparedFor(doc)
            return hitsDf(p.queryWith(doc, q, preliminaryTopK, finalTopK))
          } catch { case _: IllegalArgumentException => () }
        case Some(pred) =>
          compileMetaPredicate(pred) match {
            case Some(evalP) =>
              try {
                val p = autoPreparedFor(doc)
                return hitsDf(p.queryFilteredWith(doc, q, preliminaryTopK,
                  finalTopK, pred, evalP))
              } catch { case _: IllegalArgumentException => () }
            case None => () // predicate needs the full candidate schema
          }
      }
    }
    queryCatalyst(name, q, preliminaryTopK, finalTopK, predicate)
  }

  /** [[query]] without the DataFrame: the driver-local hits, straight
    * from the routed serving path — for latency-floor callers, who
    * otherwise pay ~15 ms of LocalRelation analysis per call just to
    * collect a k-row frame. Same routing, same staleness handling, same
    * results (the fallback paths collect the equivalent plan); the
    * DataFrame form remains [[query]] for everything relational.
    * The routed visibility window ([[query]]'s doc) applies here too.
    */
  def queryHits(name: String, q: Array[Float], preliminaryTopK: Int = 500,
                finalTopK: Int = 100,
                predicate: Option[Column] = None): Array[PreparedIndex.Hit] = {
    val doc = loadForServing(name)
    if (autoRoutePrepared && doc.isTrained) {
      predicate match {
        case None =>
          try return autoPreparedFor(doc).queryWith(doc, q, preliminaryTopK, finalTopK)
          catch { case _: IllegalArgumentException => () }
        case Some(pred) =>
          compileMetaPredicate(pred).foreach { evalP =>
            try return autoPreparedFor(doc).queryFilteredWith(doc, q,
              preliminaryTopK, finalTopK, pred, evalP)
            catch { case _: IllegalArgumentException => () }
          }
      }
    }
    queryCatalyst(name, q, preliminaryTopK, finalTopK, predicate).collect().map { r =>
      PreparedIndex.Hit(r.getInt(0), r.getLong(1), r.getString(2), r.getDouble(3))
    }
  }

  /** [[query]] on the composable plan surface: a fresh catalog load
    * (read-your-writes, unlike the routed entry's TTL'd load), Column
    * predicates, explainable frames. Since r18 the no-predicate trained
    * branch is served from an already-warm prepared handle when its
    * blocks exactly cover the fresh doc ([[catalystWarmServe]] — same
    * rows, same local-relation surface, none of the per-query probed-
    * parquet decode); set `catalystWarmServe = false` to pin the PURE
    * plan path — the independent ground truth every spec/eval compares
    * the routed/prepared forms against.
    */
  def queryCatalyst(name: String, q: Array[Float], preliminaryTopK: Int = 500,
                    finalTopK: Int = 100,
                    predicate: Option[Column] = None): DataFrame = {
    val doc = load(name)
    require(doc.vectorDimension <= 0 || q.length == doc.vectorDimension,
      s"query dim ${q.length} != ${doc.vectorDimension}")
    // warm-serve fast path (see [[catalystWarmServe]]): same frame, same
    // fresh-doc visibility (coversAddsOf gates exactness), served from
    // the already-warm handle's in-memory blocks. Strictly opportunistic:
    // never builds a handle, and any handle-side refusal (concurrent
    // close, version drift) falls through to the plan path below.
    if (catalystWarmServe && predicate.isEmpty && doc.isTrained) {
      autoPrepared.get(name)
        .filter(p => !p.isStaleFor(doc) && p.coversAddsOf(doc))
        .foreach { p =>
          try return hitsDf(p.queryWith(doc, q, preliminaryTopK, finalTopK))
          catch { case _: IllegalArgumentException => () }
        }
    }
    val qn = normalizeLocal(q)
    val table = snapshot(doc)

    val candidates: DataFrame =
      if (!doc.isTrained) predicate.fold(table)(table.filter) // pushed into the scan
      else {
        // Q2 — coarse search: probe selection on the driver (O(nlist·p)),
        // partition-pruned scan scored by the BatchANN reconstruction
        // kernel (q=1). ADC math runs executor-side from the per-version
        // model broadcast — nothing nprobe-sized ships per query (the
        // per-call push is just the projected query vector + probe list).
        val model = indexModel(doc)
        val qp = model.pca.applyLocal(qn)
        val probes = model.nearestClusters(qp, doc.nProbe)
        lazy val live = prunedLiveCoded(doc, probes) // only the empty-candidate branch needs the union form
        def probedCandidates(prelim: Int,
                             pushPred: Boolean = false,
                             preCoarse: Option[Array[(Long, Double, Int)]] = None)
            : DataFrame = {
          // q=1 coarse: same kernel and (adc_dist, id) order as the batch
          // form, merged on the driver — one CONCURRENT job per probe
          // chunk, no window shuffle (BatchANN.coarseSingleChunked; the
          // r14 planning-floor work). `pushPred` is the under-fill
          // round's decisive form: the predicate filters the COVERING
          // chunk scans BEFORE the ADC cut (a Catalyst filter, pushed to
          // parquet where possible), so the survivors are the
          // top-`prelim` MATCHING rows by (adc, id) — identical to the
          // prepared path's kernel-gated pushed round.
          // the unfiltered coarse runs plan-free against the per-epoch
          // serving scan (ServingScan — zero per-query Catalyst passes,
          // one epoch-wide conf broadcast, cached footers); the pushed-
          // predicate round and the fallback shapes keep the Catalyst
          // chunk scans (they need composable Column filters)
          val candRows =
            preCoarse
              .orElse(if (pushPred) None
                      else servingScanCoarse(doc, qp, probes, prelim))
              .getOrElse {
                val chunks0 = prunedLiveCodedChunks(doc, probes)
                val chunks =
                  if (pushPred) predicate.fold(chunks0)(p => chunks0.map(_.filter(p)))
                  else chunks0
                graft.operators.BatchANN.coarseSingleChunked(
                  spark, chunks, modelBroadcast(doc),
                  qp, probes, prelim)
              }
          // Q4 — candidate fetch reads ∝ CANDIDATES, not ∝ probes: the
          // surviving ids land on the driver (≤ prelim rows — the same
          // bound the old broadcast build already imposed), and the fetch
          // scan's pushed probe list is just the clusters that HOLD
          // survivors (≤ prelim distinct, vs nprobe). At the 100M
          // geometry that is ~250k decoded covering rows instead of 3M —
          // the vector/metadata decode of probed-but-candidate-less
          // clusters was the single-query exec bottleneck (profiled
          // 5-10 s, QueryProfile). This is the Parquet form of the
          // reference's fetch-by-id from LMDB after the Faiss search.
          val fetched =
            if (candRows.isEmpty)
              live.select("id", "vector", "metadata").filter(lit(false))
            else
              // plan-free fetch when the custom scan is eligible: same
              // two pushed chains (cluster + id), zero per-query Catalyst
              // pass, no per-file predicate rebuild; ≤ prelim rows come
              // back as a local relation the rerank composes over
              servingScanFetch(doc, candRows).getOrElse {
                prunedLiveCoded(doc, candRows.map(_._3).distinct)
                  .select("id", "vector", "metadata")
                  .filter(col("id").isInCollection(
                    candRows.map(r => java.lang.Long.valueOf(r._1)).toIndexedSeq))
              }
          predicate.fold(fetched)(fetched.filter)
        }
        predicate match {
          case None =>
            // Fully-local serve when both stages rode the plan-free scan:
            // the rerank over ≤ prelimK driver-resident rows needs no
            // cluster job at all — rerankLocal runs the dot kernel's
            // exact arithmetic (double accumulation over float products,
            // VectorKernels.dotFF) and the same (cos desc, id) order, so
            // the frame is row-identical to rerankFrame's (gated by
            // ServingScanCustomSpec e2e equality + the DuckDB trained
            // rows). The measured motive: the window+orderBy rerank of
            // ~500 LOCAL rows still cost a ~70 ms two-stage job at 35M
            // (scaleeval_35m_clean.log query_exec_ms_p50).
            servingScanCoarse(doc, qp, probes, preliminaryTopK) match {
              case Some(cand) =>
                servingScanFetchRows(doc, cand) match {
                  case Some(rows) => return rerankLocal(rows, qn, finalTopK)
                  case None => probedCandidates(preliminaryTopK,
                    preCoarse = Some(cand))
                }
              case None => probedCandidates(preliminaryTopK)
            }
          case Some(_) =>
            // Under-fill guard (r15 semantics — one decisive pushed
            // round, see PreparedIndex.queryFilteredWith for the full
            // rationale). localCheckpoint materializes the (tiny,
            // ≤ prelim rows) candidate set so counting it and reranking
            // it share one coarse pass; discarded frames are GC-cleaned.
            val first = probedCandidates(preliminaryTopK).localCheckpoint(true)
            if (first.count() >= finalTopK) first
            else {
              // a NONDETERMINISTIC predicate has no stable matching set
              // to push against (and the pushed form would evaluate it
              // twice per surviving row: once at the coarse gate, once
              // on the fetched frame) — the exact flat scan, one
              // evaluation per row, is the only coherent continuation.
              if (predicate.exists(predicateNondeterministic(table, _)))
                predicate.fold(table)(table.filter)
              else {
                // the predicate filters the covering chunk scans BEFORE
                // the ADC cut: top-prelimK MATCHING rows by (adc, id) —
                // what the old selectivity-estimated widening converged
                // to, in one round. Fewer than finalTopK survivors means
                // the probed clusters genuinely can't fill the ask — the
                // exact flat scan is then semantically required.
                val pushed = probedCandidates(preliminaryTopK, pushPred = true)
                  .localCheckpoint(true)
                if (pushed.count() >= finalTopK) pushed
                else predicate.fold(table)(table.filter) // exact flat fallback
              }
            }
        }
      }

    rerankFrame(candidates, qn, finalTopK)
  }

  /** Q5/Q6 — exact rerank by dot-product cosine (normalized vectors):
    * the shared tail of every single-query plan path, so the prepared
    * path's flat fallback produces the IDENTICAL frame the Catalyst
    * path's terminal under-fill branch does.
    */
  private def rerankFrame(candidates: DataFrame, qn: Array[Float],
                          finalTopK: Int): DataFrame = {
    val qLit = typedLit(qn.toSeq)
    val scored = candidates
      .select(col("id"), col("metadata"), dot(col("vector"), qLit).as("cosine_similarity"))
      .orderBy(col("cosine_similarity").desc, col("id"))
      .limit(finalTopK)
    scored.withColumn("rank",
      row_number().over(Window.orderBy(col("cosine_similarity").desc, col("id"))))
      .select("rank", "id", "metadata", "cosine_similarity")
  }

  /** The exact flat filtered scan — the terminal branch of the trained
    * predicate path's under-fill guard, callable directly by the
    * prepared filtered path once ITS widening has under-filled (so it
    * serves the same frame without re-running the coarse rounds the
    * handle already ran in-memory). Fresh catalog load: the fallback
    * must see deletes committed after the handle's entry doc.
    */
  private[core] def queryFlatFiltered(name: String, q: Array[Float],
                                      finalTopK: Int,
                                      predicate: Option[Column]): DataFrame = {
    val doc = load(name)
    val qn = normalizeLocal(q)
    val table = snapshot(doc)
    rerankFrame(predicate.fold(table)(table.filter), qn, finalTopK)
  }

  /** Batched exact query for throughput (the Spark-side win): many query
    * vectors in one job, per-query top-k via bounded per-partition heaps
    * ([[graft.operators.TopK]]) — shuffle is O(partitions·q·k) instead of
    * the full n·q scored cross product a window-rank plan would move.
    * `queries`: (query_id long, qvec array<float>) — pre-normalized or not,
    * broadcast-small by contract (collected to the driver).
    */
  def queryBatchFlat(name: String, queries: DataFrame, finalTopK: Int,
                     predicate: Option[Column] = None): DataFrame = {
    val doc = load(name)
    val table = snapshot(doc)
    // exact path: the predicate pushes into the ONE shared scan, so every
    // query's top-k ranges over ALL matching rows — no under-fill
    // semantics needed (this is the batch face of the single flat
    // filtered query, and the terminal fallback target of the trained
    // filtered batch below)
    val src = predicate.fold(table)(table.filter)
    val qs = queries
      .select(col("query_id").cast("long"), col("qvec").cast("array<float>"))
      .collect()
      .map(r => r.getLong(0) -> normalizeLocal(r.getSeq[Float](1).toArray))
    val topk = graft.operators.TopK.topKPerQuery(src, qs, finalTopK)
    // metadata hydrate: broadcast the tiny q·k result against the table
    src.select(col("id"), col("metadata"))
      .join(broadcast(topk), Seq("id"))
      .select(col("query_id"), col("id"), col("metadata"),
        col("sim").as("cosine_similarity"), col("rank"))
  }

  /** Batched TRAINED two-stage query: q query vectors share one
    * partition-pruned scan of the coded table ([[graft.operators.BatchANN]])
    * and one candidate-rerank pass — the throughput shape where the Spark
    * engine amortizes scan cost across queries. Results are identical to
    * running [[query]] per query vector (same distances, same tie-breaks).
    * `queries`: (query_id long, qvec array<float>), broadcast-small.
    */
  def queryBatchTrained(name: String, queries: DataFrame,
                        preliminaryTopK: Int = 500, finalTopK: Int = 100,
                        predicate: Option[Column] = None): DataFrame = {
    val doc = load(name)
    require(doc.isTrained, s"'$name' has no trained index — use queryBatchFlat")
    val model = indexModel(doc)
    val raw = queries
      .select(col("query_id").cast("long"), col("qvec").cast("array<float>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    // raw vectors are kept for the predicate path's per-query re-route:
    // the single filtered path normalizes the RAW query itself, and
    // normalize is not bit-idempotent
    val rawByQid = raw.toMap
    val qs = raw.map { case (qid, v) => qid -> normalizeLocal(v) }
    // Driver-memory guard: the candidate round-trip holds q·prelimK rows
    // on the driver (twice, briefly: Array[Row] + the rebuilt frame). A
    // very large batch would OOM it, so past the cap the batch splits
    // into driver-bounded chunks. Each chunk reuses the ALREADY-normalized
    // vectors (normalizing a unit float vector is not bit-idempotent, so
    // re-entering the public method would shift last-bit tie-breaks) and
    // is MATERIALIZED (eager localCheckpoint) before the next chunk runs,
    // so the executed chunks' candidate LocalRelations are released and
    // driver residency is genuinely bounded per chunk — per-query results
    // are independent, so the split is invisible to correctness; only
    // scan amortization across chunks is lost.
    if (qs.length.toLong * preliminaryTopK > Engine.MaxDriverBatchCandidates) {
      val perChunk = math.max(1,
        (Engine.MaxDriverBatchCandidates / preliminaryTopK).toInt)
      return qs.grouped(perChunk).map { chunk =>
        queryBatchTrainedNormalized(doc, model, chunk, preliminaryTopK,
          finalTopK, predicate, rawByQid).localCheckpoint(true)
      }.reduce(_ union _)
    }
    queryBatchTrainedNormalized(doc, model, qs, preliminaryTopK, finalTopK,
      predicate, rawByQid)
  }

  /** [[queryBatchTrained]] body over collected, already-normalized
    * (query_id, unit vector) pairs — the chunked path calls this per chunk
    * so chunking stays bit-identical to the one-shot plan.
    */
  private def queryBatchTrainedNormalized(doc: CatalogDoc,
      model: Engine.IndexModel, qs: Array[(Long, Array[Float])],
      preliminaryTopK: Int, finalTopK: Int,
      predicate: Option[Column] = None,
      rawByQid: Map[Long, Array[Float]] = Map.empty): DataFrame = {
    val qsP = qs.map { case (qid, qn) => qid -> model.pca.applyLocal(qn) }
    val probes = qsP.map { case (_, qp) => model.nearestClusters(qp, doc.nProbe) }
    val probeUnion = probes.flatten.distinct
    val live = prunedLiveCoded(doc, probeUnion)
    val candRows = graft.operators.BatchANN.coarseCandidates(
      spark, live, modelBroadcast(doc), qsP, probes, preliminaryTopK)
      .select("query_id", "id", "cluster_id").collect()
    // rerank fetches from a scan pruned to the clusters HOLDING candidates
    // (≤ q·prelim rows on the driver — the bound the broadcast build
    // already imposed), not the full probe union: fetch bytes ∝
    // candidates, never ∝ nprobe — the base table and the
    // candidate-less probed clusters are never decoded (see [[query]])
    val candidates = spark.createDataFrame(
      java.util.Arrays.asList(candRows: _*),
      StructType(Seq(
        StructField("query_id", LongType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("cluster_id", IntegerType, nullable = false))))
    val fetchScan =
      if (candRows.isEmpty)
        live.select("cluster_id", "id", "vector", "metadata").filter(lit(false))
      else prunedLiveCoded(doc, candRows.map(_.getInt(2)).distinct)
        .select("cluster_id", "id", "vector", "metadata")
        // the candidate id-chain pushes too (the single-path form,
        // Q4): page-level pruning inside the candidate-holding
        // clusters' cluster_id-sorted files — the fetch decodes
        // ~q·prelim rows, never whole clusters (~500k rows at the
        // 100M geometry). The broadcast join alone is semantically
        // identical but decodes every row of every candidate-holding
        // cluster first.
        .filter(col("id").isInCollection(
          candRows.map(r => java.lang.Long.valueOf(r.getLong(1)))
            .distinct.toIndexedSeq))
    predicate match {
      case None =>
        graft.operators.BatchANN.rerank(spark, fetchScan, candidates, qs,
          finalTopK)
      case Some(pred) =>
        // Filtered batch = the batch face of the single filtered query:
        // the predicate filters the hydrated candidate rows (pushed into
        // the pruned fetch scan as a Catalyst filter), and the queries
        // whose filtered preliminary set can't fill finalTopK — EXACTLY
        // the condition under which the single path re-runs — take ONE
        // shared PUSHED round (predicate before the ADC cut, per-query
        // top-prelimK matching candidates), never a per-query loop:
        // under a cluster-correlated predicate (the adversarial shape)
        // half the batch under-fills AT ONCE, and a sequential re-route
        // would silently lose the batch path's one-job throughput
        // property. Queries whose pushed round still can't fill take the
        // terminal exact scan TOGETHER via [[queryBatchFlat]] — the
        // batch face of the single path's flat fallback (same kernel
        // ordering, gated bit-identical by PreparedIndexSpec). Eager by
        // necessity (per-query fill counts drive the re-route), like the
        // trained single form. Collected rows ≤ q·finalK — strictly
        // smaller than the q·prelimK the candidate stage already held.
        val rows = graft.operators.BatchANN.rerank(
          spark, fetchScan.filter(pred), candidates, qs, finalTopK).collect()
        val filledBy = rows.groupBy(_.getLong(0))
        def fill(qid: Long): Int = filledBy.getOrElse(qid, Array.empty).length
        val kept = rows.filter(r => fill(r.getLong(0)) >= finalTopK)
        val under = qs.filter { case (qid, _) => fill(qid) < finalTopK }
        val rerouted: Array[org.apache.spark.sql.Row] =
          if (under.isEmpty) Array.empty
          else {
            // r15 under-fill semantics (the single path's, batched): ONE
            // pushed round for ALL under-filled queries together — the
            // predicate filters the covering coded scan BEFORE the ADC
            // cut, so each query gets its top-prelimK MATCHING rows by
            // (adc, id). Nondeterministic predicates skip straight to
            // the exact flat scan (no stable matching set to push
            // against — same rule as the single path).
            val nondet = predicateNondeterministic(live, pred)
            log.info(s"filtered batch under-fill: ${under.length} of " +
              s"${qs.length} queries re-route " +
              (if (nondet) "(nondeterministic predicate - straight to the exact scan)"
               else "(one pushed round)"))
            val retryRows: Array[org.apache.spark.sql.Row] =
              if (nondet) Array.empty
              else filteredBatchRound(doc, model, under, preliminaryTopK,
                finalTopK, pred, pushed = true)
            val retryFilled = retryRows.groupBy(_.getLong(0))
            val retryKept = retryRows.filter(r =>
              retryFilled(r.getLong(0)).length >= finalTopK)
            val flatQids = under.iterator.map(_._1).filter(q =>
                retryFilled.getOrElse(q, Array.empty).length < finalTopK)
              .toArray
            val flatRows: Array[org.apache.spark.sql.Row] =
              if (flatQids.isEmpty) Array.empty
              else {
                // RAW vectors: the flat path normalizes the raw query
                // itself, and normalize is not bit-idempotent
                val qdf = spark.createDataFrame(
                  java.util.Arrays.asList(flatQids.map(qid =>
                    org.apache.spark.sql.Row(qid, rawByQid(qid).toSeq)): _*),
                  StructType(Seq(
                    StructField("query_id", LongType, nullable = false),
                    StructField("qvec",
                      ArrayType(FloatType, containsNull = false),
                      nullable = false))))
                queryBatchFlat(doc.name, qdf, finalTopK, Some(pred)).collect()
              }
            retryKept ++ flatRows
          }
        spark.createDataFrame(
          java.util.Arrays.asList((kept ++ rerouted): _*),
          StructType(Seq(
            StructField("query_id", LongType, nullable = false),
            StructField("id", LongType, nullable = false),
            StructField("metadata", StringType, nullable = true),
            StructField("cosine_similarity", DoubleType, nullable = false),
            StructField("rank", IntegerType, nullable = false))))
    }
  }

  /** Whether `pred` is nondeterministic when analyzed against `frame`'s
    * schema — detected on the ANALYZED tree, because the unresolved
    * Column hides `expr("rand() < 0.5")` behind an UnresolvedFunction
    * node (the same rule [[compileMetaPredicate]] applies for
    * cacheability). The under-fill guards route nondeterministic
    * predicates straight to the exact flat scan: they have no stable
    * matching set for a pushed round to converge on.
    */
  private def predicateNondeterministic(frame: DataFrame, pred: Column): Boolean =
    frame.filter(pred).queryExecution.analyzed.exists(plan =>
      plan.expressions.exists(_.exists(!_.deterministic)))

  /** One coarse+rerank round for a group of under-filled filtered batch
    * queries — the batch twin of the single filtered path's under-fill
    * retry: identical per-query candidate arithmetic (same coarse
    * kernel, same probes), one job for the whole group. `pushed` = the
    * r15 decisive form: the predicate filters the covering coded scan
    * BEFORE the ADC cut, yielding each query's top-`prelim` MATCHING
    * candidates by (adc, id).
    */
  private def filteredBatchRound(doc: CatalogDoc, model: Engine.IndexModel,
      qsSub: Array[(Long, Array[Float])], prelim: Int, finalTopK: Int,
      pred: Column, pushed: Boolean = false): Array[org.apache.spark.sql.Row] = {
    // re-apply the driver-candidate bound at this round's geometry
    // (per-query results are independent, so the split is invisible to
    // correctness)
    if (qsSub.length.toLong * prelim > Engine.MaxDriverBatchCandidates &&
        qsSub.length > 1) {
      val perChunk = math.max(1,
        (Engine.MaxDriverBatchCandidates / prelim).toInt)
      return qsSub.grouped(perChunk).flatMap(g =>
        filteredBatchRound(doc, model, g, prelim, finalTopK, pred, pushed)).toArray
    }
    val qsP = qsSub.map { case (qid, qn) => qid -> model.pca.applyLocal(qn) }
    val probes = qsP.map { case (_, qp) => model.nearestClusters(qp, doc.nProbe) }
    val live0 = prunedLiveCoded(doc, probes.flatten.distinct)
    val live = if (pushed) live0.filter(pred) else live0
    val candRows = graft.operators.BatchANN.coarseCandidates(
      spark, live, modelBroadcast(doc), qsP, probes, prelim)
      .select("query_id", "id", "cluster_id").collect()
    if (candRows.isEmpty) return Array.empty
    val candidates = spark.createDataFrame(
      java.util.Arrays.asList(candRows: _*),
      StructType(Seq(
        StructField("query_id", LongType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("cluster_id", IntegerType, nullable = false))))
    val fetchScan = prunedLiveCoded(doc, candRows.map(_.getInt(2)).distinct)
      .select("cluster_id", "id", "vector", "metadata")
      // pushed candidate id-chain — same form and rationale as the
      // unfiltered batch fetch above: reads ∝ candidates, not clusters
      .filter(col("id").isInCollection(
        candRows.map(r => java.lang.Long.valueOf(r.getLong(1)))
          .distinct.toIndexedSeq))
    graft.operators.BatchANN.rerank(spark, fetchScan.filter(pred), candidates,
      qsSub, finalTopK).collect()
  }

  /** Pin the trained index into a memory-resident [[PreparedIndex]] —
    * the low-latency serving form: the covering coded table is cached
    * once as partition-local primitive blocks and each query becomes ONE
    * job (fused ADC + exact rerank in-task, driver merge) instead of a
    * per-query Catalyst plan. Results are bit-identical to
    * [[query]] (gated by the `prepared_knn` DuckDB replay row and
    * PreparedIndexSpec); mutations are handled by delta-refresh
    * (removes AND bounded adds — appended rows join as a side buffer)
    * or transparent fallback to the regular path (retrain / compact /
    * adds past the side-buffer bound) — see [[PreparedIndex]].
    *
    * `numParts` defaults to the scheduler's parallelism: tasks are pure
    * in-memory scans of (nprobe/nlist)·n/numParts rows, so more, smaller
    * tasks only add scheduling overhead.
    */
  def prepareServing(name: String, numParts: Int = -1,
                     addsRefreshIntervalMs: Long =
                       Engine.PreparedAddsRefreshIntervalMs): PreparedIndex = {
    val doc = load(name)
    require(doc.isTrained, s"'$name' has no trained index to prepare")
    // default-shaped requests SHARE the engine's routing handle: one
    // pinned block set serves the auto-routed queries and every explicit
    // caller. Without this, query() + prepareServing() pinned TWO copies
    // of the block set — at the 35M geometry the second build evicted
    // the first's partitions and every sequential serve paid disk
    // re-promotion (r14 eval: 2.07 s prepared p50 from a 35 ms path).
    if (autoRoutePrepared && numParts <= 0 &&
        addsRefreshIntervalMs == Engine.PreparedAddsRefreshIntervalMs) {
      while (true) {
        // tryRetain loses only to a concurrent swap's close of the just
        // published handle; autoPreparedFor rebuilds fresh on re-entry
        autoPreparedFor(load(name)).tryRetain() match {
          case Some(h) => return h
          case None => ()
        }
      }
    }
    buildPrepared(doc.name, numParts, addsRefreshIntervalMs)
  }

  /** The unshared build behind [[prepareServing]] (and the engine's own
    * routing handle): pin the coded blocks and wire the refresh closures.
    */
  private def buildPrepared(name: String, numParts: Int,
                            addsRefreshIntervalMs: Long): PreparedIndex = {
    val doc = load(name)
    require(doc.isTrained, s"'$name' has no trained index to prepare")
    val parts =
      if (numParts > 0) numParts else spark.sparkContext.defaultParallelism
    // the id fence pins the block set to EXACTLY the pinned doc: an add
    // racing prepare would otherwise land its rows both in the blocks
    // (the scan sees the appended files) and in the side buffer (id >
    // pinned.maxId) — served twice
    val blocks = graft.operators.PreparedANN.buildBlocks(
        codedDf(doc).filter(col("id") <= doc.maxId), parts,
        codeM = indexModel(doc).pq.m)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    blocks.count() // materialize the cache at prepare time, not first query
    val collectDeleted = (d: CatalogDoc) =>
      if (d.numPendingDeletes == 0) Array.empty[Long]
      else deletes(d).orderBy("id").collect().map(_.getLong(0))
    // Post-prepare appends (A6 encodes them into the coded table before
    // add() returns) delta-refresh into a driver-local side buffer: the
    // appended rows live in parquet files whose id stats are entirely
    // above the fence, so the pushed `id > fence` filter skips every
    // pre-prepare file at the footer. None past the row cap — the handle
    // degrades to fallback and tells the caller to re-prepare.
    val collectAppended = (d: CatalogDoc, sinceId: Long) => {
      val delta = codedDf(d).filter(col("id") > sinceId)
        .select("cluster_id", "id", "code", "vector", "metadata")
      val packedM =
        if (graft.operators.BatchANN.isPackedCode(delta)) indexModel(d).pq.m
        else -1
      val rows = delta.limit(Engine.MaxPreparedSideRows + 1).collect()
      if (rows.length > Engine.MaxPreparedSideRows) None
      else Some(graft.operators.PreparedANN.foldBlocks(
        rows.iterator.map(r => (r.getInt(0), r)), packedM))
    }
    new PreparedIndex(this, spark, doc, blocks, modelBroadcast(doc),
      collectDeleted, collectAppended, addsRefreshIntervalMs)
  }

  /** The live rows of the probed coded partitions: partition-pruned scan of
    * the covering index minus pending soft-deletes (D2 — the index never
    * serves dead rows; the deletes side is broadcast-small by the
    * compaction threshold).
    */
  /** Probe-list chunk size for the bucketed pruned scan. Each chunk's
    * `cluster_id IN (…)` stays under the parquet push threshold (512, see
    * the constructor conf) so it reaches the reader as a page-prunable
    * predicate; chunks of the SORTED list cover disjoint cluster-id
    * ranges, so their bucket sets barely overlap and each bucket file is
    * still opened ~once across the union. Overridable so specs can force
    * the multi-chunk path on a small nprobe.
    */
  protected def probePushChunk: Int =
    // measurement override (A/B harnesses force a chunk count on a
    // small root — e.g. the union-job lever's submit-overhead A/B,
    // which is data-size independent); production leaves it unset.
    // Parsed tolerantly: non-numeric or <1 values fall back to the
    // default with a warning instead of making every query's
    // `grouped(0)` throw (ADVICE r16)
    sys.env.get("GRAFT_PROBE_PUSH_CHUNK").flatMap(_.toIntOption)
      .filter(_ >= 1)
      .orElse {
        if (sys.env.contains("GRAFT_PROBE_PUSH_CHUNK"))
          log.warn("ignoring GRAFT_PROBE_PUSH_CHUNK=" +
            s"'${sys.env("GRAFT_PROBE_PUSH_CHUNK")}' (need an int >= 1)")
        None
      }
      .getOrElse(500)

  /** Per-instance view of [[Engine.CodedShuffleGroupBytes]] — the
    * grouped coded write's scratch threshold. Overridable so specs can
    * force the multi-group path on a small corpus (layout equality is
    * gated, not assumed — CodedLayoutSpec).
    */
  protected def codedShuffleGroupBytes: Long = Engine.CodedShuffleGroupBytes

  /** Probe-count ceiling for the chunked-union plan, given the table's
    * nlist. Two independent reasons to stop chunking and take one
    * bucket-pruned scan with a row-level residual filter instead:
    * (a) RELATIVE — past ~1/8 of all clusters the page index passes most
    * pages anyway (512-row pages hold 1-2 clusters, but probed clusters
    * this dense leave few prunable gaps), so the union buys little;
    * (b) ABSOLUTE — each 500-probe chunk is its own scan subtree, and
    * Catalyst planning cost grows with the union width (measured ~450 ms
    * at 8 chunks), so cap the width at 32 chunks regardless of nlist.
    * A fixed 4096 cap here was wrong at the 100M geometry (heuristic
    * ceiling nlist 200k, nprobe 6000): 6000 probes are 3% of clusters —
    * page pruning still skips ~97% of the table, and the full-scan
    * branch would read ~33x the bytes of the chunked one.
    */
  protected def maxChunkedProbePush(nlist: Int): Int =
    math.max(512, math.min(nlist / 8, 32 * probePushChunk))
    // (512 floor: below it either plan reads a trivial table — keep the
    // pushed-In shape small fixtures and specs rely on)

  /** The per-chunk branch plans of the pruned coded scan: each chunk's
    * `Filter(In(cluster_id), Filter(In(cluster_bucket), coded))` over the
    * cached analyzed base plan. Built as raw LogicalPlans and analyzed
    * once per consumer (Bridge.ofRows) — the DataFrame-API fold analyzed
    * the accumulated tree at every `.filter`/`.union`, O(chunks²)
    * analyzer passes ≈ 40 ms/query at the 8-chunk 35M shape
    * (PlanFloorProfile r14 attribution).
    */
  private def prunedCodedBranchPlans(doc: CatalogDoc, probes: Array[Int],
                                     serving: Boolean)
      : IndexedSeq[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.{In => ExprIn, Literal => ExprLit}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan}
    val shift = doc.codedBucketShift
    val basePlan =
      (if (serving) codedDfServing(doc) else codedDf(doc)).queryExecution.analyzed
    val bucketAttr = basePlan.output.find(_.name == "cluster_bucket").get
    val clusterAttr = basePlan.output.find(_.name == "cluster_id").get
    def branchPlan(chunk: Array[Int]): LogicalPlan =
      LFilter(
        ExprIn(clusterAttr, chunk.toIndexedSeq.map(v => ExprLit(v))),
        LFilter(
          ExprIn(bucketAttr,
            chunk.map(_ >>> shift).distinct.toIndexedSeq.map(v => ExprLit(v))),
          // serving scans: the probe predicate reaches the parquet
          // reader pre-serialized via read options (the serving session
          // has Spark-side pushdown off) — see Engine.injectedIntInOptions
          if (serving)
            Engine.withReadOptions(basePlan,
              Engine.injectedIntInOptions("cluster_id", chunk))
          else basePlan))
    val sorted = probes.sorted
    if (sorted.length <= maxChunkedProbePush(doc.numClusters))
      sorted.grouped(probePushChunk).map(branchPlan).toIndexedSeq
      // (r15 negative result, ChunkCpuProfile ccp5: splitting each chunk
      // into a UNION of per-bucket branch Filters — so each file's
      // reader serializes only its own ~79-term In-chain instead of the
      // chunk's 445 — did NOT move the concurrent scan (167→177 ms) and
      // ADDED ~70 ms of per-query union planning. The coarse wall is
      // latency-bound on job/task scheduling, not chain-size-bound.)
    else IndexedSeq(branchPlan(sorted)) // row-level only; bucket pruning still applies
  }

  private def withLiveDeletes(doc: CatalogDoc, pruned: DataFrame): DataFrame =
    if (doc.numPendingDeletes == 0) pruned
    else pruned.join(broadcast(deletes(doc)), Seq("id"), "left_anti")

  private[core] def prunedLiveCoded(doc: CatalogDoc, probes: Array[Int]): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{Union => LUnion}
    val pruned =
      if (doc.codedBucketShift < 0)
        // legacy layout: one hive dir per cluster — the In is a pure
        // partition-pruning predicate, never pushed to parquet
        codedDf(doc).filter(
          col("cluster_id").isin(probes.toIndexedSeq.map(Integer.valueOf): _*))
      else {
        val plans = prunedCodedBranchPlans(doc, probes, serving = false)
        org.apache.spark.sql.graftbridge.Bridge.ofRows(spark,
          if (plans.length == 1) plans.head else LUnion(plans))
      }
    withLiveDeletes(doc, pruned)
  }

  // (r15 negative result, RootProfile rootprofile2-4: a per-bucket
  // branch-union candidate fetch — each file's pushed chain carrying
  // only its own candidate ids — measured fetch_collect 116 → 319 ms at
  // 35M even with branches grouped to ≤12 and split-planned on the
  // serving relation; the branch-union's per-query planning and
  // per-branch scan setup outweigh the shorter chains. The single
  // pruned scan + one pushed id-chain below is the measured optimum.)

  /** [[prunedLiveCoded]] split into its chunk scans, one DataFrame per
    * chunk — for the q=1 coarse path, which runs the chunks as
    * CONCURRENT jobs so each chunk's driver-side scan setup (the
    * per-scan Hadoop-conf broadcast) and its tasks overlap instead of
    * serializing (BatchANN.coarseSingleChunked). Row-set union over the
    * returned frames is exactly [[prunedLiveCoded]]'s row set.
    */
  /** The plan-free coarse stage ([[ServingScan]]) when the layout admits
    * it: bucketed coded table, no pending soft-deletes (the custom scan
    * has no anti-join stage — deletes are transient between compactions,
    * and the Catalyst path serves those windows), knob on. Returns None
    * to route the query through the Catalyst chunk scans instead.
    * `GRAFT_SERVING_CUSTOM_SCAN=false` / `-Dgraft.serving.custom.scan=
    * false` restores the Catalyst path engine-wide for A/B.
    */
  private[core] def servingScanCoarse(doc: CatalogDoc, qp: Array[Float],
                                      probes: Array[Int], prelimK: Int)
      : Option[Array[(Long, Double, Int)]] =
    if (doc.codedBucketShift < 0 || doc.numPendingDeletes > 0 ||
        !sys.props.get("graft.serving.custom.scan")
          .orElse(sys.env.get("GRAFT_SERVING_CUSTOM_SCAN"))
          .forall(v => !v.trim.equalsIgnoreCase("false"))) None
    else
      Some(ServingScan.coarse(spark, servingScanEpochFor(doc),
        modelBroadcast(doc), qp, probes, prelimK))

  /** The epoch's data stamp: the doc fields a same-version coded append
    * or per-bucket compaction moves. A CROSS-DRIVER writer saves the doc
    * with a new stamp; this driver's TTL'd doc re-read surfaces it and
    * [[servingScanEpochFor]] rebuilds the listing — so out-of-band coded
    * files are served at doc-TTL granularity, the same visibility rule
    * as every other serving read (was: stale until a version bump,
    * VERDICT r17 #3). Same-driver writers still invalidate eagerly via
    * [[dropServingScanEpoch]].
    */
  private def servingScanStamp(doc: CatalogDoc): String =
    s"${doc.maxId}|${doc.codedOwners}|${doc.codedPacked}"

  /** Epoch lookup with a race-safe build: TrieMap.getOrElseUpdate is not
    * atomic for the builder's side effects, so two cold-epoch queries
    * could each broadcast a Hadoop conf and leak the loser's (ADVICE
    * r17). Cold or stale-stamped builds serialize on the cache monitor —
    * a once-per-epoch event, so contention is irrelevant and the loser's
    * broadcast never exists. Closing a replaced epoch under in-flight
    * queries is safe: unpersist(false) only drops executor copies; the
    * broadcast value re-ships lazily (the model-broadcast eviction has
    * relied on the same semantics since r12).
    */
  private def servingScanEpochFor(doc: CatalogDoc): ServingScan.Epoch = {
    val k = (doc.name, doc.indexVersion)
    val want = servingScanStamp(doc)
    servingScanCache.get(k) match {
      case Some(e) if e.stamp == want => e
      case _ => servingScanCache.synchronized {
        servingScanCache.get(k) match {
          case Some(e) if e.stamp == want => e
          case stale =>
            stale.foreach(_.close())
            val built = buildServingScanEpoch(doc)
            servingScanCache.put(k, built)
            built
        }
      }
    }
  }

  /** Bucket→dir pairs under the exact owner-version rules of
    * [[buildCodedDf]] (stale copies of rewritten buckets stay invisible
    * because only the OWNED dirs are listed), handed to
    * [[ServingScan.buildEpoch]] for the one-per-epoch file listing.
    */
  private def buildServingScanEpoch(doc: CatalogDoc): ServingScan.Epoch = {
    import org.apache.hadoop.fs.Path
    val packed = doc.codedPacked == 1
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("cluster_id", IntegerType, nullable = false),
      if (packed) StructField("code", LongType, nullable = false)
      else StructField("code", ArrayType(IntegerType, containsNull = false),
        nullable = false)))
    // cluster_id rides in the FETCH projection even though the caller
    // only needs (id, vector, metadata): parquet's column-index filter
    // treats a predicate column missing from the projection as "not in
    // file" and returns EMPTY row ranges — the same reason Spark's scans
    // always read their filter columns
    val fetchSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vector", ArrayType(FloatType, containsNull = false),
        nullable = false),
      StructField("metadata", StringType, nullable = true),
      StructField("cluster_id", IntegerType, nullable = false)))
    def bucketsIn(base: Path): Seq[(Int, Path)] = {
      val f = fsFor(base)
      if (!f.exists(base)) Seq.empty
      else f.listStatus(base).iterator.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("cluster_bucket="))
          n.stripPrefix("cluster_bucket=").toIntOption.map(_ -> st.getPath)
        else None
      }.toSeq
    }
    val dirs: Seq[(Int, Path)] =
      if (doc.codedOwners.isEmpty)
        bucketsIn(new Path(s"${doc.indexPath(root)}/coded"))
      else {
        val buckets = Engine.codedBucketCount(math.max(1, doc.numClusters),
          doc.codedBucketShift)
        doc.ownerVersions(buckets).zipWithIndex.groupBy(_._1).toSeq.flatMap {
          case (ownerV, entries) =>
            val owned = entries.iterator.map(_._2).toSet
            bucketsIn(new Path(s"$root/${doc.name}/index/v$ownerV/coded"))
              .filter { case (b, _) => owned(b) }
        }
      }
    ServingScan.buildEpoch(spark, packed, doc.codedBucketShift, schema,
      fetchSchema, dirs, Engine.ServingScanTaskBytes, servingScanMinSplitBytes,
      servingScanStamp(doc))
  }

  /** Byte-range floor for the plan-free serving scan's splits —
    * overridable so specs can force multi-range tasks (and the
    * midpoint-rule footer filtering they depend on) on sbt-test-sized
    * files.
    */
  protected def servingScanMinSplitBytes: Long = 4L << 20

  /** Plan-free candidate fetch (Q4) through the same epoch state as
    * [[servingScanCoarse]] — only taken when that path is eligible, so
    * both stages of a query ride the same snapshot rules. Returns the
    * fetched (id, vector, metadata) frame as a LOCAL relation (≤ prelimK
    * rows by the coarse contract): downstream rerank expressions and
    * caller predicates compose over it exactly as over the scan frame.
    */
  private[core] def servingScanFetchRows(doc: CatalogDoc,
                                          candRows: Array[(Long, Double, Int)])
      : Option[Array[(Long, Array[Float], String)]] =
    if (doc.codedBucketShift < 0 || doc.numPendingDeletes > 0 ||
        !sys.props.get("graft.serving.custom.scan")
          .orElse(sys.env.get("GRAFT_SERVING_CUSTOM_SCAN"))
          .forall(v => !v.trim.equalsIgnoreCase("false"))) None
    else if (candRows.isEmpty) Some(Array.empty) // zero-hit: nothing to scan
    else {
      val idsByCluster = candRows.groupBy(_._3)
        .map { case (c, rs) => c -> rs.map(_._1) }
      Some(ServingScan.fetch(spark, servingScanEpochFor(doc), idsByCluster))
    }

  private[core] def servingScanFetch(doc: CatalogDoc,
                                     candRows: Array[(Long, Double, Int)])
      : Option[DataFrame] =
    servingScanFetchRows(doc, candRows).map { rows =>
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("vector", ArrayType(FloatType, containsNull = false),
          nullable = false),
        StructField("metadata", StringType, nullable = true)))
      spark.createDataFrame(
        java.util.Arrays.asList(rows.map { case (id, v, m) =>
          org.apache.spark.sql.Row(id, v.toSeq, m)
        }: _*), schema)
    }

  /** Driver-side twin of [[rerankFrame]] for ≤ prelimK LOCAL candidate
    * rows: same scoring arithmetic (the dot kernel's double accumulation
    * over float products — [[graft.functions.VectorKernels.dotFF]]),
    * same (cosine desc, id asc) total order (java.lang.Double.compare =
    * Spark's DoubleType sort semantics), same limit-then-rank. Exists
    * because a window+orderBy over a 500-row LOCAL relation still pays a
    * two-stage cluster job (~70 ms at the 35M shape).
    */
  private def rerankLocal(rows: Array[(Long, Array[Float], String)],
                          qn: Array[Float], finalTopK: Int): DataFrame = {
    val scored = rows.map { case (id, v, m) =>
      var s = 0.0
      var i = 0
      val n = v.length
      while (i < n) { s += v(i).toDouble * qn(i).toDouble; i += 1 }
      (id, m, s)
    }
    java.util.Arrays.sort(scored, new java.util.Comparator[(Long, String, Double)] {
      def compare(a: (Long, String, Double), b: (Long, String, Double)): Int = {
        val c = java.lang.Double.compare(b._3, a._3)
        if (c != 0) c else java.lang.Long.compare(a._1, b._1)
      }
    })
    val top = scored.take(finalTopK)
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("metadata", StringType, nullable = true),
      StructField("cosine_similarity", DoubleType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(top.zipWithIndex.map { case ((id, m, s), i) =>
        org.apache.spark.sql.Row(i + 1, id, m, s)
      }: _*), schema)
  }

  private[core] def prunedLiveCodedChunks(doc: CatalogDoc,
                                          probes: Array[Int]): IndexedSeq[DataFrame] =
    if (doc.codedBucketShift < 0) IndexedSeq(prunedLiveCoded(doc, probes))
    else prunedCodedBranchPlans(doc, probes, serving = true).map(p =>
      withLiveDeletes(doc,
        org.apache.spark.sql.graftbridge.Bridge.ofRows(servingSession, p)))

  /** The coded table as ONE DataFrame. With per-bucket compaction a
    * bucket's rows live under the index version that last REWROTE it
    * (`doc.codedOwners`), so the frame is a union of per-owner-version
    * reads — each restricted to exactly the bucket dirs that version
    * still owns (the same version dir may also hold STALE copies of
    * buckets a later compact rewrote; listing the owned dirs explicitly,
    * never the whole dir, is what keeps those invisible). The common
    * case (owners empty: fresh train, bin-pack, legacy) stays a single
    * whole-dir read. Cached per (db, indexVersion) — owners only change
    * on a version bump.
    */
  private def codedDf(doc: CatalogDoc): DataFrame =
    codedDfCache.getOrElseUpdate((doc.name, doc.indexVersion),
      buildCodedDf(doc, spark))

  /** [[codedDf]] read through the SERVING session: identical rows, but the
    * scan plans under [[servingSession]]'s confs. Only the internal
    * coarse path uses it — frames that reach callers stay on the main
    * session.
    */
  private def codedDfServing(doc: CatalogDoc): DataFrame =
    codedDfServingCache.getOrElseUpdate((doc.name, doc.indexVersion),
      buildCodedDf(doc, servingSession))

  /** Session for the INTERNAL serving scans — the per-query coarse chunk
    * jobs. Shares the SparkContext (same executors, same scheduler); the
    * one conf that matters is `files.minPartitionNum = 1`: the default
    * (defaultParallelism) makes Spark split every scan to fill all cores
    * via bytes-per-core, which turns the 8 CONCURRENT ~26 MB-file chunk
    * scans of one query into ~300 one-file tasks — per-task file open +
    * footer + page-index cost dominated the measured coarse stage
    * (RootProfile r14: 319 ms of the 489 ms coarse was pure scan setup).
    * With minPartitionNum=1 the packer fills 128 MB partitions (~4-5
    * files per task), the 8 jobs still land ~60 tasks on 32 cores, and
    * big analytic scans are unaffected (maxPartitionBytes still bounds a
    * task). Analytics/train/fetch scans stay on the MAIN session.
    */
  private[core] lazy val servingSession: SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.files.minPartitionNum", "1")
    // 512 MB split packing for the per-query coarse scans: at the 35M
    // geometry it cut the concurrent chunk scan 154→138 ms and the fresh
    // coarse 271→241 ms (ChunkCpuProfile ccp6 A/B) — fewer per-task
    // reader inits, still ≥2 tasks per bucket file for parallelism
    s.conf.set("spark.sql.files.maxPartitionBytes", "512m")
    // re-pin the engine's scan confs (newSession starts from globals,
    // not from the parent session's runtime values)
    s.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "512")
    s.conf.set("spark.sql.optimizer.inSetConversionThreshold", "1")
    s.conf.set("spark.sql.optimizer.inSetSwitchThreshold", "0")
    // Spark-side parquet pushdown OFF for the serving scans: the probe
    // predicate rides pre-serialized in the relation's read options
    // (Engine.injectedIntInOptions — built once per chunk per query on
    // the driver as parquet's native In), and Spark's own per-file
    // setFilterPredicate — the r15-attributed O(terms²) toString +
    // serialize per reader init, ~99.6% of coarse task CPU — would
    // rebuild and OVERWRITE it. Row-level exactness is unaffected (the
    // logical In Filter stays in the plan); reader-level row-group +
    // page + dictionary pruning still runs off the injected predicate.
    s.conf.set("spark.sql.parquet.filterPushdown", "false")
    s.conf.set("spark.sql.shuffle.partitions",
      spark.conf.get("spark.sql.shuffle.partitions"))
    // measurement overrides for the serving-scan shape (ChunkCpuProfile's
    // A/B harness; production leaves all three unset): the r15 stack
    // attribution put ~99.6% of the coarse scan's task CPU in per-file
    // pushed-filter plumbing (FilterPredicate.toString + gzip/Java
    // serialization into a cloned Hadoop conf, O(or-chain terms) each),
    // so these gate which predicate shape and task packing the chunk
    // scans plan under while the fix is being measured.
    sys.env.get("GRAFT_SERVING_IN_THRESHOLD").foreach(v =>
      s.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", v))
    sys.env.get("GRAFT_SERVING_MAXPART").foreach(v =>
      s.conf.set("spark.sql.files.maxPartitionBytes", v))
    sys.env.get("GRAFT_SERVING_PUSHDOWN").foreach(v =>
      s.conf.set("spark.sql.parquet.filterPushdown", v))
    s
  }

  private def buildCodedDf(doc: CatalogDoc, spark: SparkSession): DataFrame = {
      if (doc.codedOwners.isEmpty || doc.codedBucketShift < 0)
        spark.read.schema(codedReadSchema(doc.codedBucketShift, doc.codedPacked == 1))
          .parquet(s"${doc.indexPath(root)}/coded")
      else {
        val buckets = Engine.codedBucketCount(math.max(1, doc.numClusters),
          doc.codedBucketShift)
        val owners = doc.ownerVersions(buckets)
        owners.zipWithIndex.groupBy(_._1).toSeq.sortBy(_._1).map {
          case (ownerV, entries) =>
            val base = s"$root/${doc.name}/index/v$ownerV/coded"
            val basePath = new org.apache.hadoop.fs.Path(base)
            val f = fsFor(basePath)
            // a bucket with no rows never materialized a dir — list what
            // the owner version actually wrote and intersect
            val present: Set[Int] =
              if (!f.exists(basePath)) Set.empty
              else f.listStatus(basePath).iterator.flatMap { st =>
                val n = st.getPath.getName
                if (n.startsWith("cluster_bucket="))
                  n.stripPrefix("cluster_bucket=").toIntOption
                else None
              }.toSet
            val dirs = entries.iterator.map(_._2).filter(present)
              .map(b => s"$base/cluster_bucket=$b").toSeq
            if (dirs.isEmpty)
              spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                codedReadSchema(doc.codedBucketShift, doc.codedPacked == 1))
            else
              spark.read.schema(codedReadSchema(doc.codedBucketShift, doc.codedPacked == 1))
                .option("basePath", base).parquet(dirs: _*)
        }.reduce(_ union _)
      }
  }

  /** Coded-table layout sizing at train time — overridable so specs can
    * force a multi-bucket layout on a corpus small enough for `sbt test`
    * (the production rule needs ≥32 MB per extra bucket).
    */
  protected def chooseCodedBucketShift(n: Long, nlist: Int, d: Int,
                                       m: Int): Int =
    Engine.codedBucketShift(n, nlist, d, m)

  /** Read schema for a coded table: the bucketed layout's partition column
    * joins the declared schema (legacy layout reconstructs `cluster_id`
    * from its hive dirs instead).
    */
  private def codedReadSchema(shift: Int, packed: Boolean): StructType = {
    // explicit schema (inference dies on a legitimately-empty index), so
    // the layout must come from the catalog, not the files
    val base =
      if (!packed) codedSchema
      else StructType(codedSchema.fields.map(f =>
        if (f.name == "code") StructField("code", LongType, nullable = false)
        else f))
    if (shift < 0) base
    else StructType(base.fields :+
      StructField("cluster_bucket", IntegerType, nullable = false))
  }

  // ----------------------------------------------------------------- train

  /** T1-T19 — build the PCA→IVF→PQ index over the current snapshot and
    * swap it in (mindb.py:231-344). Residual PQ encoding, matching Faiss
    * IVFPQ. No-op below the flat floor (T3, mindb.py:276-287);
    * `minTrainRows` lowers that floor for fixtures/tests only — the
    * reference default stands for real callers.
    *
    * Safe to run CONCURRENTLY with adds/removes on the same db (M5/M6 —
    * the reference's training-thread semantics, fastapi.py:246-311):
    * training reads a PINNED snapshot (file listing frozen at start, plus
    * an `id <= snapshotMaxId` fence); the swap recomputes the churn
    * counters from the then-live rows so mutations that landed mid-train
    * reconcile exactly; and a post-swap drain encodes rows added during
    * training into the new coded table (the reference's
    * `unassigned_vectors` cleanup, fastapi.py:264-287) — after "complete",
    * every live row is servable from the trained index. Status lifecycle
    * via [[trainingStatus]]. `onSnapshot` is a deterministic test seam:
    * called once, right after the snapshot is pinned — mutations made
    * inside it are by construction "during training".
    */
  def train(name: String,
            params: Option[IndexParams] = None,
            useTwoLevelClustering: Option[Boolean] = None,
            kmeansIters: Int = 25,
            maxMemoryUsage: Long = Engine.DefaultMaxMemoryUsage,
            seed: Long = 42L,
            minTrainRows: Int = Heuristics.FlatIndexFloor,
            onSnapshot: () => Unit = () => (),
            onSwapped: () => Unit = () => ()): CatalogDoc = {
    val epoch = beginTraining(name)
    val incarnation = scala.util.Try(load(name).createdAt).getOrElse(-1L)
    try {
      val (doc, didTrain, snapshotMaxId, reconcileTo) = trainImpl(name, params,
        useTwoLevelClustering, kmeansIters, maxMemoryUsage, seed, minTrainRows,
        onSnapshot)
      if (!didTrain) {
        // reference parity: a train that produced no new index reports
        // "failed" at the status endpoint (fastapi.py:288-296)
        setTrainStatus(name, epoch, "failed")
        doc
      } else {
        setTrainStatus(name, epoch, "trained")
        onSwapped() // test seam — deterministic swapped-but-draining window
        val out = reconcileAfterTrain(name, snapshotMaxId, reconcileTo)
        setTrainStatus(name, epoch, "complete")
        out
      }
    } catch {
      case e: Throwable => failTrainStatus(name, epoch, incarnation, e); throw e
    }
  }

  /** Failure-path status: a db that no longer exists — or exists only as a
    * NEWER incarnation (dropped and recreated while this train ran; its
    * pinned files vanishing is a typical proximate failure) — gets its
    * entry CLEARED: trainingStatus must read "not started", never a stale
    * "failed" leaked from a previous incarnation. Every genuine failure of
    * a still-live db reports "failed".
    */
  private def failTrainStatus(name: String, epoch: Long, incarnation: Long,
                              e: Throwable): Unit =
    if (e.isInstanceOf[Engine.DroppedDuringTrainingException] ||
        scala.util.Try(load(name).createdAt).getOrElse(-1L) != incarnation)
      clearTrainStatus(name, epoch)
    else setTrainStatus(name, epoch, "failed")

  /** The async training verb (POST /db/{name}/train, fastapi.py:314-331):
    * claims the training slot, runs [[train]] on a background thread, and
    * returns immediately. Progress via [[trainingStatus]]; failures are
    * logged and reported as status "failed" (T20 — the catalog is left
    * untouched). Adds/removes/queries against the db proceed while it
    * runs; join the returned thread to wait for "complete".
    */
  def trainAsync(name: String,
                 params: Option[IndexParams] = None,
                 useTwoLevelClustering: Option[Boolean] = None,
                 kmeansIters: Int = 25,
                 maxMemoryUsage: Long = Engine.DefaultMaxMemoryUsage,
                 seed: Long = 42L,
                 minTrainRows: Int = Heuristics.FlatIndexFloor,
                 onSnapshot: () => Unit = () => (),
                 onSwapped: () => Unit = () => ()): Thread = {
    val epoch = beginTraining(name)
    val incarnation = scala.util.Try(load(name).createdAt).getOrElse(-1L)
    val t = new Thread(() => {
      try {
        val (_, didTrain, snapshotMaxId, reconcileTo) = trainImpl(name, params,
          useTwoLevelClustering, kmeansIters, maxMemoryUsage, seed, minTrainRows,
          onSnapshot)
        if (!didTrain) setTrainStatus(name, epoch, "failed")
        else {
          setTrainStatus(name, epoch, "trained")
          onSwapped()
          reconcileAfterTrain(name, snapshotMaxId, reconcileTo)
          setTrainStatus(name, epoch, "complete")
        }
      } catch {
        case e: Throwable =>
          log.warn(s"async train of '$name' failed: ${e.getMessage}")
          failTrainStatus(name, epoch, incarnation, e)
      }
    }, s"graft-train-$name")
    t.setDaemon(true)
    t.start()
    t
  }

  /** Returns (finalDoc, didTrain, snapshotMaxId, reconcileTo): the swap
    * runs inside the db lock; `reconcileTo` is the highest id assigned
    * when the swap landed — ids in (snapshotMaxId, reconcileTo] were
    * added DURING training and still need encoding into the new coded
    * table (ids above it arrive after the swap and go through the normal
    * A6 incremental-insert path).
    */
  private def trainImpl(name: String,
            params: Option[IndexParams],
            useTwoLevelClustering: Option[Boolean],
            kmeansIters: Int,
            maxMemoryUsage: Long,
            seed: Long,
            minTrainRows: Int,
            onSnapshot: () => Unit): (CatalogDoc, Boolean, Long, Long) = {
    // Pin the training snapshot under the lock: the parquet file listing
    // is frozen when the DataFrame resolves, and the id fence excludes
    // any row a concurrent add assigns after this point.
    val (doc, pinnedFull, snapshotMaxId) = dbLock(name).synchronized {
      val d = load(name)
      (d, snapshot(d).filter(col("id") <= d.maxId), d.maxId)
    }
    onSnapshot() // test seam — deterministic "during training" window
    val table = pinnedFull.select("id", "vector")
    val n = table.count()
    if (n < minTrainRows) return (doc, false, snapshotMaxId, snapshotMaxId) // T3 small-db bypass

    val d = doc.vectorDimension
    // T2 — train validation (input_validation.py:15-51)
    require(d > 0, "no vectors have been added to the database")
    val p = params.getOrElse(Heuristics.defaultIndexParams(d))
    require(p.pcaDimension >= 1, s"pca_dimension is not positive: ${p.pcaDimension}")
    require(p.compressedVectorBytes >= 1,
      s"compressed_vector_bytes is not positive: ${p.compressedVectorBytes}")
    require(p.pcaDimension <= d,
      s"pca_dimension ${p.pcaDimension} is larger than the vector dimension $d")
    if (!p.omitOpq) {
      require(p.opqDimension >= 1, s"opq_dimension is not positive: ${p.opqDimension}")
      require(p.opqDimension <= p.pcaDimension,
        s"opq_dimension ${p.opqDimension} is larger than pca_dimension ${p.pcaDimension}")
      require(p.opqDimension % p.compressedVectorBytes == 0,
        s"opq_dimension ${p.opqDimension} is not divisible by " +
          s"compressed_vector_bytes ${p.compressedVectorBytes}")
    }
    if (p.omitOpq) // PQ trains directly on the PCA output
      require(p.pcaDimension % p.compressedVectorBytes == 0,
        "pca_dimension must be divisible by compressed_vector_bytes")
    val nlist = math.max(1, Heuristics.numClusters(n))
    val nprobe = math.max(1, Heuristics.nProbe(nlist))

    // T10 — PCA fit on a 100·d sample; optional OPQ rotation fit in PCA
    // space, composed into ONE effective projection matrix (Pca.compose)
    val pcaBase =
      if (p.pcaDimension == d) Pca.identity(d)
      else Pca.fit(table, "vector", d, p.pcaDimension,
        sampleSize = math.min(n, 100L * d).toInt, seed = seed, totalRows = n)
    val (pca, effDim) =
      if (p.omitOpq) (pcaBase, p.pcaDimension)
      else {
        val sampleN = 64 * 256
        val opqSample = projectedView(table, pcaBase)
          .sample(withReplacement = false, math.min(1.0, sampleN * 1.1 / n), seed)
          .limit(sampleN)
          .select("pvec").collect()
          .map(_.getSeq[Double](0).map(_.toFloat).toArray)
        val r = Opq.fit(opqSample, p.opqDimension, p.compressedVectorBytes,
          seed = seed)
        (Pca.compose(pcaBase, r), p.opqDimension)
      }
    val projected = projectedView(table, pca)

    // T7 — strategy chooser (training_utils.py:75-88): two-level when the
    // RAM-capped subsample would leave < 39 vectors/cluster
    val twoLevel = useTwoLevelClustering.getOrElse(
      Heuristics.isTwoLevelClusteringOptimal(maxMemoryUsage, d, n))

    // T9/T11-T15 — centroids in PCA space
    val centroids: Array[Array[Float]] =
      if (twoLevel)
        TwoLevelClustering.fit(projected, "pvec", effDim, nlist,
          kmeansIters, seed, totalRows = n)
      else {
        val sampleN = math.min(n, 256L * nlist)
        val sample = projected.sample(withReplacement = false,
          math.min(1.0, sampleN.toDouble / n), seed)
        KMeansDF.fitDistributed(sample, "pvec", effDim, nlist,
          kmeansIters, seed)
      }

    // T15 — PQ codebooks on a 64·256-row sample of assigned residuals
    // (one cheap sample() pass; residuals computed by the broadcast kernel)
    val pqN = 64 * 256
    val pqSample = projected
      .sample(withReplacement = false, math.min(1.0, pqN * 1.1 / n), seed)
      .limit(pqN)
      .select(Coder.residualCol(spark, centroids, col("pvec")).as("res"))
      .collect().map(_.getSeq[Double](0).map(_.toFloat).toArray)
    val pq = ProductQuantizer.fit(pqSample, p.compressedVectorBytes,
      iters = kmeansIters, seed = seed)

    // T18 — single full pass: project + assign + residual-encode + write
    // the covering coded table (vector + metadata ride along so serving
    // never rescans the base table)
    val model = IndexModel(pca, centroids, pq)
    // the index version is stable for the whole train: the only other
    // writers that bump it (compact, coded-table bin-packing) defer while
    // the status is "in progress"
    val newVersion = doc.indexVersion + 1
    val indexDir = s"$root/$name/index/v$newVersion"
    val bucketShift = chooseCodedBucketShift(n, nlist, d,
      p.compressedVectorBytes)
    val packNewTable = packedCodesOnTrain && p.compressedVectorBytes <= 8
    writeCoded(pinnedFull, model, bucketShift, nlist, s"$indexDir/coded",
      packNewTable,
      // covering-row estimate: id+overheads ~16 B, 4-byte floats, ~96 B
      // code+metadata — drives the low-scratch grouped write at scale
      estBytes = n * (16L + 4L * d + 96L))
    IndexStore.saveModel(spark, indexDir, model)

    // T19 — atomic swap. Counters are RECOMPUTED from the then-live rows
    // (not carried from train start) so adds/removes that landed during
    // training reconcile exactly: trained_on = snapshot size, removed =
    // snapshot rows no longer live, new = live rows past the snapshot
    // fence (reference counter semantics, mindb.py:459-489 +
    // test_fastapi.py:102-152's 32,000 / 0.9375 assertions).
    dbLock(name).synchronized {
      // same-name is not enough: a drop + recreate during training must
      // not receive the old incarnation's index (the coded table would
      // serve rows the new db never had) — the creation stamp pins it
      if (!Catalog.exists(root, name) ||
          load(name).createdAt != doc.createdAt)
        throw new Engine.DroppedDuringTrainingException(name)
      var cur = load(name)
      val live = snapshot(cur).agg(
        sum(when(col("id") <= snapshotMaxId, 1L).otherwise(0L)),
        sum(when(col("id") > snapshotMaxId, 1L).otherwise(0L))).first()
      val liveTrained = if (live.isNullAt(0)) 0L else live.getLong(0)
      val liveNew = if (live.isNullAt(1)) 0L else live.getLong(1)
      // the fresh index supersedes EVERY old index version, including
      // bucket-owner versions a per-bucket compact left referenced
      val oldIndexPaths =
        if (!cur.isTrained) Seq.empty[String]
        else {
          val owners =
            if (cur.codedOwners.isEmpty || cur.codedBucketShift < 0)
              Set(cur.indexVersion)
            else cur.ownerVersions(Engine.codedBucketCount(
              math.max(1, cur.numClusters), cur.codedBucketShift)).toSet +
              cur.indexVersion
          owners.toSeq.sorted.map(v => s"$root/$name/index/v$v")
        }
      val reconcileTo = cur.maxId
      cur = Catalog.withParams(cur, p, nlist, nprobe).copy(
        usedTwoLevel = if (twoLevel) 1 else 0,
        codedBucketShift = bucketShift,
        codedOwners = "",
        codedPacked = if (packNewTable) 1 else 0,
        indexVersion = newVersion,
        maxTrainedId = snapshotMaxId,
        numVectorsTrainedOn = n,
        numTrainedVectorsRemoved = n - liveTrained,
        numNewVectors = liveNew)
      saveDoc(cur)
      markSuperseded(oldIndexPaths: _*)
      (cur, true, snapshotMaxId, reconcileTo)
    }
  }

  /** Post-swap reconciliation (the reference's `unassigned_vectors` drain
    * + deferred-removal cleanup, fastapi.py:264-287, 215-243): encode the
    * live rows added during training — ids in (snapshotMaxId,
    * reconcileTo] — into the NEW coded table, then apply any compaction
    * the in-progress guard deferred. After this returns, the coded table
    * serves every live row (`n_total == num_vectors` in reference terms).
    */
  private def reconcileAfterTrain(name: String, snapshotMaxId: Long,
                                  reconcileTo: Long): CatalogDoc =
    dbLock(name).synchronized {
      var doc = load(name)
      if (doc.isTrained && reconcileTo > snapshotMaxId) {
        val pending = snapshot(doc)
          .filter(col("id") > snapshotMaxId && col("id") <= reconcileTo)
        appendToCodedTable(doc, indexModel(doc), pending)
      }
      val physicalRows = doc.maxId + 1
      if (physicalRows > 0 &&
          doc.numPendingDeletes.toDouble / physicalRows >= Engine.CompactionThreshold)
        doc = compact(name)
      // a coded-table bin-pack the in-progress guard deferred is applied
      // here too (both no-op below their thresholds, or re-defer if a
      // SECOND train already claimed the slot during our drain window)
      maybeCompactCoded(name)
      load(name)
    }

  /** `(id, pvec)` PCA-space view of `(id, vector)` rows. Identity PCA is a
    * plain cast (no d×d matmul); otherwise the matrix ships as a broadcast.
    */
  private def projectedView(rows: DataFrame, pca: PcaModel): DataFrame =
    if (pca.isIdentity)
      rows.select(col("id"), col("vector").cast("array<double>").as("pvec"))
    else
      rows.select(col("id"), Coder.pcaApplyCol(spark, pca, col("vector")).as("pvec"))

  /** T18 — fused project+assign+residual+PQ-encode (broadcast kernel,
    * plan size O(1) in nlist/m), written in the bucketed IVF layout
    * (`shift` from [[Engine.codedBucketShift]]). Carries the covering
    * columns (vector, metadata).
    *
    * DISK ENVELOPE (r15): the bucket repartition shuffles the full
    * covering rows — at 768-d that is ~3.2 KB/row of incompressible
    * float bytes ON TOP of the input table and the final parquet, which
    * is what ENOSPC'd the r14 10M×768 run (~11 GB scratch per M rows,
    * EVAL_r14). When `estBytes` exceeds [[Engine.CodedShuffleGroupBytes]]
    * the write splits into BUCKET GROUPS: each group's job re-runs the
    * (deterministic) assign+encode projection and shuffles only its own
    * buckets' rows, so peak shuffle scratch is ~1/groups of the table.
    * Costs `groups` extra scans + assign passes of the input (~10-20% of
    * train at the 768-d geometry) only when the one-shot form would
    * threaten the disk quota; layout, file count, and per-bucket row
    * order are identical to the one-shot write (each bucket is written
    * by exactly one group, same bucket partition count, same
    * sortWithinPartitions).
    */
  private def writeCoded(rows: DataFrame, model: IndexModel, shift: Int,
                         nlist: Int, path: String, packed: Boolean,
                         estBytes: Long = -1L): Unit = {
    val groups =
      if (shift < 0 || estBytes <= 0) 1
      else math.min(Engine.codedBucketCount(nlist, shift).toLong,
        (estBytes + codedShuffleGroupBytes - 1) /
          codedShuffleGroupBytes).toInt
    if (groups <= 1)
      writeCodedRows(assignEncode(rows, model, packed), shift, nlist, path,
        "overwrite")
    else {
      val buckets = Engine.codedBucketCount(nlist, shift)
      log.info(s"coded write in $groups bucket groups " +
        s"(~${estBytes / (1 << 30)} GiB covering bytes, $buckets buckets)")
      val baseline = shuffleScratchBytes()
      (0 until groups).foreach { g =>
        val encoded = assignEncode(rows, model, packed)
        val inGroup = encoded.filter(
          (expr(s"cluster_id div ${1L << shift}") % groups).cast("int") === g)
        writeCodedRows(inGroup, shift, nlist, path,
          if (g == 0) "overwrite" else "append")
        // a group's exchange files linger until its ShuffleDependency is
        // GC'd and the (async) ContextCleaner removes them — AWAIT the
        // drain before the next group's shuffle starts, else the two
        // exchanges coexist and the documented ~1/groups peak-scratch
        // envelope (the whole point of grouping) is silently void
        // (ADVICE r15: gc() alone only NUDGED the cleaner). Bounded: on
        // timeout we log and proceed rather than hang the train.
        if (g < groups - 1) awaitShuffleDrain(baseline)
      }
    }
  }

  /** Total bytes of shuffle files under this context's block-manager
    * scratch dirs (`spark.local.dir`, default `java.io.tmpdir` —
    * local-mode layout: each dir holds `blockmgr-<uuid>` trees with
    * `shuffle_*.{data,index}` leaves). Racy-by-design: files vanishing
    * mid-walk read as 0. CLUSTER CAVEAT: this walks the DRIVER's local
    * dirs only — in local mode that is every shuffle file; on a real
    * cluster the executors hold the shuffle files and this undercounts,
    * so [[awaitShuffleDrain]] degrades to the gc-nudge best-effort
    * there (the bounded timeout guarantees progress either way; a
    * cluster deployment that needs the strict envelope should gate on
    * executor disk metrics instead).
    */
  private def shuffleScratchBytes(): Long = {
    def sum(f: java.io.File): Long = {
      val kids = f.listFiles()
      if (kids == null) // plain file (or vanished dir)
        if (f.getName.startsWith("shuffle_")) f.length() else 0L
      else kids.foldLeft(0L)((acc, k) => acc + sum(k))
    }
    spark.sparkContext.getConf
      .get("spark.local.dir", System.getProperty("java.io.tmpdir"))
      .split(",").iterator.map(_.trim).filter(_.nonEmpty)
      .flatMap { d =>
        val kids = new java.io.File(d).listFiles()
        if (kids == null) Iterator.empty
        else kids.iterator.filter(f => f.getName.startsWith("blockmgr-"))
      }.foldLeft(0L)((acc, bm) => acc + sum(bm))
  }

  /** Wait (bounded) until shuffle scratch drains back to ~`baseline` —
    * GC makes the dropped group's ShuffleDependency collectable, the
    * ContextCleaner then deletes its files asynchronously; we poll the
    * dirs because the cleaner exposes no completion signal. The slack
    * absorbs unrelated concurrent jobs' scratch; on timeout (a pinned
    * reference, a busy cleaner queue) we log loudly and proceed — the
    * envelope degrades to the pre-await best-effort rather than the
    * train hanging.
    */
  private def awaitShuffleDrain(baseline: Long,
                                timeoutMs: Long = 120000L): Unit = {
    val slack = 256L << 20
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var cur = shuffleScratchBytes()
    // One gc() makes the dropped ShuffleDependency collectable; the
    // ContextCleaner's deletion is then async, so the wait is for the
    // cleaner, not for more gcs. Nudge again only on a backed-off
    // cadence (1 s, 2 s, 4 s, ... capped at 15 s) — a 200 ms gc loop
    // here meant up to 600 forced full GCs per group on a large heap
    // (ADVICE r16), stalling the very cleaner thread we're waiting on.
    var nextGcNanos = 0L
    var gcBackoffMs = 1000L
    while (cur > baseline + slack && System.nanoTime() < deadline) {
      if (System.nanoTime() >= nextGcNanos) {
        System.gc()
        nextGcNanos = System.nanoTime() + gcBackoffMs * 1000000L
        gcBackoffMs = math.min(gcBackoffMs * 2, 15000L)
      }
      Thread.sleep(200)
      cur = shuffleScratchBytes()
    }
    if (cur > baseline + slack)
      log.warn(s"grouped coded write: shuffle scratch still " +
        s"~${cur >> 20} MiB (baseline ${baseline >> 20} MiB) after " +
        s"$timeoutMs ms - proceeding; the next group's exchange may " +
        "stack on the previous one's")
  }

  /** The one coded-table writer: IVF inverted lists as parquet layout.
    *
    * `shift >= 0` (bucketed): `2^shift` consecutive clusters share one
    * `cluster_bucket` hive dir; rows sort by `cluster_id` within each
    * file so parquet stats prune inside a bucket. File count tracks data
    * bytes (≈32 MB each), not nlist — at nlist 91k the legacy layout laid
    * down 78,969 ~125 KB files (EVAL_r09), a small-file storm per query
    * and an object-store bomb at 100 TB. `shift < 0` keeps the legacy
    * one-dir-per-cluster layout of pre-r10 tables (reads stay
    * compatible; every retrain upgrades in place).
    */
  private def writeCodedRows(coded: DataFrame, shift: Int, nlist: Int,
                             path: String, mode: String): Unit =
    if (shift < 0)
      coded.drop("cluster_bucket")
        .repartition(col("cluster_id"))
        .write.mode(mode).partitionBy("cluster_id").parquet(path)
    else {
      val buckets = Engine.codedBucketCount(nlist, shift)
      coded.drop("cluster_bucket")
        .withColumn("cluster_bucket",
          expr(s"cluster_id div ${1L << shift}").cast("int"))
        .repartition(buckets, col("cluster_bucket"))
        .sortWithinPartitions("cluster_bucket", "cluster_id")
        .write.mode(mode)
        // Page granularity IS the read precision of this layout: the
        // column index prunes row-RANGES at cluster_id-page granularity,
        // and page SIZE alone leaves int pages holding ~16k values
        // (~42 clusters at the 35M geometry — measured: page pruning
        // passed 81% of rows and the single-query exec p50 regressed
        // 1.3 s → 1.7 s). The ROW-COUNT limit is the effective knob:
        // 512-row pages ≈ 1-2 clusters per cluster_id page, so a pushed
        // probe-In reads ~the probed clusters' rows — per-cluster-dir
        // read precision from ~200x fewer files. Costs page-header
        // overhead on this table only (CodedLayoutSpec asserts the
        // granularity actually lands on disk).
        .option("parquet.page.size", (64 * 1024).toString)
        .option("parquet.page.row.count.limit", "512")
        .partitionBy("cluster_bucket").parquet(path)
    }

  /** Incremental insert (A6). Each appended row lands in the version dir
    * that OWNS its cluster_bucket (after a per-bucket compact different
    * buckets live under different versions) — one append-write per
    * distinct owner, all reading one persisted encode pass. Owner count
    * is small (grows by ≤1 per compact, reset by every train/bin-pack).
    */
  private def appendToCodedTable(doc: CatalogDoc, model: IndexModel,
                                 rows: DataFrame): Unit = {
    // appends must match the TABLE's layout, not the train-time knob
    val encoded = assignEncode(rows, model, doc.codedPacked == 1)
    val nlist = math.max(1, doc.numClusters)
    if (doc.codedOwners.isEmpty || doc.codedBucketShift < 0)
      writeCodedRows(encoded, doc.codedBucketShift, nlist,
        s"${doc.indexPath(root)}/coded", "append")
    else {
      val buckets = Engine.codedBucketCount(nlist, doc.codedBucketShift)
      val byOwner = doc.ownerVersions(buckets).zipWithIndex.groupBy(_._1)
      encoded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        byOwner.toSeq.sortBy(_._1).foreach { case (ownerV, entries) =>
          val owned = entries.map(_._2).toIndexedSeq.map(Integer.valueOf)
          val subset = encoded.filter(
            expr(s"cluster_id div ${1L << doc.codedBucketShift}").cast("int")
              .isin(owned: _*))
          writeCodedRows(subset, doc.codedBucketShift, nlist,
            s"$root/${doc.name}/index/v$ownerV/coded", "append")
        }
      } finally encoded.unpersist()
    }
    // same-version append: the cached frame's FileIndex is now stale
    codedDfCache.remove((doc.name, doc.indexVersion))
    codedDfServingCache.remove((doc.name, doc.indexVersion))
    dropServingScanEpoch((doc.name, doc.indexVersion))
  }

  /** Parquet files under a directory (recursive; 0 if absent). */
  private def countParquetFiles(dir: org.apache.hadoop.fs.Path): Int = {
    val f = fsFor(dir)
    if (!f.exists(dir)) return 0
    var n = 0
    val it = f.listFiles(dir, true)
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }

  /** Parquet data files the coded table would READ — per owned bucket dir
    * when ownership is split across versions (stale copies of rewritten
    * buckets left in old version dirs don't count; they're vacuum's
    * problem, not the bin-pack trigger's).
    */
  private def codedFileCount(doc: CatalogDoc): Int =
    if (doc.codedOwners.isEmpty || doc.codedBucketShift < 0)
      countParquetFiles(new org.apache.hadoop.fs.Path(doc.indexPath(root), "coded"))
    else {
      val buckets = Engine.codedBucketCount(math.max(1, doc.numClusters),
        doc.codedBucketShift)
      doc.ownerVersions(buckets).zipWithIndex.iterator.map { case (v, b) =>
        countParquetFiles(new org.apache.hadoop.fs.Path(
          s"$root/${doc.name}/index/v$v/coded/cluster_bucket=$b"))
      }.sum
    }

  /** Bin-pack the coded table once post-train appends have accreted more
    * than [[Engine.CodedFilesPerCluster]] files per cluster: one
    * cluster-partitioned rewrite into a fresh index version (atomic
    * pointer swap, same machinery as [[compact]]), so the pruned serving
    * scan keeps reading O(nprobe) right-sized files no matter how many
    * small adds trickled in. Trained query results are unchanged — the
    * rewrite only rearranges rows into fewer files.
    */
  private def maybeCompactCoded(name: String): Unit = {
    val doc = load(name)
    if (!doc.isTrained) return
    // defers while a train is in flight — same version-allocation rule
    // as compact(); reconcileAfterTrain re-runs this check post-drain
    if (trainingStatus(name) == "in progress") return
    val units =
      if (doc.codedBucketShift < 0) math.max(1, doc.numClusters)
      else Engine.codedBucketCount(math.max(1, doc.numClusters), doc.codedBucketShift)
    val files = codedFileCount(doc)
    if (files <= Engine.CodedFilesPerCluster * units) return
    val model = indexModel(doc)
    val newVersion = doc.indexVersion + 1
    val newDir = s"$root/$name/index/v$newVersion"
    writeCodedRows(codedDf(doc), doc.codedBucketShift,
      math.max(1, doc.numClusters), s"$newDir/coded", "overwrite")
    IndexStore.saveModel(spark, newDir, model)
    // the bin-pack consolidates EVERY owner version into the new one
    val oldPaths = (
      (if (doc.codedOwners.isEmpty || doc.codedBucketShift < 0)
         Set(doc.indexVersion)
       else doc.ownerVersions(Engine.codedBucketCount(
         math.max(1, doc.numClusters), doc.codedBucketShift)).toSet +
         doc.indexVersion)
      ).toSeq.sorted.map(v => s"$root/$name/index/v$v")
    saveDoc(doc.copy(indexVersion = newVersion, codedOwners = ""))
    markSuperseded(oldPaths: _*)
    log.info(s"coded-table compaction: '$name' index v${doc.indexVersion} → " +
      s"v$newVersion ($files files exceeded ${Engine.CodedFilesPerCluster}×$units)")
  }

  /** (id, vector, metadata) rows → covering coded rows. The projection and
    * the fused assign+encode kernel run in one scan; vector/metadata pass
    * through untouched.
    */
  private def assignEncode(rows: DataFrame, model: IndexModel,
                           packed: Boolean): DataFrame = {
    val withP =
      if (model.pca.isIdentity)
        rows.withColumn("pvec", col("vector").cast("array<double>"))
      else
        rows.withColumn("pvec", Coder.pcaApplyCol(spark, model.pca, col("vector")))
    // packed layout (codedPacked = 1): fold the m 0..255 entries into one
    // BIGINT, lowest subquantizer in the lowest byte — a pure column
    // expression, so the encode stage stays in whole-stage codegen
    val codeCol =
      if (!packed) col("code")
      else {
        require(model.pq.m <= 8, "packed code layout holds at most 8 bytes")
        (0 until model.pq.m).map(j =>
            shiftleft(element_at(col("code"), j + 1).cast("long"), 8 * j))
          .reduce((a, b) => a.bitwiseOR(b))
      }
    Coder.assignEncodeBatched(
        withP.select(col("id"), col("vector"), col("metadata"), col("pvec")),
        "pvec", model.centroids, model.pq)
      .select(col("id"), col("vector"), col("metadata"),
        codeCol.as("code"), col("cluster_id"))
  }

  /** Drop unreferenced snapshot/index/deletes versions (everything below
    * the catalog's current pointers). Readers resolve paths through the
    * catalog and the pointer swap is atomic, so only queries PLANNED
    * against an already-replaced version could still want the old files —
    * `graceMillis` protects exactly those: a version directory superseded
    * less recently than the grace window is swept, one replaced within it
    * is retained for in-flight readers (a maintenance scheduler should
    * pass a grace ≥ its longest query). The supersession moment is an
    * EXPLICIT stamp — a `_SUPERSEDED` marker file [[markSuperseded]]
    * writes at every pointer swap — not the dir's mtime, which object
    * stores don't maintain for "directories" at all. A stale dir with no
    * marker (crash between catalog save and marking, or a pre-port
    * table) is marked NOW and collected by a later sweep once its grace
    * elapses. Returns the number of version directories removed.
    */
  def vacuum(name: String, graceMillis: Long = 0L): Int = {
    val doc = load(name)
    val cutoff = System.currentTimeMillis() - graceMillis
    val f = fsFor(new org.apache.hadoop.fs.Path(root))
    // index versions still REFERENCED as bucket owners (per-bucket
    // compaction leaves untouched buckets in older version dirs) are
    // never sweepable, no matter how old
    val referencedIdx: Set[Int] =
      if (!doc.isTrained) Set.empty
      else if (doc.codedOwners.isEmpty || doc.codedBucketShift < 0)
        Set(doc.indexVersion)
      else doc.ownerVersions(Engine.codedBucketCount(
        math.max(1, doc.numClusters), doc.codedBucketShift)).toSet +
        doc.indexVersion
    def sweep(parent: org.apache.hadoop.fs.Path, prefix: String, current: Int,
              referenced: Int => Boolean): Int = {
      if (!f.exists(parent)) return 0
      f.listStatus(parent).count { st =>
        val n = st.getPath.getName
        val old = n.startsWith(prefix) &&
          n.stripPrefix(prefix).toIntOption.exists(v => v < current && !referenced(v))
        val stale = old && supersededAt(f, st.getPath) <= cutoff
        if (stale) f.delete(st.getPath, true)
        stale
      }
    }
    val base = new org.apache.hadoop.fs.Path(root, name)
    sweep(new org.apache.hadoop.fs.Path(base, "data"), "v", doc.dataVersion, _ => false) +
      sweep(new org.apache.hadoop.fs.Path(base, "index"), "v", doc.indexVersion,
        referencedIdx.contains) +
      sweep(new org.apache.hadoop.fs.Path(base, "deletes"), "d", doc.dataVersion, _ => false)
  }

  /** The explicit supersession stamp of a version dir: the millis inside
    * its `_SUPERSEDED` marker. A superseded dir missing its marker gets
    * one stamped NOW (and is treated as not-yet-collectable this pass) —
    * self-healing after a crash between the catalog pointer swap and
    * [[markSuperseded]].
    */
  private def supersededAt(f: org.apache.hadoop.fs.FileSystem,
                           dir: org.apache.hadoop.fs.Path): Long = {
    val m = new org.apache.hadoop.fs.Path(dir, Engine.SupersededMarker)
    if (f.exists(m)) {
      val len = f.getFileStatus(m).getLen.toInt
      val buf = new Array[Byte](len)
      val in = f.open(m)
      try in.readFully(0L, buf) finally in.close()
      new String(buf, java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    } else {
      Catalog.writeString(f, m, System.currentTimeMillis().toString)
      Long.MaxValue
    }
  }

  /** Write the explicit supersession stamp (the vacuum grace clock) into
    * each just-replaced version dir.
    */
  private def markSuperseded(paths: String*): Unit = paths.foreach { p =>
    val dir = new org.apache.hadoop.fs.Path(p)
    val f = fsFor(dir)
    if (f.exists(dir))
      Catalog.writeString(f, new org.apache.hadoop.fs.Path(dir, Engine.SupersededMarker),
        System.currentTimeMillis().toString)
  }

  // ------------------------------------------------------------- info/misc

  /** M2 — coverage ratio from catalog counters. */
  def coverageRatio(name: String): Double = {
    val doc = load(name)
    Heuristics.coverageRatio(doc.numVectorsTrainedOn, doc.numNewVectors,
      doc.numTrainedVectorsRemoved)
  }

  /** M9 — info endpoint parity (fastapi.py:75-105). */
  def info(name: String): Map[String, Any] = {
    val doc = load(name)
    Map(
      "name" -> doc.name,
      "num_vectors" -> count(name),
      "vector_dimension" -> doc.vectorDimension,
      "max_id" -> doc.maxId,
      "trained" -> doc.isTrained,
      "max_trained_id" -> doc.maxTrainedId,
      "num_vectors_trained_on" -> doc.numVectorsTrainedOn,
      "num_trained_vectors_removed" -> doc.numTrainedVectorsRemoved,
      "num_new_vectors" -> doc.numNewVectors,
      "num_pending_deletes" -> doc.numPendingDeletes,
      "coverage_ratio" -> coverageRatio(name),
      "num_clusters" -> doc.numClusters,
      "n_probe" -> doc.nProbe,
      // M8 — reference memory-model estimate (cache/cache.py:105-138)
      "index_memory_bytes" -> MemoryModel.estimate(
        hasVectors = doc.maxId >= 0, isTrained = doc.isTrained,
        nTotal = count(name), vectorDimension = doc.vectorDimension,
        compressedVectorBytes = doc.compressedVectorBytes))
  }

  /** M3/M4 — auto-train triggers; runs `train` when due. Returns true if a
    * (re)train ran.
    */
  def maybeAutoTrain(name: String, kmeansIters: Int = 25): Boolean = {
    val doc = load(name)
    val n = count(name)
    val inProgress = trainingStatus(name) == "in progress"
    val due =
      Heuristics.needsInitialTraining(n, !doc.isTrained, inProgress) ||
        (doc.isTrained && Heuristics.needsRetraining(n, coverageRatio(name),
          inProgress))
    if (due) {
      // two sweeps can both compute due=true before either claims the
      // slot — the loser observes the documented Boolean, not the claim
      // rejection (the winner's train covers the need)
      try { train(name, kmeansIters = kmeansIters); true }
      catch { case _: Engine.AlreadyTrainingException => false }
    } else false
  }

  /** All databases under this engine root (catalog-backed directories). */
  def listDatabases(): Seq[String] = {
    val base = new org.apache.hadoop.fs.Path(root)
    val f = fsFor(base)
    if (!f.exists(base)) return Seq.empty
    f.listStatus(base).iterator
      .map(_.getPath.getName)
      .filter(Catalog.exists(root, _))
      .toSeq.sorted
  }

  /** The maintenance scheduler verb (reference `find_indexes_to_train`,
    * api/fastapi.py:409-438): one pass over every database under the root
    * that (re)trains dbs whose coverage/size thresholds are due (M3/M4),
    * applies any pending-delete compaction past the threshold, and vacuums
    * version directories older than `vacuumGraceMillis`. Per-db failures
    * are logged and skipped — one broken db must not starve the sweep.
    */
  def maintenanceSweep(vacuumGraceMillis: Long = 3600L * 1000,
                       compactionThreshold: Double = Engine.CompactionThreshold,
                       kmeansIters: Int = 25)
      : Seq[Engine.SweepResult] =
    listDatabases().flatMap { name =>
      try {
        val trained = maybeAutoTrain(name, kmeansIters)
        val doc = load(name)
        val physicalRows = doc.maxId + 1
        val compacted = physicalRows > 0 &&
          doc.numPendingDeletes.toDouble / physicalRows >= compactionThreshold
        if (compacted) compact(name)
        val vacuumed = vacuum(name, vacuumGraceMillis)
        Some(Engine.SweepResult(name, trained, compacted, vacuumed))
      } catch {
        case scala.util.control.NonFatal(e) =>
          log.warn(s"maintenance sweep: '$name' failed: ${e.getMessage}")
          None
      }
    }

  // --------------------------------------------------------------- private

  private[core] def indexModel(doc: CatalogDoc): IndexModel =
    indexCache.getOrElseUpdate((doc.name, doc.indexVersion)) {
      IndexStore.loadModel(spark, doc.indexPath(root))
    }

  /** The reusable per-version model broadcast for the serving path; stale
    * versions of the same db are unpersisted when a newer one is first
    * queried (train/compact bump the version). Only versions BELOW the
    * caller's are dropped: an in-flight query that loaded its doc before
    * a concurrent train finished must never unpersist the newer version's
    * broadcast (it may re-register its own old version — harmless, the
    * next new-version query sweeps it).
    */
  private[core] def modelBroadcast(
      doc: CatalogDoc): org.apache.spark.broadcast.Broadcast[IndexModel] = {
    val bc = modelBcCache.getOrElseUpdate((doc.name, doc.indexVersion),
      spark.sparkContext.broadcast(indexModel(doc)))
    // an in-flight query racing delete() could re-register after delete's
    // sweep — with no future query to sweep again, that broadcast would
    // leak for the SparkContext's lifetime; re-check and self-evict
    if (!Catalog.exists(root, doc.name))
      dropModelBroadcasts(doc.name, keepBelow = Int.MaxValue)
    else dropModelBroadcasts(doc.name, keepBelow = doc.indexVersion)
    bc
  }

  /** Unpersist (not destroy — lazily re-fetchable by in-flight plans)
    * cached model broadcasts for `name` with version < `keepBelow`; the
    * matching coded-frame cache entries go with them.
    */
  private def dropModelBroadcasts(name: String, keepBelow: Int): Unit =
    modelBcCache.keys
      .filter { case (n, v) => n == name && v < keepBelow }
      .foreach { k =>
        modelBcCache.remove(k).foreach(_.unpersist(false))
        codedDfCache.remove(k)
        codedDfServingCache.remove(k)
        dropServingScanEpoch(k)
      }

  private def normalizeLocal(v: Array[Float]): Array[Float] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0) v else v.map(x => (x / n).toFloat)
  }

}

object Engine {

  /** Pre-serialized parquet `FilterPredicate` carried as READ OPTIONS on
    * a scan relation — the structural fix for the r15 attribution
    * (ChunkCpuProfile, PLANS.md): ~99.6% of the serving coarse scan's
    * task CPU was per-file pushed-filter PLUMBING, because Spark's own
    * pushdown rebuilds the predicate at every reader init — parquet
    * `setFilterPredicate` string-concats the left-nested 445-term
    * or-chain (O(terms²) chars; Spark 4.1 has no parquet-native In) and
    * gzip+Java-serializes the tree into a cloned Hadoop conf, per FILE
    * per TASK. Here the predicate is built ONCE on the driver as
    * parquet's native `Operators.In` (linear toString, Set-backed eval),
    * serialized ONCE, and shipped inside the relation's options map —
    * `newHadoopConfWithOptions` folds options into the scan's broadcast
    * Hadoop conf, and the reader picks it up via
    * `ParquetInputFormat.getFilter` (`ParquetReadOptions.Builder` reads
    * `parquet.private.read.filter.predicate` unconditionally — verified
    * against the bundled parquet 1.16 bytecode), applying the SAME
    * row-group-stats + page-index + dictionary pruning the per-file
    * rebuild did. Callers must disable Spark-side parquet pushdown on
    * the session running the scan (it would rebuild and overwrite the
    * injected value) and keep the logical Filter in the plan for
    * exactness — reader pruning passes a page-granular SUPERSET.
    * InjectedPredicateSpec gates the mechanism end-to-end.
    *
    * Predicate SHAPE: a BALANCED or-tree of `eq` terms, NOT parquet's
    * native `Operators.In` — measured on the coded page geometry
    * (InjectedPredicateSpec's fixture), 1.16's column-index evaluation
    * of In kept every page from row 0 through the LAST matching page
    * (97,280 of 100k rows for 4 values) where the same values as an
    * or-chain of eq kept exactly the 4 matching pages (2,048 rows).
    * Balanced keeps the tree O(log terms) deep (serializer/visitor
    * stack) and any accidental toString O(terms·log terms). The
    * serialization bypasses `setFilterPredicate` (whose side write of
    * `predicate.toString` is the O(terms²) burn) and calls
    * `SerializationUtil.writeObjectToConfAsBase64` directly, with a
    * short constant human-readable twin.
    */
  private[graft] def injectedIntInOptions(column: String,
                                          values: Array[Int]): Map[String, String] = {
    require(values.nonEmpty,
      "injectedIntInOptions needs at least one value (the or-of-eq tree " +
        "has no empty form; an empty probe list means no scan at all)")
    import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
    val c = FilterApi.intColumn(column)
    def tree(lo: Int, hi: Int): FilterPredicate = // [lo, hi)
      if (hi - lo == 1) FilterApi.eq(c, Integer.valueOf(values(lo)))
      else {
        val mid = (lo + hi) >>> 1
        FilterApi.or(tree(lo, mid), tree(mid, hi))
      }
    val scratch = new org.apache.hadoop.conf.Configuration(false)
    val key = org.apache.parquet.hadoop.ParquetInputFormat.FILTER_PREDICATE
    org.apache.parquet.hadoop.util.SerializationUtil.writeObjectToConfAsBase64(
      key, tree(0, values.length), scratch)
    Map(key -> scratch.get(key),
      (key + ".human.readable") -> s"or-of-eq($column, ${values.length} values)")
  }

  /** `plan` with `opts` folded into every parquet relation's read
    * options (same FileIndex — no re-listing, no re-analysis; output
    * attributes preserved by `copy`).
    */
  private[graft] def withReadOptions(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      opts: Map[String, String])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    plan.transform {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        val fs = lr.relation.asInstanceOf[HadoopFsRelation]
        lr.copy(relation =
          fs.copy(options = fs.options ++ opts)(fs.sparkSession))
    }
  }

  /** Reference default `max_memory_usage` = 4 GiB (mindb.py:42). Drives the
    * T7 strategy chooser only — Spark spills instead of enforcing it.
    */
  val DefaultMaxMemoryUsage: Long = 4L * 1024 * 1024 * 1024

  /** Target bytes per [[ServingScan]] task — matches the serving
    * session's 512 MB split packing (the ccp6-measured optimum for the
    * per-query coarse scans: fewer reader inits, still ≥2 tasks per
    * bucket at the measured geometries).
    */
  val ServingScanTaskBytes: Long = 512L << 20

  /** Marker file carrying a version dir's explicit supersession stamp
    * (epoch millis, written at the pointer swap that replaced it). The
    * `_` prefix keeps it invisible to Spark/parquet readers (the
    * `_SUCCESS` convention); being a FILE with the stamp as content, it
    * works on object stores where directory mtimes don't exist.
    */
  val SupersededMarker: String = "_SUPERSEDED"

  /** Compact (physical rewrite) once pending soft-deletes exceed this
    * fraction of the table — bounds both query-side anti-join size and
    * candidate shrinkage in the trained path.
    */
  val CompactionThreshold: Double = 0.1

  /** Rewrite the coded table when post-train appends push its file count
    * past this many files per layout unit (bucket when bucketed, cluster
    * on the legacy layout; each append lays down one file-set per touched
    * partition; unchecked, the pruned scan becomes a small-file storm).
    */
  val CodedFilesPerCluster: Int = 4

  /** Target parquet-file size for the bucketed coded-table layout.
    * 256 MB (canonical parquet sizing, 2 row groups at the default
    * 128 MB block), raised from 32 MB after RootProfile r14 measured the
    * serving floor at the 35M geometry: probed clusters spread uniformly
    * over buckets, so EVERY coarse pass opens ~every bucket file, and at
    * 26 MB files that was ~350 opens × (footer + page-index ≈ 3-5 ms) —
    * more than half the composable-path latency. Bigger buckets cut the
    * per-query open count ~8× while analytic scans keep task parallelism
    * by splitting at row-group boundaries (maxPartitionBytes 128 MB).
    */
  val TargetCodedFileBytes: Long = 256L * 1024 * 1024

  /** Ceiling on coded-table buckets — bounds partition-dir count (and the
    * listing cost of every coded read) no matter the corpus size; past it
    * files simply grow beyond the 32 MB target, which scans tolerate.
    */
  val MaxCodedBuckets: Long = 4096L

  /** Coded-table layout sizing: group `2^shift` consecutive cluster_ids
    * into one `cluster_bucket` partition dir so each bucket's file lands
    * near [[TargetCodedFileBytes]].
    *
    * Rationale (measured, EVAL_r09 `scale_run_35m`): one hive dir per
    * cluster is healthy at nlist ≈ 35k but at nlist 91,008 the layout
    * degrades to 78,969 files of ~125 KB — the single-query candidate
    * fetch opens thousands of tiny files (exec-bound 2,071 ms of a
    * 2,302 ms p50) and a 100 TB deployment would put millions of objects
    * per index version on the object store. Bucketing keeps file count
    * ∝ data bytes (not nlist); files sort by `cluster_id` so parquet
    * row-group/page stats still prune within a bucket.
    *
    * `0` means bucket == cluster_id (few huge clusters: per-cluster dirs
    * already right-sized); returns at least that. Estimation only needs
    * to land within ~2× of the target — `rowBytes` is the covering row:
    * id 8 + length/offsets ~8 + 4·d vector + m code bytes + ~64 metadata.
    */
  def codedBucketShift(n: Long, nlist: Int, d: Int, m: Int): Int = {
    val rowBytes = 16L + 4L * math.max(1, d) + math.max(0, m) + 64L
    val buckets = math.max(1L, math.min(MaxCodedBuckets,
      (n * rowBytes + TargetCodedFileBytes - 1) / TargetCodedFileBytes))
    val cpb = math.max(1L, (nlist + buckets - 1) / buckets)
    if (cpb <= 1L) 0
    else math.min(30, 64 - java.lang.Long.numberOfLeadingZeros(cpb - 1L))
  }

  /** Bucket-dir count the shift yields for an nlist. */
  def codedBucketCount(nlist: Int, shift: Int): Int =
    math.max(1, ((nlist.toLong + (1L << shift) - 1) >> shift).toInt)

  /** (The pre-r15 `MaxWidenedPreliminaryK` widening ceiling is gone with
    * the geometric widening loop itself — the pushed under-fill round is
    * bounded by `preliminaryTopK` per partition by construction.)
    *
    * A compiled metadata predicate that must stay on the driver: it
    * wraps NONDETERMINISTIC expression state that must not serialize
    * into a task closure (a deserialized copy is uninitialized, and
    * re-initializing would replay its sequence). The filtered
    * under-fill guard serves these via the exact flat scan — where
    * Spark owns per-row evaluation — instead of the pushed round.
    */
  private[core] final class DriverOnlyPredicate(f: (Long, String) => Boolean)
    extends ((Long, String) => Boolean) {
    def apply(id: Long, meta: String): Boolean = f(id, meta)
  }

  /** Peak shuffle bytes one coded-write bucket group may carry (the
    * train-time disk envelope, [[writeCoded]]): the bucket repartition of
    * a covering table beyond this splits into ⌈bytes/this⌉ groups so
    * shuffle scratch never stacks the whole table on top of the input
    * parquet and the output parquet. 6 GiB ≈ the slack the r14 80 GB
    * scratch box had left after data+coded at the 10M×768 geometry.
    * Env-overridable for eval boxes with different quotas.
    */
  val CodedShuffleGroupBytes: Long =
    sys.env.get("GRAFT_CODED_SHUFFLE_GROUP_BYTES").map(_.toLong)
      .getOrElse(6L << 30)

  /** Driver-side candidate-row ceiling for one trained query batch
    * (q·prelimK). ~2M rows ≈ a few hundred MB of Rows — past it the
    * batch splits into chunks rather than OOM the driver.
    */
  val MaxDriverBatchCandidates: Long = 2000000L

  /** Ceiling on post-prepare appended rows a [[PreparedIndex]] absorbs
    * into its driver-local side buffer (at d=768 covering rows, 200k ≈
    * 600 MB). Past it the handle reports stale and serves via fallback —
    * the caller should re-prepare.
    */
  val MaxPreparedSideRows: Int = 200000

  /** Debounce window for a [[PreparedIndex]]'s adds delta-refresh: at
    * most one side-buffer collect job per window under continuous ingest
    * (a query inside the window serves a ≤window-old view of the
    * APPENDS; versions and removes are still checked per query). 0 =
    * refresh on every drift.
    */
  val PreparedAddsRefreshIntervalMs: Long = 100L

  /** TTL for the routed-query serving-doc cache: entry catalog reads may
    * be this stale for CROSS-driver mutations only (same-driver writes
    * invalidate; version moves are re-checked fresh after the serving
    * job either way).
    */
  val ServingDocTtlNanos: Long = 100L * 1000 * 1000

  /** Per-db outcome of one [[Engine.maintenanceSweep]] pass. */
  final case class SweepResult(db: String, trained: Boolean,
                               compacted: Boolean, vacuumed: Int)

  /** GET /db/view_cache response shape (fastapi.py:447-457). */
  final case class CacheView(cachedDbs: Seq[String], currentMemoryUsage: Long,
                             maxMemoryUsage: Long)

  /** The double-train rejection (fastapi.py:314-326) — a typed rejection
    * so callers (maybeAutoTrain, schedulers) can distinguish "someone
    * already trains this db" from a genuine argument error.
    */
  final class AlreadyTrainingException(msg: String)
    extends IllegalArgumentException(msg)

  /** The db was dropped (or dropped and recreated) while its train was in
    * flight — the train aborts and clears its status entry (the reference's
    * cleanup re-checks existence, fastapi.py:218-222).
    */
  final class DroppedDuringTrainingException(name: String)
    extends IllegalStateException(s"'$name' was dropped during training")

  /** Actual driver bytes of a loaded IndexModel (centroids + codebooks +
    * PCA matrix), the LRU eviction cost.
    */
  def modelBytes(m: IndexModel): Long = {
    val centroids = m.centroids.length.toLong *
      (if (m.centroids.isEmpty) 0 else m.centroids(0).length) * 4L
    val codebooks = m.pq.m.toLong * 256L * m.pq.subDim * 4L
    val pca = m.pca.mean.length.toLong * 8L +
      m.pca.components.length.toLong *
        (if (m.pca.components.isEmpty) 0 else m.pca.components(0).length) * 8L
    centroids + codebooks + pca + 64L
  }

  /** In-memory index artifact: PCA model + IVF centroids (PCA space) + PQ
    * codebooks. Total size O(d² + nlist·p + m·256·subdim) — driver/broadcast
    * scale, independent of data size.
    */
  final case class IndexModel(pca: PcaModel, centroids: Array[Array[Float]],
                              pq: PqModel) {

    /** Flat row-major mirror of the centroid matrix for the SIMD probe
      * kernel — built lazily per JVM (never serialized with the model;
      * each executor/driver that selects probes pays the copy once).
      * Duplicates centroid memory (~200 MB at the 100M heuristic
      * geometry) only where probe selection actually runs.
      */
    @transient private lazy val flatCentroids: graft.index.FlatCentroids =
      graft.index.FlatCentroids.build(centroids)

    /** Probe selection: the nprobe nearest centroids by (L2², id) —
      * [[graft.index.FlatCentroids.nearestKFloat]]: a SIMD distance pass
      * + margin-selected exact re-score where `jdk.incubator.vector` is
      * present, the original bounded-heap scalar loop otherwise. Both
      * produce bit-identical probe lists (FlatCentroidsSpec differential
      * + every trained oracle replay). At the reference's heuristic
      * ceiling (nlist = 200k for 100M rows, training_utils.py:5-9) this
      * runs on the driver per query and was the profiled floor of the
      * 100M prepared p50 (~O(nlist·p) scalar per query, VERDICT r10).
      */
    def nearestClusters(qp: Array[Float], nprobe: Int): Array[Int] =
      flatCentroids.nearestKFloat(qp, nprobe)
  }
}
