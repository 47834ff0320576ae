package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A warm-up query runs untimed first so the first
  * measured entry doesn't absorb session/codegen/JIT startup; a query that
  * throws is recorded as -1 (and logged to stderr) — never as a fast time.
  */
object Bench {

  /** 1-minute load average — recorded before and after the run so a
    * measurement contaminated by concurrent machine load is detectable
    * from the artifact alone (a clean run on this 32-way box should start
    * near 0 and end near the in-run parallelism; a high load BEFORE the
    * run means another workload shared the cores and every number is
    * inflated — re-measure, don't compare).
    */
  private def loadAvg1(): Double =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val loadBefore = loadAvg1()
    val canaryMs = Canary.cpuCanaryMs()
    // Contention gate (the r10 artifact was measured on a ~0.7×-healthy
    // host): a kernel canary below the healthy floor means every number
    // this run would record is an upper bound on a machine nobody can
    // reproduce — wait out the episode (observed ~40 min) and re-probe
    // rather than publish a degraded artifact. Bounded: after maxWait the
    // run proceeds (an artifact with an honest in-band canary beats no
    // artifact) and `canary_waited_s` records the delay either way.
    val (kernelCanary, canaryWaitedS) = Canary.awaitHealthyKernel("bench")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: session init, codegen, parquet footer caches, and the
    // memoized scratch dbs some correctness probes query against — their
    // one-time build is setup, not the operator under measurement (untimed)
    try SparkEntry.entry(spark).count()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    try graft.queries.Queries.prewarm(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[bench] prewarm failed: $e") }

    // Diagnosis knobs (full runs leave both unset): SPARK_GRAFT_BENCH_ONLY
    // = comma-separated query names; SPARK_GRAFT_BENCH_REPEAT = run each
    // query N times and report every timing to stderr (JSON keeps the last
    // — the warmest — run, so repeat!=1 is NOT a comparable artifact).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val repeat = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT", "1").toInt
    val selected = only.fold(SparkEntry.queries)(n => SparkEntry.queries.filter(kv => n(kv._1)))
    var failed = 0
    val results = selected.map { case (name, fn) =>
      var last = -1.0
      try {
        (1 to repeat).foreach { r =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          last = (System.nanoTime() - t0) / 1e9
          if (repeat > 1) System.err.println(f"[bench] $name run $r: $last%.3f s")
        }
        name -> last
      } catch {
        case e: Throwable =>
          failed += 1
          System.err.println(s"[bench] QUERY FAILED $name: $e")
          name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // Per-row budget (VERDICT r14 #8): with 96 rows summing to ~55 s at
    // sf0.1, a regression hiding inside ONE heavy row moves the total by
    // noise-level percent — gate each row instead. The known-heaviest
    // legitimate rows (train_subsample 5.3 s: trains twice for
    // bit-determinism; streaming rows ≤3.7 s: micro-batch fixed overhead)
    // sit well under the 8 s default. Enforcement is ON for full runs at
    // the driver's bench SF and skipped for diagnosis runs (BENCH_ONLY /
    // REPEAT) and non-default SFs, whose budgets differ by construction.
    val rowBudgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROW_BUDGET_S", "8.0").toDouble
    val enforceBudget = sys.env.get("SPARK_GRAFT_BENCH_ENFORCE_BUDGET")
      .map(_.toBoolean)
      .getOrElse(only.isEmpty && repeat == 1 && sfDir.endsWith("sf0.1"))
    val overBudget = results.collect {
      case (name, sec) if sec > rowBudgetS => name -> sec
    }.toSeq.sortBy(-_._2)
    overBudget.foreach { case (name, sec) =>
      System.err.println(f"[bench] OVER BUDGET $name: $sec%.2f s > $rowBudgetS%.1f s")
    }
    val overBudgetJson = overBudget.map { case (n, s) => s"""["$n",${"%.2f".format(s)}]""" }
      .mkString("[", ",", "]")
    val loadAfter = loadAvg1()
    // Heap telemetry: a run whose used-after is near max was GC-bound —
    // its per-query times measure collector pauses, not operators (the
    // 8g-heap failure mode: 2.5x total inflation, recorded r10).
    val rt = Runtime.getRuntime
    val heapUsedMb = (rt.totalMemory - rt.freeMemory) / (1024 * 1024)
    val heapMaxMb = rt.maxMemory / (1024 * 1024)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir","row_budget_s":$rowBudgetS,"over_budget":$overBudgetJson,"load_before":$loadBefore,"load_after":$loadAfter,"cpu_canary_ms":$canaryMs,"kernel_canary_rows_per_sec":$kernelCanary,"canary_waited_s":$canaryWaitedS,"heap_used_mb":$heapUsedMb,"heap_max_mb":$heapMaxMb}"""
    // Full line first (complete stdout captures keep it); the LAST line
    // is a compact summary guaranteed to fit a 2000-char tail capture —
    // an 89-query map cannot (≥2.2k chars at any precision), which is
    // exactly how BENCH_r12's "parsed": null happened. The complete
    // per-query map lives in the self-written artifact below.
    println(line)
    // Soft TOTAL-drift telemetry (VERDICT r15 #7): the per-row budget
    // catches a single-row regression, but nothing watched the sum —
    // print the delta vs the previous committed BENCH_SELF so drift is
    // visible in the round diff. Read BEFORE the artifact overwrite
    // below; soft by design (totals across different host-contention
    // windows aren't comparable — the canaries on both artifacts say
    // which), so it never fails the run.
    try {
      val prev = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("BENCH_SELF.json")), "UTF-8")
      """"metric":"total","value":([0-9.eE+-]+)""".r.findFirstMatchIn(prev)
        .map(_.group(1).toDouble).foreach { p =>
          println(f"""{"metric":"total_drift","prev_total_sec":$p%.2f,"total_sec":$total%.2f,"delta_sec":${total - p}%.2f}""")
        }
    } catch { case _: Throwable => () } // first run / unreadable artifact
    // LAST stdout line = the driver-contract line (VERDICT r18 #1): the
    // driver json-parses the last line of a 2000-char stdout tail, so this
    // line must be COMPLETE inside that tail and carry the per-query map.
    // The 96 query names alone cost ~1.7 kB, so per-query values printed
    // as seconds can never fit — print INTEGER timings in the finest unit
    // (ms → cs → ds → s) whose line fits the budget, declared in
    // "queries_unit". Full-precision seconds stay in the first stdout line
    // and in the BENCH_SELF.json artifact (unchanged). build.sbt pairs
    // with this: raw forked-run stdout (no "[info] " prefix) and no
    // "[success]" epilogue, so nothing follows this line in the tail.
    // 1985: nothing follows this line (verified empirically — raw fork
    // stdout, success banner off), so only the line itself + newline must
    // fit the 2000-char tail; the 15-char slack covers a stray "\n".
    // At healthy sf0.1 timings the 96-entry map lands in "cs" (10 ms
    // resolution); a contended window's larger values degrade to "ds".
    val tailBudget = 1985
    val sfBase = new java.io.File(sfDir).getName
    val contractLine = Seq("ms" -> 1000.0, "cs" -> 100.0, "ds" -> 10.0, "s" -> 1.0)
      .iterator.map { case (unit, scale) =>
        val qsInt = results.map { case (k, v) =>
          "\"" + k + "\":" + (if (v < 0) "-1" else math.round(v * scale).toString)
        }.mkString("{", ",", "}")
        // sf as the basename: the full dir already rides the first line +
        // artifact; here every char buys per-query resolution instead
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qsInt,"queries_unit":"$unit","failed":$failed,"sf":"$sfBase"}"""
      }.find(_.length <= tailBudget)
      .getOrElse( // >96 entries at whole-second ints: keep totals parseable
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":{},"queries_unit":"overflow","failed":$failed,"sf":"$sfBase"}""")
    println(contractLine)
    // Artifact of record (VERDICT r12 #3): the driver's stdout capture
    // keeps only a 2000-char tail, which truncates an 80+-query map —
    // write the COMPLETE json ourselves so every per-query timing and
    // canary survives in a committed, machine-parsable file. Full runs
    // land at BENCH_SELF.json in the repo root; diagnosis runs
    // (BENCH_ONLY/REPEAT set) go to /tmp so they can't shadow a real
    // artifact.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isEmpty && repeat == 1) "BENCH_SELF.json"
      else "/tmp/bench_partial.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] artifact write failed ($outPath): $e") }
    spark.stop()
    if (failed > 0) sys.exit(1)
    if (enforceBudget && overBudget.nonEmpty) {
      // admissibility gate before failing the run: a host-contention
      // window STARTING mid-run can push a legitimately-heavy row (the
      // 5.3 s train_subsample) past the budget — only fail when the
      // post-run kernel canary says the measurement window was healthy;
      // a degraded canary records the offenders in-band without turning
      // contention into a spurious artifact failure
      val endKernel = Canary.kernelCanaryRowsPerSec()
      if (endKernel >= Canary.HealthyKernelFloor) sys.exit(2)
      else System.err.println(
        f"[bench] over-budget rows NOT enforced: end kernel canary $endKernel%.0f < ${Canary.HealthyKernelFloor}%.0f (contended window)")
    }
  }
}
