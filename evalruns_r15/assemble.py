#!/usr/bin/env python3
"""Assemble EVAL_r15.json from the r15 eval run logs.

Each graft measurement main prints exactly one JSON object line; take
the LAST such line per log (re-runs append). Keys map to artifact rows.
"""
import json, re, sys, os

R = "/root/repo/evalruns_r15"
OUT = "/root/repo/EVAL_r15.json"

rows = {}

def last_json(path):
    if not os.path.exists(path):
        return None
    best = None
    with open(path, errors="replace") as f:
        for line in f:
            line = line.strip()
            line = re.sub(r"^\[info\]\s*", "", line)
            if line.startswith("{") and line.endswith("}"):
                try:
                    best = json.loads(line)
                except json.JSONDecodeError:
                    pass
    return best

mapping = {
    "scale_run_35m": ["scale_35m.log"],
    "scale_run_35m_packed": ["scale_35m_packed.log"],
    "scale_run_10m_768_opq": ["scale_10m_768_opq_rerun.log"],
    "published_eval_648q": ["published_eval_648q_nodelay.log", "published_eval_648q.log"],
    "published_eval_648q_pre_nodelay": ["published_eval_648q.log"],
}
for key, logs in mapping.items():
    row = None
    for log in logs:
        row = last_json(os.path.join(R, log))
        if row is not None:
            break
    if row is None:
        print(f"MISSING: {logs} has no JSON line", file=sys.stderr)
    else:
        rows[key] = row

rows["provenance"] = {
    "note": ("all rows produced by the committed harnesses (ScaleEval/"
             "Eval) via evalruns_r15/run_evals.sh on a frozen class "
             "snapshot; every main canary-gates itself before the build "
             "AND again before each serving block "
             "(Canary.awaitHealthyKernel, floor 1600 rows/s). New this "
             "round: the 35M packed-code A/B twin (VERDICT r14 #7), the "
             "10M x 768 OPQ point enabled by the grouped low-scratch "
             "coded write (VERDICT #4), the published-geometry HTTP "
             "latency block (http_query_ms_* vs the reference's 65 ms "
             "transport gate, VERDICT #6), and the r15 pushed under-fill "
             "round replacing the widening ladder (VERDICT #3 — read "
             "filtered_cluster_correlated_ms_p50 / "
             "filtered_correlated_ms_sorted against r14's 363/929)."),
    "runner": "evalruns_r15/graft_run.sh (plain java, frozen classes)",
    "sequence": "evalruns_r15/run_evals.sh + after_10m.sh",
    "scale_10m_768_note": (
        "the wave's FIRST 10M x 768 attempt proved the grouped coded "
        "write holds the TRAIN inside the envelope (blockmgr steady at "
        "~6 GB through the write) and then ENOSPC'd in the NEXT disk "
        "cliff - PreparedANN.buildBlocks' covering-table repartition "
        "during the first routed query's auto-prepare "
        "(scale_10m_768_opq.log:358). That exchange was never needed "
        "(cluster co-location is not required; every partition is "
        "scanned per query) and is now a zero-shuffle coalesce; the "
        "scale_run_10m_768_opq row is the rerun with both fixes - disk "
        "peaked at 78% of the box."),
    "http_nodelay_note": (
        "published_eval_648q is the TCP_NODELAY rerun when the "
        "_nodelay log exists; the _pre_nodelay twin keeps the first "
        "measurement (http p50 64.3 ms), whose ~46 ms delta over the "
        "in-process path was Nagle's delayed-ACK timer in the JDK "
        "HttpServer."),
    "scale_35m_contamination_note": (
        "INADMISSIBLE FIELDS in scale_run_35m: gt_seconds (43.2 s) and "
        "batch_ms_per_query (2,415 ms) crossed a host-contention window "
        "(a concurrent build saturated the box mid-run; the canary gate "
        "brackets the SERVING blocks, which stayed healthy, but the gt/"
        "batch phase is not canary-bracketed). Treat those two numbers "
        "as unmeasured for this row; all routed/prepared/catalyst/"
        "filtered latencies and recall in the same row are "
        "canary-gated and admissible. PLANS.md flags the same window "
        "in prose."),
    "kept_root_profiling": (
        "the catalyst-path attribution behind this round's changes was "
        "measured against a KEPT 35M root (graft.RootBuild + "
        "graft.core.RootProfile + graft.core.ChunkCpuProfile, logs in "
        "evalruns_r15/): stack-sampling put ~99.6% of the coarse scan's "
        "task CPU in per-file pushed-filter plumbing (parquet "
        "FilterPredicate toString + conf clone + gzip/Java serde of the "
        "In or-chain) with the row pipeline at 0.4%; healthy-canary "
        "catalyst e2e p50 371-392 ms and 16-thread prepared 65.3-65.5 "
        "qps reproduced twice before the wave."),
}

with open(OUT, "w") as f:
    json.dump(rows, f, indent=1)
print(f"wrote {OUT}: {list(rows)}")
