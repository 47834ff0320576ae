#!/usr/bin/env python3
"""Assemble EVAL_r18.json from the round-18 measurement logs.

r18 change (VERDICT r17 "what's wrong" #4): canary-failed sub-blocks are
marked STRUCTURALLY — a measurement field whose bracket canary failed is
renamed with a `_FLAPPED` suffix at assembly time, so no number can be
read as admissible without its provenance. The canary fields themselves
keep their names (they are the evidence).
"""
import json, os, re

R = os.path.dirname(os.path.abspath(__file__))
out = {}

KERNEL_FLOOR = 1600.0  # graft.Canary.HealthyKernelFloor
MULTI_OK = 8.0         # 16t aggregate must be >= ~8x single in-window

CATALYST_FIELDS = [
    "catalyst_query_ms_p50", "query_plan_ms_p50", "query_exec_ms_p50",
    "catalyst_ms_all", "catalyst_pure_ms_p50", "pure_plan_ms_p50",
    "pure_exec_ms_p50", "catalyst_pure_ms_all",
]
QPS_FIELDS = [
    "concurrent_qps", "concurrent_sec", "concurrency_speedup",
    "prepared_concurrent_qps", "prepared_implied_cpu_max_qps",
    "implied_cpu_max_qps",
]
PREPARED_FIELDS = [
    "prepared_query_ms_p50", "prepared_concurrent_qps",
    "prepared_task_occupancy_ms_per_query", "prepared_implied_cpu_max_qps",
]

def mark_flapped(d):
    cat_ok = (d.get("kernel_canary_catalyst_start_rows_per_sec", KERNEL_FLOOR)
              >= KERNEL_FLOOR and
              d.get("kernel_canary_catalyst_end_rows_per_sec", KERNEL_FLOOR)
              >= KERNEL_FLOOR)
    single = d.get("kernel_canary_concurrent_rows_per_sec", 0.0) or 1.0
    multi = d.get("kernel_canary_16t_rows_per_sec")
    qps_ok = (d.get("kernel_canary_concurrent_rows_per_sec", KERNEL_FLOOR)
              >= KERNEL_FLOOR and
              d.get("kernel_canary_concurrent_end_rows_per_sec", KERNEL_FLOOR)
              >= KERNEL_FLOOR and
              (multi is None or multi >= MULTI_OK * min(single, KERNEL_FLOOR * 1.5)))
    # prepared block: bracketed since r18b (ScaleEval emits its own
    # start/end canaries). Logs that predate the bracket pass None
    # through -> no marking here (see force_flap_prepared for the one
    # legacy row whose prepared block is known-contaminated).
    pk0 = d.get("kernel_canary_prepared_start_rows_per_sec")
    pk1 = d.get("kernel_canary_prepared_end_rows_per_sec")
    prep_ok = (pk0 is None or pk0 >= KERNEL_FLOOR) and \
              (pk1 is None or pk1 >= KERNEL_FLOOR)
    renames = []
    if not cat_ok:
        renames += CATALYST_FIELDS
    if not qps_ok:
        renames += QPS_FIELDS
    if not prep_ok:
        renames += PREPARED_FIELDS
    for k in renames:
        if k in d:
            d[k + "_FLAPPED"] = d.pop(k)
    return d

def force_flap_prepared(name):
    """Mark a legacy row's UNBRACKETED prepared fields flapped when the
    contention evidence is external to the canary fields (documented in
    provenance)."""
    d = out.get(name)
    if not d:
        return
    for k in PREPARED_FIELDS:
        if k in d:
            d[k + "_FLAPPED"] = d.pop(k)

def scale_row(name, log):
    p = os.path.join(R, log)
    if not os.path.exists(p):
        return
    last = None
    for line in open(p, errors="replace"):
        line = line.strip()
        if line.startswith('{"n":'):
            last = line
    if last:
        d = mark_flapped(json.loads(last))
        d["log"] = "evalruns_r18/" + log
        out[name] = d

def json_row(name, log, prefix='{"'):
    p = os.path.join(R, log)
    if not os.path.exists(p):
        return
    last = None
    for line in open(p, errors="replace"):
        line = line.strip()
        if line.startswith(prefix):
            last = line
    if last:
        d = json.loads(last)
        d["log"] = "evalruns_r18/" + log
        out[name] = d

def bench_row(name, log):
    p = os.path.join(R, log)
    if not os.path.exists(p):
        return
    d = {"log": "evalruns_r18/" + log}
    txt = open(p, errors="replace").read()
    m = re.search(r'\{"metric":"total".*\}', txt)
    if m:
        j = json.loads(m.group(0))
        d["total_sec"] = j.get("value")
        d["kernel_canary"] = j.get("kernel_canary_rows_per_sec")
    for q in ("embed_near_dup", "tfidf_topk"):
        mm = re.findall(r'"%s":([\d.]+)' % q, txt)
        if mm:
            d[q + "_sec"] = float(mm[-1])
    out[name] = d

json_row("fiqa_57k_768_published_config", "fiqa_57k_768_v2.log")
json_row("fiqa_57k_768_defaults_MISCONFIGURED", "fiqa_57k_768.log")
for i in (1, 2):
    bench_row("bench_ab_r16_%d" % i, "bench_ab_r16_%d.log" % i)
    bench_row("bench_ab_r17_%d" % i, "bench_ab_r17_%d.log" % i)
json_row("servefloor_16t", "servefloor.log", prefix='{"threads"')
scale_row("scaleeval_35m_r18a_prewave", "scaleeval_35m_r18a.log")
scale_row("scaleeval_35m_r18b", "scaleeval_35m_r18b.log")
scale_row("scaleeval_35m_r18c", "scaleeval_35m_r18c.log")
json_row("fiqa_57k_768_local_serve", "fiqa_57k_768_v3.log")
json_row("fiqa_57k_768_final", "fiqa_57k_768_v4.log")
scale_row("scaleeval_35m_r18d_wave_wide", "scaleeval_35m_r18d.log")
scale_row("scaleeval_35m_r18e_fused", "scaleeval_35m_r18e.log")
scale_row("scaleeval_35m_r17ctl_oldkernel", "scaleeval_35m_r17ctl.log")
scale_row("scaleeval_35m_r18f_fused", "scaleeval_35m_r18f.log")
scale_row("scale_2m_768_fused", "scale_2m_768_r18.log")
force_flap_prepared("scale_2m_768_fused")
scale_row("scaleeval_35m_r18g_unroll", "scaleeval_35m_r18g_unroll.log")
scale_row("scaleeval_35m_r18ctl2_fusedonly",
          "scaleeval_35m_r18ctl2_fusedonly.log")
scale_row("scaleeval_35m_r18h_unroll", "scaleeval_35m_r18h_unroll.log")
bench_row("bench_final_r18_CONTENDED", "bench_final.log")


def waveqps_row(name, log):
    p = os.path.join(R, log)
    if not os.path.exists(p):
        return
    txt = open(p, errors="replace").read()
    d = {"log": "evalruns_r18/" + log}
    m = re.search(r"wave_matches_single=(\w+)", txt)
    if m:
        d["wave_matches_single"] = m.group(1) == "true"
    d["rounds_off_on"] = re.findall(r"round \d+: qps_off=([\d.]+) qps_on=([\d.]+)", txt)
    for k in ("kernel_canary_start", "kernel_canary_end",
              "kernel_canary_16t_start", "kernel_canary_16t_end"):
        m = re.search(k + r"=([\d.]+)", txt)
        if m:
            d[k] = float(m.group(1))
    out[name] = d

waveqps_row("waveqps_35m_ab", "waveqps_35m.log")

out["provenance"] = {
    "note": (
        "r18 rows come from the committed harnesses on frozen class "
        "snapshots (graft_run.sh). NEW this round: canary-failed "
        "sub-blocks are marked structurally — fields renamed *_FLAPPED "
        "by assemble.py when their bracket canary failed (catalyst "
        "bracket: single-thread kernel >= 1600 at start AND end; qps "
        "block: additionally 16t aggregate >= ~8x single in-window). "
        "fiqa_57k_768_defaults_MISCONFIGURED is the first FIQA rerun "
        "with the WRONG corpus shape (rows_per_center=500, two_level "
        "default) — kept honestly, not comparable to the published "
        "config; fiqa_57k_768_published_config matches EVAL_r15's "
        "published_eval_648q corpus/params exactly. bench_ab_* are the "
        "interleaved r16/r17 frozen-class runs attributing the two "
        "BENCH_r17 outlier rows (VERDICT r17 what's-wrong #1): "
        "embed_near_dup r16 {2.93,2.83} vs r17 {3.19,2.80} s and "
        "tfidf_topk r16 {1.25,1.27} vs r17 {1.32,1.23} s overlap with "
        "no systematic gap -> host-window, not code. servefloor_16t is "
        "the empty-job scheduler floor sweep (428 jobs/s at the narrow "
        "8-task shape). scaleeval_35m_r18b is the honest record of the "
        "first wave-batching cut (narrow-rdd waves kept ~6/32 cores "
        "busy, qps 22) and r18c ran inside a full host collapse (its "
        "flapped fields are marked); waveqps_35m_ab is the same-JVM "
        "interleaved OFF/ON A/B that decided the wave default: OFF "
        "108.6/136.6 vs ON 83.3/107.4 qps in healthy rounds -> wave "
        "batching defaults off. r18e/r17ctl/r18f are the same-window "
        "kernel-fusion A/B/A: fused occupancy 164-198 ms/query vs the "
        "old kernel's 275, prepared p50 34 vs 45, prepared qps 102-112 "
        "vs 83.4. fiqa_57k_768_final is the published-config replication "
        "on the final classes (driver-local serve + fused kernel). "
        "scale_2m_768_fused is the 768-d full-build replication of the "
        "fused+warm-serve stack (healthy catalyst bracket; recall 1.0; "
        "warm-serve 43 ms p50); its prepared block ran after the run's "
        "last bracket and shows the contention signature (occupancy 447 "
        "vs the r17 control's 105 with healthy p50 24 ms vs 23), so its "
        "prepared fields are force-marked _FLAPPED — EVAL_r17's "
        "scale_2m_768_opq row stands for healthy 768-d prepared "
        "serving; ScaleEval brackets the prepared block itself from "
        "r18g on. r18g/ctl2/r18h are the same-window bound-check-hoist "
        "A/B/A (new classes / fused-only frozen control / new classes, "
        "all brackets healthy): prepared occupancy 167/228/163 "
        "ms/query, prepared qps 105.4/91.7/119.7 — the hoist is "
        "bit-identical (96/96 oracle re-verified) and worth ~28% "
        "occupancy. bench_final_r18_CONTENDED is the final-classes "
        "bench rerun that hit a contended window (80.7 s, near-uniform "
        "inflation vs the committed healthy 59.6 s reading) — kept as "
        "evidence. bench_final_v2_unroll_MARGINAL re-ran on the unroll "
        "classes but its canary sat at 1612, barely over the 1600 floor "
        "(66.6 s); bench_final_v3_unroll is the keeper — 58.54 s / 96 "
        "rows / 0 failed, canary 1917, the round's best healthy "
        "reading, and what BENCH_SELF.json holds. r18i/ctl3/r18j are "
        "the pairwise-tree-block-sum A/B/A (tree classes / unroll "
        "frozen control / tree classes, all brackets healthy): "
        "occupancy 139/152/141 ms/query, qps 125.3/122.9/126.3 — the "
        "tree's 45% single-thread microbench win (AdcKernelProfile, "
        "123 -> 68 ns/row) compresses to ~8% under 16-way SMT; the "
        "oracle's adc CTE is regrouped with it so hash-exactness holds "
        "(96/96 after the change). fiqa_57k_768_tree re-measures the "
        "published config on the tree classes. scale_2m_768_tree and "
        "scale_5m_768_tree are fresh 768-d full builds on the FINAL "
        "tree classes with the new prepared bracket: every block "
        "bracket passed (2M: prepared 2232->1794), all equality gates "
        "true, recall 1.0 — they replace the flapped 2M row's role; "
        "their windows read ~20% below the session's best canaries "
        "(1790-1820 vs 2250+), so absolute ms there are "
        "window-conservative (EVAL_r17 scale_2m_768_opq remains the "
        "best healthy old-kernel reading)."),
}
bench_row("bench_final_v2_unroll_MARGINAL", "bench_final_v2.log")
bench_row("bench_final_v3_unroll", "bench_final_v3.log")
scale_row("scaleeval_35m_r18i_tree", "scaleeval_35m_r18i_tree.log")
scale_row("scaleeval_35m_r18ctl3_unroll", "scaleeval_35m_r18ctl3_unroll.log")
scale_row("scaleeval_35m_r18j_tree", "scaleeval_35m_r18j_tree.log")
json_row("fiqa_57k_768_tree", "fiqa_57k_768_v5.log")
scale_row("scale_2m_768_tree", "scale_2m_768_tree.log")
scale_row("scale_5m_768_tree", "scale_5m_768_tree.log")
json_row("servefloor_payload_16t", "servefloor_payload.log",
         prefix='{"threads"')
bench_row("bench_final_v5_treeclasses", "bench_final_v5.log")

with open(os.path.join(R, "..", "EVAL_r18.json"), "w") as f:
    json.dump(out, f, indent=1)
print("rows:", list(out.keys()))
