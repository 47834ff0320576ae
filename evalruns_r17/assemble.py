#!/usr/bin/env python3
"""Assemble EVAL_r17.json from the round-17 measurement logs.

ScaleEval runs contribute their artifact JSON line verbatim; RootProfile
runs contribute a parsed summary (A/B rounds, canaries, qps). Every row
names its log file; the provenance note carries the reading rules.
"""
import json, os, re

R = os.path.dirname(os.path.abspath(__file__))
out = {}

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
        d = json.loads(last)
        d["log"] = "evalruns_r17/" + log
        out[name] = d

def prof_row(name, log):
    p = os.path.join(R, log)
    if not os.path.exists(p):
        return
    txt = open(p, errors="replace").read()
    d = {"log": "evalruns_r17/" + log}
    def grab(pat, key, cast=str):
        m = re.search(pat, txt)
        if m:
            d[key] = cast(m.group(1))
    grab(r"kernel_canary_start=([\d.]+)", "kernel_canary_start", float)
    grab(r"catalyst end-to-end p50: (\d+) ms", "catalyst_e2e_p50_ms", int)
    m = re.search(r"catalyst end-to-end p50: \d+ ms\s+\(all: ([\d,]+)\)", txt)
    if m:
        d["catalyst_e2e_ms_all"] = [int(x) for x in m.group(1).split(",")]
    m = re.search(r"customscan A/B e2e p50 per round \(custom,catalyst\): (.+)", txt)
    if m:
        d["ab_e2e_rounds_custom_catalyst"] = re.findall(r"\((\d+),(\d+)\)", m.group(1))
    m = re.search(r"customscan A/B warm coarse ms per round \(custom,catalyst\): (.+)", txt)
    if m:
        d["ab_coarse_rounds_custom_catalyst"] = re.findall(r"\((\d+),(\d+)\)", m.group(1))
    grab(r"kernel_canary_after_catalyst=([\d.]+)", "kernel_canary_after_catalyst", float)
    grab(r"kernel_canary_after_ab=([\d.]+)", "kernel_canary_after_ab", float)
    m = re.search(r"catalyst inner p50: probe_select (\d+)\s+chunk_plans (\d+)\s+coarse (\d+)\s+fetch_construct (\d+)\s+fetch_collect (\d+)", txt)
    if m:
        d["inner_p50_ms"] = dict(zip(
            ["probe_select", "chunk_plans", "coarse", "fetch_construct",
             "fetch_collect"], [int(x) for x in m.groups()]))
    grab(r"prepared_parts=(\S+)", "prepared_parts")
    grab(r"concurrent_qps_16t=([\d.]+)", "concurrent_qps_16t", float)
    grab(r"kernel_canary_single=([\d.]+)", "kernel_canary_single", float)
    grab(r"kernel_canary_16t=([\d.]+)", "kernel_canary_16t", float)
    m = re.search(r"prep.query seq#2 p50 (\d+) ms", txt)
    if m:
        d["prepared_seq2_p50_ms"] = int(m.group(1))
    m = re.search(r"filtered routed \(uncorrelated\) p50 (\d+) ms", txt)
    if m:
        d["filtered_p50_ms"] = int(m.group(1))
    out[name] = d

scale_row("scale_20m_64", "scale_20m_64.log")
scale_row("scale_2m_768_opq", "scale_2m_768_opq.log")
scale_row("scale_5m_768_opq", "scale_5m_768_opq.log")
scale_row("scaleeval_35m_clean", "scaleeval_35m_clean.log")
scale_row("scaleeval_35m_retry", "scaleeval_35m_retry.log")
scale_row("scaleeval_35m_final_DISCARDED", "scaleeval_35m_final.log")
scale_row("scaleeval_35m_v2", "scaleeval_35m_v2.log")
scale_row("scaleeval_35m_v3", "scaleeval_35m_v3.log")
scale_row("scaleeval_35m_v4", "scaleeval_35m_v4.log")

prof_row("rootprofile_35m_r17a", "rootprofile_35m.log")
prof_row("rootprofile_35m_r17b", "rootprofile_35m_b.log")
prof_row("rootprofile_35m_r17c", "rootprofile_35m_c.log")
prof_row("rootprofile_35m_parts_default", "rootprofile_35m_parts_default.log")
prof_row("rootprofile_35m_parts_8", "rootprofile_35m_parts_8.log")
prof_row("rootprofile_35m_parts_4", "rootprofile_35m_parts_4.log")
prof_row("rootprofile_35m_final_DISCARDED", "rootprofile_35m_final.log")
prof_row("rootprofile_35m_v2", "rootprofile_35m_v2.log")
prof_row("rootprofile_2m_3files_rangesplit_only", "rootprofile_2m_b.log")
prof_row("rootprofile_2m_3files_v2", "rootprofile_2m_v2.log")
prof_row("rootprofile_2m_665files_v2", "rootprofile_2m_manyfile_v2.log")

for k, f in [("coded_files_2m_base", "files_2m.txt"),
             ("coded_files_2m_shift4", "files_2mf4.txt")]:
    p = os.path.join(R, f)
    if os.path.exists(p):
        out[k] = int(open(p).read().strip())

out["provenance"] = {
    "note": (
        "r17 rows come from the committed harnesses on frozen class "
        "snapshots (graft_run.sh). Rows suffixed _DISCARDED were measured "
        "on the range-split code BEFORE the midpoint-footer fix: their "
        "equality gates read false (duplicated row groups) and their "
        "timings are not admissible — kept as the honest record of the "
        "regression the multi-range spec gate now pins. Reading rules: "
        "(1) compare catalyst/p50 rows only inside healthy single-thread "
        "canary windows (kernel >= 1600, see Canary.HealthyKernelFloor); "
        "(2) read qps rows only when kernel_canary_16t >= ~8x the "
        "single-thread reading in the SAME window — the box has "
        "multi-core-collapse windows invisible to the single-thread "
        "canary (first live catch: scaleeval_35m_clean's prepared block, "
        "16t=2696 vs healthy ~20000); (3) interleaved A/B rounds "
        "(custom,catalyst) within one JVM are valid even in degraded "
        "windows. The r16 carried gates, BOTH MET on final-code artifacts: "
        "catalyst p50 <300 ms at 35M — scaleeval_35m_v3: 204 ms, bracket "
        "2290/2392 (earlier same-root rows: retry 273, v2 607 with a "
        "mid-block flap; rootprofile_35m_v2 A/B custom rounds 170-180 ms) "
        "— and >=80 qps @16 threads at 35M — scaleeval_35m_v3: routed "
        "104.9 / prepared 129.2, 16t canary 19284 (v2: 88.8/131.5, "
        "canaries 2271/2414 + 16t 19219), equality gates TRUE and recall "
        "1.0 on every admitted row. Replications on final code: "
        "scaleeval_35m_v4 280 ms / 97.6 routed / 102.5 prepared; "
        "scale_5m_768_opq 196 ms / 101.6 / 116.4 at the published "
        "dimensionality."),
}

with open(os.path.join(R, "..", "EVAL_r17.json"), "w") as f:
    json.dump(out, f, indent=1)
print("rows:", list(out.keys()))
