#!/usr/bin/env python3
"""Assemble EVAL_r12.json from the battery logs: each harness prints ONE
JSON line; take the last parseable JSON object line per log."""
import json, re, sys, os
R = "/root/repo/evalruns_r12"
rows = {
    "published_eval": "published_eval.log",
    "probe_select": "probe_select.log",
    "scale_run_35m": "scale_35m.log",
    "stream_near_dup_10m": "stream_10m.log",
    "scale_run_35m_opq": "scale_35m_opq.log",
    "scale_run_100m": "scale_100m.log",
}
# Provenance note: the first 35M-OPQ and 100M attempts ENOSPC'd in
# prepareServing — PreparedANN.buildBlocks shuffled (Int, Row) pairs
# through an RDD HashPartitioner, Java-serializing every row at 3-6x
# the bytes. Fixed in-round (SQL-layer repartition on cluster_id);
# these rows are from the post-fix re-runs on final code.
NOTES = {
    "provenance": {
        "scale_rerun_reason": "first 35M-OPQ/100M attempts ENOSPC'd in "
            "the prepare-blocks RDD shuffle (Java serialization, 3-6x "
            "bloat); fixed by moving the shuffle to the SQL layer "
            "(PreparedANN.buildBlocks), then re-run on final code",
    }
}
out = {}
for key, log in rows.items():
    p = os.path.join(R, log)
    if not os.path.exists(p):
        print(f"MISSING {log}"); continue
    last = None
    for line in open(p, errors="replace"):
        line = line.strip()
        if line.startswith("[info] "):
            line = line[len("[info] "):]
        if line.startswith("{") and line.endswith("}"):
            try: last = json.loads(line)
            except Exception: pass
    if last is None:
        print(f"NO JSON in {log}"); continue
    out[key] = last
out.update(NOTES)
json.dump(out, open("/root/repo/EVAL_r12.json", "w"), indent=2)
print(f"wrote EVAL_r12.json with {len(out)}/{len(rows)+len(NOTES)} rows")
