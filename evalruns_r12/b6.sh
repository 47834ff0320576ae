#!/bin/bash
# Final-code coherence pass: the 35M (no-OPQ) and published-eval rows in
# b2 predate the buildBlocks SQL-shuffle fix — re-run both so every row
# in EVAL_r12.json is from the same final code.
cd /root/repo
R=/root/repo/evalruns_r12
sweep() {
  rm -rf /tmp/graft-scale* /tmp/graft-eval* /tmp/graft-sweep* \
         /tmp/graft-2lvl* /tmp/blockmgr-* /tmp/spark-* 2>/dev/null
  sync
}
sweep
df -h / >> $R/progress.log

echo "=== published_eval rerun (final code) $(date)" >> $R/progress.log
GRAFT_EVAL_N=57638 GRAFT_EVAL_D=768 GRAFT_EVAL_OPQ=true \
GRAFT_EVAL_PRELIM_K=200 GRAFT_EVAL_FINAL_K=20 GRAFT_EVAL_ROWS_PER_CENTER=100 \
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=100g \
  sbt -batch "runMain graft.Eval" > $R/published_eval.log 2>&1
sweep

echo "=== scale_35m rerun (final code) $(date)" >> $R/progress.log
GRAFT_SCALE_N=35000000 GRAFT_SCALE_D=64 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=100g \
  sbt -batch "runMain graft.ScaleEval" > $R/scale_35m.log 2>&1
sweep
echo "=== b6 done $(date)" >> $R/progress.log
