#!/bin/bash
# Round-15 measurement sequence. Canary-gated mains (Canary.awaitHealthyKernel
# at entry and before each serving block). Logs land here; assemble into
# EVAL_r15.json afterwards.
R=/root/repo/evalruns_r15
RUN=$R/graft_run.sh
sweep() { rm -rf /tmp/blockmgr-* /tmp/spark-* /tmp/graft-scale* /tmp/graft-eval* /tmp/graft-ss-* /tmp/graft-serve* /tmp/graft-rest*; }

echo "=== scale_35m $(date)" >> $R/progress.log
GRAFT_SCALE_N=35000000 GRAFT_SCALE_D=64 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 SPARK_GRAFT_CPUS=32 \
  $RUN graft.ScaleEval 100g > $R/scale_35m.log 2>&1
echo "rc=$? $(date)" >> $R/progress.log
sweep

echo "=== scale_35m_packed $(date)" >> $R/progress.log
GRAFT_SCALE_N=35000000 GRAFT_SCALE_D=64 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 GRAFT_SCALE_PACKED=true SPARK_GRAFT_CPUS=32 \
  $RUN graft.ScaleEval 100g > $R/scale_35m_packed.log 2>&1
echo "rc=$? $(date)" >> $R/progress.log
sweep

# free the kept profiling root before the 768-d disk-envelope point
rm -rf /tmp/graft-root35
echo "=== scale_10m_768_opq $(date)" >> $R/progress.log
GRAFT_SCALE_N=10000000 GRAFT_SCALE_D=768 GRAFT_SCALE_OPQ=true \
SPARK_GRAFT_CPUS=32 \
  $RUN graft.ScaleEval 100g > $R/scale_10m_768_opq.log 2>&1
echo "rc=$? $(date)" >> $R/progress.log
sweep

echo "=== published_eval_648q $(date)" >> $R/progress.log
GRAFT_EVAL_N=57638 GRAFT_EVAL_D=768 GRAFT_EVAL_ROWS_PER_CENTER=100 \
GRAFT_EVAL_OPQ=true GRAFT_EVAL_PRELIM_K=200 GRAFT_EVAL_FINAL_K=20 \
GRAFT_EVAL_Q=648 SPARK_GRAFT_CPUS=32 \
  $RUN graft.Eval 40g > $R/published_eval_648q.log 2>&1
echo "rc=$? $(date)" >> $R/progress.log
sweep
echo "=== ALL DONE $(date)" >> $R/progress.log
