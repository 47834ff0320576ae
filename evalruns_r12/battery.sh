#!/bin/bash
# Sequential measurement battery for EVAL_r12.json — each step prints ONE
# JSON line into its log; temp engine roots are swept between steps so the
# 57 GB disk budget holds.
cd /root/repo
R=/root/repo/evalruns_r12
sweep() { rm -rf /tmp/graft-scale* /tmp/graft-eval* 2>/dev/null; sync; }

echo "=== published_eval $(date)" >> $R/progress.log
GRAFT_EVAL_N=57638 GRAFT_EVAL_D=768 GRAFT_EVAL_OPQ=true \
GRAFT_EVAL_PRELIM_K=200 GRAFT_EVAL_FINAL_K=20 GRAFT_EVAL_ROWS_PER_CENTER=100 \
SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Eval" > $R/published_eval.log 2>&1
sweep

echo "=== probe_select $(date)" >> $R/progress.log
sbt -batch "runMain graft.ProbeSelectBench" > $R/probe_select.log 2>&1

echo "=== scale_35m $(date)" >> $R/progress.log
GRAFT_SCALE_N=35000000 GRAFT_SCALE_D=64 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.ScaleEval" > $R/scale_35m.log 2>&1
sweep

echo "=== stream_10m $(date)" >> $R/progress.log
GRAFT_SS_DOCS=10000000 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.StreamScale" > $R/stream_10m.log 2>&1
rm -rf /tmp/graft-ss* /tmp/stream* 2>/dev/null

echo "=== scale_35m_opq $(date)" >> $R/progress.log
GRAFT_SCALE_N=35000000 GRAFT_SCALE_D=128 GRAFT_SCALE_OPQ=true \
GRAFT_SCALE_PCA=128 GRAFT_SCALE_OPQ_DIM=128 GRAFT_SCALE_PQM=32 \
SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.ScaleEval" > $R/scale_35m_opq.log 2>&1
sweep

echo "=== scale_100m $(date)" >> $R/progress.log
GRAFT_SCALE_N=100000000 GRAFT_SCALE_D=32 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.ScaleEval" > $R/scale_100m.log 2>&1
sweep
echo "=== done $(date)" >> $R/progress.log
