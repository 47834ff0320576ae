#!/bin/bash
# Round-14 measurement sequence. Every main canary-gates itself before
# the build AND again before each serving block (Canary.awaitHealthyKernel)
# — the r13 verdict's admissibility fix. Logs land next to this script;
# assemble.py lifts the one-JSON-line-per-log into EVAL_r14.json.
R=/root/repo/evalruns_r14
RUN=$R/graft_run.sh
sweep() { rm -rf /tmp/blockmgr-* /tmp/spark-* /tmp/graft-scale* /tmp/graft-eval* /tmp/graft-ss-* /tmp/graft-serve* /tmp/graft-rest*; }

echo "=== scale_35m $(date)" >> $R/progress.log
GRAFT_SCALE_N=35000000 GRAFT_SCALE_D=64 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 SPARK_GRAFT_CPUS=32 \
  $RUN graft.ScaleEval 100g > $R/scale_35m.log 2>&1
echo "rc=$? $(date)" >> $R/progress.log
sweep

echo "=== published_eval_648q $(date)" >> $R/progress.log
GRAFT_EVAL_N=57638 GRAFT_EVAL_D=768 GRAFT_EVAL_ROWS_PER_CENTER=100 \
GRAFT_EVAL_OPQ=true GRAFT_EVAL_PRELIM_K=200 GRAFT_EVAL_FINAL_K=20 \
GRAFT_EVAL_Q=648 SPARK_GRAFT_CPUS=32 \
  $RUN graft.Eval 40g > $R/published_eval_648q.log 2>&1
echo "rc=$? $(date)" >> $R/progress.log
sweep

echo "=== stream_rocksdb_10m $(date)" >> $R/progress.log
GRAFT_SS_DOCS=10000000 GRAFT_SS_FILES=12 GRAFT_SS_HOURS=6 \
GRAFT_SS_PROVIDER=rocksdb SPARK_GRAFT_CPUS=16 \
  $RUN graft.StreamScale 40g > $R/stream_rocksdb_10m.log 2>&1
echo "rc=$? $(date)" >> $R/progress.log
sweep

echo "=== scale_5m_768_opq $(date)" >> $R/progress.log
GRAFT_SCALE_N=5000000 GRAFT_SCALE_D=768 GRAFT_SCALE_OPQ=true \
SPARK_GRAFT_CPUS=32 \
  $RUN graft.ScaleEval 100g > $R/scale_5m_768_opq.log 2>&1
echo "rc=$? $(date)" >> $R/progress.log
sweep

echo "=== scale_10m_768_opq $(date)" >> $R/progress.log
GRAFT_SCALE_N=10000000 GRAFT_SCALE_D=768 GRAFT_SCALE_OPQ=true \
SPARK_GRAFT_CPUS=32 \
  $RUN graft.ScaleEval 100g > $R/scale_10m_768_opq.log 2>&1
echo "rc=$? $(date)" >> $R/progress.log
sweep
echo "=== ALL DONE $(date)" >> $R/progress.log
