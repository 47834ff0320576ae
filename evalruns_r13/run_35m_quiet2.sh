#!/bin/bash
# Quiet re-run of the 35M scale point (the first run was contaminated by
# concurrent builds — cpu canary 268 ms vs 83 healthy). Run with the box
# otherwise idle; the artifact row comes from scale_35m_quiet2.log.
R=/root/r13evals
rm -rf /tmp/blockmgr-* /tmp/spark-* /tmp/graft-scale* /tmp/graft-eval* /tmp/graft-ss-*
echo "=== scale_35m_quiet2 $(date)" >> $R/progress.log
GRAFT_SCALE_N=35000000 GRAFT_SCALE_D=64 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 SPARK_GRAFT_CPUS=32 \
  /root/r13evals/graft_run_frozen2.sh graft.ScaleEval 100g > $R/scale_35m_quiet2.log 2>&1
echo "rc=$? $(date)" >> $R/progress.log
rm -rf /tmp/blockmgr-* /tmp/spark-* /tmp/graft-scale*
echo "=== quiet rerun done $(date)" >> $R/progress.log
