#!/bin/bash
# Second r14 wave: (1) quiet 35M re-run on the attribution-enhanced
# ScaleEval (raw latency arrays + catalyst task/input accounting) — also
# the controlled A/B for the first wave's 299 s add / 1274 s train
# (r13: 43/873) which ran against a kernel canary of 1745, barely above
# the floor; (2) the 768-d scale point re-sized to 7M after 10M ENOSPC'd:
# the covering coded layout needs data (~31 GB at 10M) + assign+encode
# shuffle + coded on disk AT ONCE — ~8 GB per M rows at d=768, so the
# ~80 GB scratch budget caps the point at ~9M; 7M keeps 25% headroom.
R=/root/repo/evalruns_r14
RUN=$R/graft_run.sh
export GRAFT_CLASSES=/tmp/graft_r14_frozen2
sweep() { rm -rf /tmp/blockmgr-* /tmp/spark-* /tmp/graft-scale* /tmp/graft-eval* /tmp/graft-ss-*; }
sweep

echo "=== scale_35m_quiet $(date)" >> $R/progress.log
GRAFT_SCALE_N=35000000 GRAFT_SCALE_D=64 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 SPARK_GRAFT_CPUS=32 \
  $RUN graft.ScaleEval 100g > $R/scale_35m_quiet.log 2>&1
echo "rc=$? $(date)" >> $R/progress.log
sweep

echo "=== scale_7m_768_opq $(date)" >> $R/progress.log
GRAFT_SCALE_N=7000000 GRAFT_SCALE_D=768 GRAFT_SCALE_OPQ=true \
SPARK_GRAFT_CPUS=32 \
  $RUN graft.ScaleEval 100g > $R/scale_7m_768_opq.log 2>&1
echo "rc=$? $(date)" >> $R/progress.log
sweep
echo "=== WAVE2 DONE $(date)" >> $R/progress.log
