#!/bin/bash
# Round-16 measurement sequence. Ordering is disk-driven (~79 GB free):
#  1. RootProfile against the kept 35M base root (built by rootbuild_35m
#     step) — the catalyst-p50 and concurrency gates (VERDICT r15 #3/#4).
#  2. Packed 35M root + RootProfile filtered loops — reproduce or clear
#     the r15 packed-root filtered anomaly (VERDICT r15 #5).
#  3. Delete both 35M roots, then the 20M x 768 OPQ envelope point
#     (VERDICT r15 #6) via ScaleEval.
# Each main canary-gates itself (Canary.awaitHealthyKernel).
R=/root/repo/evalruns_r16
RUN=$R/graft_run.sh
sweep() { rm -rf /tmp/blockmgr-* /tmp/spark-* /tmp/graft-scale* /tmp/graft-eval* /tmp/graft-ss-* /tmp/graft-serve* /tmp/graft-rest*; }

echo "=== rootprofile_35m $(date)" >> $R/progress.log
SPARK_GRAFT_CPUS=32 \
  $RUN graft.core.RootProfile 64g /tmp/graft-root35 scale 64 8 \
  > $R/rootprofile_35m.log 2>&1
echo "rc=$? $(date)" >> $R/progress.log
sweep

echo "=== rootbuild_35m_packed $(date)" >> $R/progress.log
GRAFT_SCALE_N=35000000 GRAFT_SCALE_D=64 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 GRAFT_SCALE_PACKED=true SPARK_GRAFT_CPUS=32 \
GRAFT_ROOT_DIR=/tmp/graft-root35p \
  $RUN graft.RootBuild 100g > $R/rootbuild_35m_packed.log 2>&1
echo "rc=$? $(date)" >> $R/progress.log
sweep

echo "=== rootprofile_35m_packed $(date)" >> $R/progress.log
SPARK_GRAFT_CPUS=32 \
  $RUN graft.core.RootProfile 64g /tmp/graft-root35p scale 64 8 \
  > $R/rootprofile_35m_packed.log 2>&1
echo "rc=$? $(date)" >> $R/progress.log
sweep

rm -rf /tmp/graft-root35 /tmp/graft-root35p
echo "=== scale_20m_768_opq $(date)" >> $R/progress.log
GRAFT_SCALE_N=20000000 GRAFT_SCALE_D=768 GRAFT_SCALE_OPQ=true \
SPARK_GRAFT_CPUS=32 \
  $RUN graft.ScaleEval 100g > $R/scale_20m_768_opq.log 2>&1
echo "rc=$? $(date)" >> $R/progress.log
sweep
echo "=== ALL DONE $(date)" >> $R/progress.log
