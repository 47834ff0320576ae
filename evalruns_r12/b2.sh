#!/bin/bash
cd /root/repo
R=/root/repo/evalruns_r12
sweep() { rm -rf /tmp/graft-scale* /tmp/graft-eval* /tmp/graft-ss* /tmp/stream-scale* 2>/dev/null; sync; }
# wait for any in-flight StreamScale to finish first
while pgrep -f "runMain graft.StreamScale" > /dev/null; do sleep 30; done
sweep

echo "=== scale_35m $(date)" >> $R/progress.log
GRAFT_SCALE_N=35000000 GRAFT_SCALE_D=64 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=100g \
  sbt -batch "runMain graft.ScaleEval" > $R/scale_35m.log 2>&1
sweep

echo "=== scale_35m_opq $(date)" >> $R/progress.log
GRAFT_SCALE_N=35000000 GRAFT_SCALE_D=128 GRAFT_SCALE_OPQ=true \
GRAFT_SCALE_PCA=128 GRAFT_SCALE_OPQ_DIM=128 GRAFT_SCALE_PQM=32 \
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=100g \
  sbt -batch "runMain graft.ScaleEval" > $R/scale_35m_opq.log 2>&1
sweep

echo "=== scale_100m $(date)" >> $R/progress.log
GRAFT_SCALE_N=100000000 GRAFT_SCALE_D=32 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=100g \
  sbt -batch "runMain graft.ScaleEval" > $R/scale_100m.log 2>&1
sweep
echo "=== b2 done $(date)" >> $R/progress.log
