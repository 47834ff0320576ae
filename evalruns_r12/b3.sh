#!/bin/bash
# OPQ-on scale re-run at a size that fits the box's ~70 GB scratch:
# 35M x 128d needs ~75 GB peak (data table + old flat coded + new coded
# + train shuffle) and died ENOSPC at 53 min; 25M x 128d peaks ~48 GB.
cd /root/repo
R=/root/repo/evalruns_r12
sweep() { rm -rf /tmp/graft-scale* /tmp/graft-eval* /tmp/graft-sweep* 2>/dev/null; sync; }
sweep
echo "=== scale_25m_opq $(date)" >> $R/progress.log
GRAFT_SCALE_N=25000000 GRAFT_SCALE_D=128 GRAFT_SCALE_OPQ=true \
GRAFT_SCALE_PCA=128 GRAFT_SCALE_OPQ_DIM=128 GRAFT_SCALE_PQM=32 \
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=100g \
  sbt -batch "runMain graft.ScaleEval" > $R/scale_25m_opq.log 2>&1
sweep
echo "=== b3 done $(date)" >> $R/progress.log
