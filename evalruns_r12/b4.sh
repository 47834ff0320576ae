#!/bin/bash
# Re-run of the two b2 steps that died on ENOSPC. Root cause: the 35M-OPQ
# crash left the dead JVM's Spark scratch (blockmgr-*/spark-*) on /tmp —
# b2's sweep only matched graft-* prefixes — so the 100M step started with
# ~10 GB of headroom instead of ~78 GB and died mid-train at the same spot
# r10 passed with a clean disk. Sweep now covers Spark's own dirs too, and
# the OPQ point drops to 25M x 128d (peak ~48 GB scratch; 35M x 128d needs
# ~75 GB and inherently does not fit this box — recorded as the disk
# ceiling in EVAL_r12).
cd /root/repo
R=/root/repo/evalruns_r12
sweep() {
  rm -rf /tmp/graft-scale* /tmp/graft-eval* /tmp/graft-sweep* \
         /tmp/graft-2lvl* /tmp/blockmgr-* /tmp/spark-* 2>/dev/null
  sync
}
sweep
df -h / >> $R/progress.log

echo "=== scale_100m retry $(date)" >> $R/progress.log
GRAFT_SCALE_N=100000000 GRAFT_SCALE_D=32 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=100g \
  sbt -batch "runMain graft.ScaleEval" > $R/scale_100m.log 2>&1
sweep
df -h / >> $R/progress.log

echo "=== scale_25m_opq $(date)" >> $R/progress.log
GRAFT_SCALE_N=25000000 GRAFT_SCALE_D=128 GRAFT_SCALE_OPQ=true \
GRAFT_SCALE_PCA=128 GRAFT_SCALE_OPQ_DIM=128 GRAFT_SCALE_PQM=32 \
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=100g \
  sbt -batch "runMain graft.ScaleEval" > $R/scale_25m_opq.log 2>&1
sweep
echo "=== b4 done $(date)" >> $R/progress.log
