#!/bin/bash
# Post-fix battery: the ENOSPC root cause was the Java-serialized RDD
# shuffle in PreparedANN.buildBlocks (fixed — SQL-layer repartition), so
# the ORIGINAL geometries are back on the table: the published-chain
# 35M x 128d OPQ point and the 100M x 32d headline.
cd /root/repo
R=/root/repo/evalruns_r12
sweep() {
  rm -rf /tmp/graft-scale* /tmp/graft-eval* /tmp/graft-sweep* \
         /tmp/graft-2lvl* /tmp/blockmgr-* /tmp/spark-* 2>/dev/null
  sync
}
sweep
df -h / >> $R/progress.log

echo "=== scale_35m_opq retry (post buildBlocks fix) $(date)" >> $R/progress.log
GRAFT_SCALE_N=35000000 GRAFT_SCALE_D=128 GRAFT_SCALE_OPQ=true \
GRAFT_SCALE_PCA=128 GRAFT_SCALE_OPQ_DIM=128 GRAFT_SCALE_PQM=32 \
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=100g \
  sbt -batch "runMain graft.ScaleEval" > $R/scale_35m_opq.log 2>&1
sweep
df -h / >> $R/progress.log

echo "=== scale_100m retry (post buildBlocks fix) $(date)" >> $R/progress.log
GRAFT_SCALE_N=100000000 GRAFT_SCALE_D=32 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=100g \
  sbt -batch "runMain graft.ScaleEval" > $R/scale_100m.log 2>&1
sweep
echo "=== b5 done $(date)" >> $R/progress.log
