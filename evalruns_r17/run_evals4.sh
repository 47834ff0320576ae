#!/bin/bash
# Round-17 gate batch (post midpoint-filter fix + probe slicing):
# the scaleeval_35m_final numbers were measured on duplicated-row-group
# results (equality gates false) and are DISCARDED; this batch is the
# round's gate artifact.
R=/root/repo/evalruns_r17
RUN=$R/graft_run.sh
sweep() { rm -rf /tmp/blockmgr-* /tmp/spark-*; }

echo "=== scaleeval_35m_v2 $(date)" >> $R/progress.log
GRAFT_SCALE_N=35000000 GRAFT_SCALE_D=64 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 GRAFT_SCALE_ROOT=/tmp/graft-root35 SPARK_GRAFT_CPUS=32 \
  $RUN graft.ScaleEval 100g > $R/scaleeval_35m_v2.log 2>&1
echo "scaleeval_v2 rc=$? $(date)" >> $R/progress.log
sweep

echo "=== rootprofile_35m_v2 $(date)" >> $R/progress.log
SPARK_GRAFT_CPUS=32 \
  $RUN graft.core.RootProfile 64g /tmp/graft-root35 scale 64 8 \
  > $R/rootprofile_35m_v2.log 2>&1
echo "rootprofile_v2 rc=$? $(date)" >> $R/progress.log
sweep

echo "=== rootprofile_2m_v2 base $(date)" >> $R/progress.log
SPARK_GRAFT_CPUS=32 GRAFT_PROBE_PUSH_CHUNK=64 \
  $RUN graft.core.RootProfile 48g /tmp/graft-root2m scale 64 8 \
  > $R/rootprofile_2m_v2.log 2>&1
echo "rootprofile_2m_v2 rc=$? $(date)" >> $R/progress.log
sweep

echo "=== rootprofile_2m_v2 manyfile $(date)" >> $R/progress.log
SPARK_GRAFT_CPUS=32 GRAFT_PROBE_PUSH_CHUNK=64 \
  $RUN graft.core.RootProfile 48g /tmp/graft-root2mf scale 64 8 \
  > $R/rootprofile_2m_manyfile_v2.log 2>&1
echo "rootprofile_2mf_v2 rc=$? $(date)" >> $R/progress.log
sweep
touch $R/evals4.done
