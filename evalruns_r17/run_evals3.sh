#!/bin/bash
# Round-17 final measurement batch (post range-split + adaptive narrow):
#  1. many-file 2M root via GRAFT_SCALE_SHIFT=4 (~665 bucket files) +
#     profiles of base vs many-file 2M roots - the file-count A/B.
#  2. clean 35M ScaleEval (the gate artifact with all r17 code).
#  3. RootProfile 35M (interleaved custom/catalyst A/B + 16t qps with
#     the adaptive narrow shape).
R=/root/repo/evalruns_r17
RUN=$R/graft_run.sh
sweep() { rm -rf /tmp/blockmgr-* /tmp/spark-*; }

rm -rf /tmp/graft-root2mf
echo "=== rootbuild_2m shift4 $(date)" >> $R/progress.log
GRAFT_SCALE_N=2000000 GRAFT_SCALE_D=64 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 GRAFT_SCALE_SHIFT=4 SPARK_GRAFT_CPUS=32 \
GRAFT_ROOT_DIR=/tmp/graft-root2mf \
  $RUN graft.RootBuild 64g > $R/rootbuild_2m_shift4.log 2>&1
echo "rootbuild_2mf4 rc=$? $(date)" >> $R/progress.log
sweep
find /tmp/graft-root2mf -name '*.parquet' -path '*coded*' | wc -l > $R/files_2mf4.txt

echo "=== rootprofile_2m base2 $(date)" >> $R/progress.log
SPARK_GRAFT_CPUS=32 GRAFT_PROBE_PUSH_CHUNK=64 \
  $RUN graft.core.RootProfile 48g /tmp/graft-root2m scale 64 8 \
  > $R/rootprofile_2m_b.log 2>&1
echo "rootprofile_2m_b rc=$? $(date)" >> $R/progress.log
sweep

echo "=== rootprofile_2m manyfile2 $(date)" >> $R/progress.log
SPARK_GRAFT_CPUS=32 GRAFT_PROBE_PUSH_CHUNK=64 \
  $RUN graft.core.RootProfile 48g /tmp/graft-root2mf scale 64 8 \
  > $R/rootprofile_2m_manyfile_b.log 2>&1
echo "rootprofile_2mf_b rc=$? $(date)" >> $R/progress.log
sweep

echo "=== scaleeval_35m_final $(date)" >> $R/progress.log
GRAFT_SCALE_N=35000000 GRAFT_SCALE_D=64 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 GRAFT_SCALE_ROOT=/tmp/graft-root35 SPARK_GRAFT_CPUS=32 \
  $RUN graft.ScaleEval 100g > $R/scaleeval_35m_final.log 2>&1
echo "scaleeval_final rc=$? $(date)" >> $R/progress.log
sweep

echo "=== rootprofile_35m_final $(date)" >> $R/progress.log
SPARK_GRAFT_CPUS=32 \
  $RUN graft.core.RootProfile 64g /tmp/graft-root35 scale 64 8 \
  > $R/rootprofile_35m_final.log 2>&1
echo "rootprofile_final rc=$? $(date)" >> $R/progress.log
sweep
touch $R/evals3.done
