#!/bin/bash
# Round-17 measurement sequence 2 (after the ServingScan fetch landed):
#  1. 20M x 64 full ScaleEval (VERDICT r16 next #6 - a second 64-d scale
#     row; disk: ~10 GB root + 6 GB scratch beside the kept 35M root).
#  2. Two 2M x 64 roots: default file count vs GRAFT_SCALE_GROUP_BYTES=
#     32m (many-file) - the file-count scaling A/B (next #5).
#  3. RootProfile on both 2M roots (custom-vs-catalyst A/B rounds are
#     printed by the profile itself).
#  4. A clean 35M ScaleEval retry for the gate artifact.
R=/root/repo/evalruns_r17
RUN=$R/graft_run.sh
sweep() { rm -rf /tmp/blockmgr-* /tmp/spark-*; }

echo "=== scale_20m start $(date)" >> $R/progress.log
GRAFT_SCALE_N=20000000 GRAFT_SCALE_D=64 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 SPARK_GRAFT_CPUS=32 \
  $RUN graft.ScaleEval 100g > $R/scale_20m_64.log 2>&1
echo "scale_20m rc=$? $(date)" >> $R/progress.log
sweep
rm -rf /tmp/graft-scale*

echo "=== rootbuild_2m base $(date)" >> $R/progress.log
GRAFT_SCALE_N=2000000 GRAFT_SCALE_D=64 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 SPARK_GRAFT_CPUS=32 GRAFT_ROOT_DIR=/tmp/graft-root2m \
  $RUN graft.RootBuild 64g > $R/rootbuild_2m.log 2>&1
echo "rootbuild_2m rc=$? $(date)" >> $R/progress.log
sweep

echo "=== rootbuild_2m manyfile $(date)" >> $R/progress.log
GRAFT_SCALE_N=2000000 GRAFT_SCALE_D=64 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 GRAFT_SCALE_GROUP_BYTES=16777216 SPARK_GRAFT_CPUS=32 \
GRAFT_ROOT_DIR=/tmp/graft-root2mf \
  $RUN graft.RootBuild 64g > $R/rootbuild_2m_manyfile.log 2>&1
echo "rootbuild_2mf rc=$? $(date)" >> $R/progress.log
sweep
find /tmp/graft-root2m -name '*.parquet' -path '*coded*' | wc -l > $R/files_2m.txt
find /tmp/graft-root2mf -name '*.parquet' -path '*coded*' | wc -l > $R/files_2mf.txt

echo "=== rootprofile_2m base $(date)" >> $R/progress.log
SPARK_GRAFT_CPUS=32 GRAFT_PROBE_PUSH_CHUNK=64 \
  $RUN graft.core.RootProfile 48g /tmp/graft-root2m scale 64 8 \
  > $R/rootprofile_2m.log 2>&1
echo "rootprofile_2m rc=$? $(date)" >> $R/progress.log
sweep

echo "=== rootprofile_2m manyfile $(date)" >> $R/progress.log
SPARK_GRAFT_CPUS=32 GRAFT_PROBE_PUSH_CHUNK=64 \
  $RUN graft.core.RootProfile 48g /tmp/graft-root2mf scale 64 8 \
  > $R/rootprofile_2m_manyfile.log 2>&1
echo "rootprofile_2mf rc=$? $(date)" >> $R/progress.log
sweep

echo "=== scaleeval_35m_retry $(date)" >> $R/progress.log
GRAFT_SCALE_N=35000000 GRAFT_SCALE_D=64 GRAFT_SCALE_OPQ=false \
GRAFT_SCALE_PQM=8 GRAFT_SCALE_ROOT=/tmp/graft-root35 SPARK_GRAFT_CPUS=32 \
  $RUN graft.ScaleEval 100g > $R/scaleeval_35m_retry.log 2>&1
echo "scaleeval_retry rc=$? $(date)" >> $R/progress.log
sweep
touch $R/evals2.done
