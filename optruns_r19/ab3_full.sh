#!/bin/bash
# Full-96 interleaved pairs, old vs new classes, canary-gated.
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g
export SPARK_GRAFT_CANARY_MAX_WAIT_S=300
for i in 1 2 3; do
  cd /root/repo     && SPARK_GRAFT_BENCH_OUT=/root/repo/optruns_r19/ab3_new_$i.json sbt -batch "runMain graft.Bench" > /root/repo/optruns_r19/ab3_new_$i.log 2>&1
  cd /root/repo_r18 && SPARK_GRAFT_BENCH_OUT=/root/repo/optruns_r19/ab3_old_$i.json sbt -batch "runMain graft.Bench" > /root/repo/optruns_r19/ab3_old_$i.log 2>&1
done
echo DONE > /root/repo/optruns_r19/ab3.done
