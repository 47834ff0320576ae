#!/bin/bash
# A/B the saveModel/loadModel job-overlap commit (be394af vs parent f5fda23):
# interleaved BENCH_ONLY over the train-path rows, canary-gated, 3 pairs.
QS=train_subsample,engine_verbs,retrain_decisions,rest_api,trained_counters
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g
export SPARK_GRAFT_BENCH_ONLY=$QS SPARK_GRAFT_CANARY_MAX_WAIT_S=300
for i in 1 2 3; do
  cd /root/repo      && SPARK_GRAFT_BENCH_OUT=/root/repo/optruns_r19/ab4_new_$i.json sbt -batch "runMain graft.Bench" > /root/repo/optruns_r19/ab4_new_$i.log 2>&1
  cd /root/repo_prev && SPARK_GRAFT_BENCH_OUT=/root/repo/optruns_r19/ab4_old_$i.json sbt -batch "runMain graft.Bench" > /root/repo/optruns_r19/ab4_old_$i.log 2>&1
done
echo DONE > /root/repo/optruns_r19/ab4.done
