#!/bin/bash
QS=tfidf_topk,bigram_logprob,dsir_weights,dsir_weights_hashed,kmv_distinct,kmv_overlap,dedup_incremental,q3_topk_join,streaming_dedup_inc,train_subsample,lifecycle_ids,rest_api
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g
export SPARK_GRAFT_BENCH_ONLY=$QS SPARK_GRAFT_CANARY_MAX_WAIT_S=120
for i in 1 2 3; do
  cd /root/repo_r18 && SPARK_GRAFT_BENCH_OUT=/root/repo/optruns_r19/ab1_old_$i.json sbt -batch "runMain graft.Bench" > /root/repo/optruns_r19/ab1_old_$i.log 2>&1
  cd /root/repo     && SPARK_GRAFT_BENCH_OUT=/root/repo/optruns_r19/ab1_new_$i.json sbt -batch "runMain graft.Bench" > /root/repo/optruns_r19/ab1_new_$i.log 2>&1
done
echo DONE > /root/repo/optruns_r19/ab_lm.done
