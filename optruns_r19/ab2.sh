#!/bin/bash
QS=train_subsample,rest_api,streaming_ingest,streaming_sessions,streaming_hourly,streaming_dedup_inc,bigram_logprob,dsir_weights,dsir_weights_hashed,tfidf_topk,kmv_distinct,kmv_overlap,q3_topk_join,dedup_incremental
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g
export SPARK_GRAFT_BENCH_ONLY=$QS SPARK_GRAFT_CANARY_MAX_WAIT_S=300
for i in 1 2; do
  cd /root/repo     && SPARK_GRAFT_BENCH_OUT=/root/repo/optruns_r19/ab2_new_$i.json sbt -batch "runMain graft.Bench" > /root/repo/optruns_r19/ab2_new_$i.log 2>&1
  cd /root/repo_r18 && SPARK_GRAFT_BENCH_OUT=/root/repo/optruns_r19/ab2_old_$i.json sbt -batch "runMain graft.Bench" > /root/repo/optruns_r19/ab2_old_$i.log 2>&1
done
echo DONE > /root/repo/optruns_r19/ab2.done
