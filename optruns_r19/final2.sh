#!/bin/bash
# Final-classes re-measure after the IndexStore overlap commit: full 96-row
# bench at 32 cpus (artifact of record, last-clean-run policy) then the
# 8-cpu driver-contract check.
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_DRIVER_MEM=96g
export SPARK_GRAFT_CANARY_MAX_WAIT_S=600
cd /root/repo
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" > /root/repo/optruns_r19/final2_32cpu.log 2>&1
echo "RC32=$?" >> /root/repo/optruns_r19/final2_32cpu.log
SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_OUT=/root/repo/optruns_r19/final2_bench_8cpu.json sbt -batch "runMain graft.Bench" > /root/repo/optruns_r19/final2_8cpu.log 2>&1
echo "RC8=$?" >> /root/repo/optruns_r19/final2_8cpu.log
echo DONE > /root/repo/optruns_r19/final2.done
