#!/bin/bash
# Re-run of the contended final2 32-cpu leg (artifact of record).
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_DRIVER_MEM=96g
export SPARK_GRAFT_CANARY_MAX_WAIT_S=900
cd /root/repo
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" > /root/repo/optruns_r19/final3_32cpu.log 2>&1
echo "RC32=$?" >> /root/repo/optruns_r19/final3_32cpu.log
echo DONE > /root/repo/optruns_r19/final3.done
