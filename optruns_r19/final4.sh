#!/bin/bash
# Canary-gated final re-measure: wait for TWO consecutive kernel-canary
# probes >= floor+150 (genuinely healthy, not the marginal episode tail
# that sank final2/final3), then run the 32-cpu full bench (artifact of
# record) and the 8-cpu contract check, re-gating between legs.
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_DRIVER_MEM=96g
export SPARK_GRAFT_CANARY_MAX_WAIT_S=300
await_healthy () {
  local ok=0
  while [ $ok -lt 2 ]; do
    if sbt -batch "runMain graft.DiagCanary 150" > /tmp/canary_probe.log 2>&1; then
      ok=$((ok+1))
    else
      ok=0
      sleep 120
    fi
    grep -h kernel_canary /tmp/canary_probe.log | tail -1 >> /root/repo/optruns_r19/final4_probes.log
  done
}
await_healthy
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" > /root/repo/optruns_r19/final4_32cpu.log 2>&1
echo "RC32=$?" >> /root/repo/optruns_r19/final4_32cpu.log
await_healthy
SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_OUT=/root/repo/optruns_r19/final4_bench_8cpu.json sbt -batch "runMain graft.Bench" > /root/repo/optruns_r19/final4_8cpu.log 2>&1
echo "RC8=$?" >> /root/repo/optruns_r19/final4_8cpu.log
echo DONE > /root/repo/optruns_r19/final4.done
