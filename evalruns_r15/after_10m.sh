#!/bin/bash
R=/root/repo/evalruns_r15
# wait for the ScaleEval JVM to exit
while pgrep -f "java.*graft.ScaleEval" > /dev/null; do sleep 20; done
echo "=== 10m rerun done rc recorded by caller $(date)" >> $R/progress.log
rm -rf /tmp/blockmgr-* /tmp/spark-* /tmp/graft-scale* /tmp/graft-eval*
echo "=== published_eval_648q_nodelay $(date)" >> $R/progress.log
GRAFT_EVAL_N=57638 GRAFT_EVAL_D=768 GRAFT_EVAL_ROWS_PER_CENTER=100 \
GRAFT_EVAL_OPQ=true GRAFT_EVAL_PRELIM_K=200 GRAFT_EVAL_FINAL_K=20 \
GRAFT_EVAL_Q=648 SPARK_GRAFT_CPUS=32 \
  $R/graft_run.sh graft.Eval 40g > $R/published_eval_648q_nodelay.log 2>&1
echo "rc=$? $(date)" >> $R/progress.log
rm -rf /tmp/blockmgr-* /tmp/spark-* /tmp/graft-eval*
echo "=== CHAIN DONE $(date)" >> $R/progress.log
