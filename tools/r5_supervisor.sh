#!/bin/bash
# Round-5 chip supervisor: wait for stage 2 (ensemble arm), A/B the new
# pooling kernel on the freed chip, then run stage 1 (seed study) with
# a deadline so the round ends with evaluated artifacts.
set -u
cd /root/repo
Q=/tmp/r5_supervisor.log
echo "$(date -u +%H:%M:%S) supervisor start" >> "$Q"

# 1. wait for the stage-2 ensemble process to finish (pid via pattern
# match is read-only; we never signal it)
while pgrep -f "examples/multitask_ensemble.py" > /dev/null; do
  sleep 60
done
echo "$(date -u +%H:%M:%S) stage2 gone; pooling A/B" >> "$Q"

# 2. pooling-kernel hardware A/B at the tier-0 config
GT_TPU_POOL=off timeout 1200 python -u bench.py \
  > /tmp/bench_pool_off.log 2>&1 \
  && echo "$(date -u +%H:%M:%S) pool=off bench done" >> "$Q" \
  || echo "$(date -u +%H:%M:%S) pool=off bench FAILED" >> "$Q"
timeout 1200 python -u bench.py \
  > /tmp/bench_pool_auto.log 2>&1 \
  && echo "$(date -u +%H:%M:%S) pool=auto bench done" >> "$Q" \
  || echo "$(date -u +%H:%M:%S) pool=auto bench FAILED" >> "$Q"

# 3. stage 1 with a deadline: no new training run starts after 23:30 UTC
export R5_DEADLINE_EPOCH=$(date -u -d "today 23:30" +%s)
bash tools/r5_queue_stage1.sh
echo "$(date -u +%H:%M:%S) supervisor END" >> "$Q"
