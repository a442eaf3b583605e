#!/bin/bash
# Round-5 chip supervisor, take 2: the stage-2 TRAINING completed (90
# checkpoints in runs/mt_ens_r5) but its eval phase was recompiling the
# predict program per checkpoint (~2 h of tunnel compiles); it was
# stopped, _ensemble_predict now reuses one jitted Trainer, and this
# script re-runs the eval from the checkpoints, then the pooling A/B,
# then stage 1.
set -u
cd /root/repo
Q=/tmp/r5_supervisor.log
echo "$(date -u +%H:%M:%S) supervisor2 start" >> "$Q"

export GT_TPU_PROJ=off
export GT_TPU_SHIFT=select
export GT_TPU_FFN_PRNG=bytes
export GT_TPU_FFN_ACT16=0
export GT_TPU_SOFT_PREC=split2
export GT_TPU_POOL=off

if timeout 5400 python -u examples/multitask_ensemble.py --vmap \
    --n-models 9 --epochs 2000 --bf16 --eval-only --per-endpoint-select \
    --out runs/mt_ens_r5 \
    --test-csv /root/reference/examples/data/test-set/expansion_data_test_full_lb_flag.csv \
    --n-boot 1000 >> /tmp/mt_ens_r5.log 2>&1; then
  echo "$(date -u +%H:%M:%S) ensemble eval done" >> "$Q"
else
  echo "$(date -u +%H:%M:%S) ensemble eval FAILED (/tmp/mt_ens_r5.log)" >> "$Q"
fi

unset GT_TPU_PROJ GT_TPU_SHIFT GT_TPU_FFN_PRNG GT_TPU_FFN_ACT16 \
      GT_TPU_SOFT_PREC GT_TPU_POOL

GT_TPU_POOL=off timeout 1200 python -u bench.py \
  > /tmp/bench_pool_off.log 2>&1 \
  && echo "$(date -u +%H:%M:%S) pool=off bench done" >> "$Q" \
  || echo "$(date -u +%H:%M:%S) pool=off bench FAILED" >> "$Q"
timeout 1200 python -u bench.py \
  > /tmp/bench_pool_auto.log 2>&1 \
  && echo "$(date -u +%H:%M:%S) pool=auto bench done" >> "$Q" \
  || echo "$(date -u +%H:%M:%S) pool=auto bench FAILED" >> "$Q"

export R5_DEADLINE_EPOCH=$(date -u -d "today 23:30" +%s)
bash tools/r5_queue_stage1.sh
echo "$(date -u +%H:%M:%S) supervisor2 END" >> "$Q"
