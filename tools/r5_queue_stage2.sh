#!/bin/bash
# Round-5 chip queue, stage 2: the ensemble confound-isolation arm
# (VERDICT r5 item 3). ONE 9-member vmapped multitask run that yields
# BOTH constructions:
#   * shared-stream (--no-decorrelate) + average-RAE selection
#     == exact round-3 mt_ens_vmap replication (LogD row 0.4195)
#   * shared-stream + per-endpoint best-state selection
#     == confound (a) isolated, everything else identical
# Kernel numerics pinned to the round-3 operating point (select shift,
# byte masks, f32 FFN activations, v4 split path) so confound (b)
# (SHIFT=matmul) is out of the run entirely.
set -u
cd /root/repo
Q=/tmp/r5_stage2_status.log
echo "$(date -u +%H:%M:%S) stage2 start" >> "$Q"

export GT_TPU_PROJ=off
export GT_TPU_SHIFT=select
export GT_TPU_FFN_PRNG=bytes
export GT_TPU_FFN_ACT16=0
export GT_TPU_SOFT_PREC=split2

if timeout 18000 python -u examples/multitask_ensemble.py --vmap \
    --n-models 9 --epochs 2000 --bf16 --eval-every 4 \
    --no-decorrelate --per-endpoint-select \
    --out runs/mt_ens_r5 \
    --test-csv /root/reference/examples/data/test-set/expansion_data_test_full_lb_flag.csv \
    --n-boot 1000 > /tmp/mt_ens_r5.log 2>&1; then
  echo "$(date -u +%H:%M:%S) ensemble arm done" >> "$Q"
else
  echo "$(date -u +%H:%M:%S) ensemble arm FAILED/timeout (/tmp/mt_ens_r5.log)" >> "$Q"
fi
echo "$(date -u +%H:%M:%S) stage2 END" >> "$Q"
