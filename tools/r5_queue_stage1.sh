#!/bin/bash
# Round-5 chip queue, stage 1: the SHIFT=matmul trained-horizon A/B
# (VERDICT r4 item 2) fused with the 5-seed single-model LogD study
# (item 4). All runs are the production bf16/tile fast path with every
# kernel knob pinned identically EXCEPT GT_TPU_SHIFT:
#   * select arms: seeds 11,23,37,53,71 -> runs/r5_seed_study
#     (this is simultaneously the 5-seed study AND the select side of
#     the A/B at seeds 11/23)
#   * matmul arms: seeds 11,23 -> runs/r5_shift_matmul
# Identical seed => identical init + shuffle stream; the arms differ
# only in the kernel's shift-gather numerics, so a consistent val-RAE /
# test-MAE gap across both pairs is attributable to SHIFT.
set -u
cd /root/repo
Q=/tmp/r5_stage1_status.log
echo "$(date -u +%H:%M:%S) stage1 start" >> "$Q"

export GT_TPU_PROJ=off
export GT_TPU_FFN_PRNG=bytes
export GT_TPU_FFN_ACT16=1
export GT_TPU_SOFT_PREC=split2

# 1. select arms + 5-seed study (~2.5-3 h)
if GT_TPU_SHIFT=select timeout 16000 python -u tools/seed_study.py \
    --seeds 11,23,37,53,71 --out runs/r5_seed_study \
    > /tmp/r5_seed_study.log 2>&1; then
  echo "$(date -u +%H:%M:%S) select/5-seed study done" >> "$Q"
else
  echo "$(date -u +%H:%M:%S) select/5-seed study FAILED/timeout" >> "$Q"
fi

# 2. matmul arms (~1.2 h)
if GT_TPU_SHIFT=matmul timeout 9000 python -u tools/seed_study.py \
    --seeds 11,23 --out runs/r5_shift_matmul \
    > /tmp/r5_shift_matmul.log 2>&1; then
  echo "$(date -u +%H:%M:%S) matmul pair done" >> "$Q"
else
  echo "$(date -u +%H:%M:%S) matmul pair FAILED/timeout" >> "$Q"
fi

echo "$(date -u +%H:%M:%S) stage1 END" >> "$Q"
