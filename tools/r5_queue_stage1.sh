#!/bin/bash
# Round-5 chip queue, stage 1: the 5-seed single-model LogD study
# (VERDICT r5 item 4), doubling as the select side of the SHIFT A/B;
# matmul arms run after, deadline permitting (item 2's trained-horizon
# pairs — the sweep already shows 5 consistent paired short-horizon
# rows, so the select default does not hinge on these).
# All runs are the production bf16/tile fast path with every kernel
# knob pinned identically EXCEPT GT_TPU_SHIFT. GT_TPU_POOL is pinned
# off: the moments kernel postdates the seed-table recipe and stays out
# of the study's numerics.
set -u
cd /root/repo
Q=/tmp/r5_stage1_status.log
DEADLINE_EPOCH=${R5_DEADLINE_EPOCH:-0}   # unix time; 0 = no deadline

past_deadline() {
  [ "$DEADLINE_EPOCH" != "0" ] && [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]
}

echo "$(date -u +%H:%M:%S) stage1 start (deadline=$DEADLINE_EPOCH)" >> "$Q"

export GT_TPU_PROJ=off
export GT_TPU_SHIFT=select
export GT_TPU_FFN_PRNG=bytes
export GT_TPU_FFN_ACT16=1
export GT_TPU_SOFT_PREC=split2
export GT_TPU_POOL=off

# 1. select arms, one seed at a time so a deadline cut keeps whole seeds
for s in 11 23 37 53 71; do
  if past_deadline; then
    echo "$(date -u +%H:%M:%S) deadline hit before select seed $s" >> "$Q"
    break
  fi
  if GT_TPU_SHIFT=select timeout 3600 python -u tools/seed_study.py \
      --seeds "$s" --epochs 2000 --out runs/r5_seed_study --no-eval \
      >> /tmp/r5_seed_study.log 2>&1; then
    echo "$(date -u +%H:%M:%S) select seed $s done" >> "$Q"
  else
    echo "$(date -u +%H:%M:%S) select seed $s FAILED/timeout" >> "$Q"
  fi
done

# 2. matmul arms (same seeds as the first two select arms)
for s in 11 23; do
  if past_deadline; then
    echo "$(date -u +%H:%M:%S) deadline hit before matmul seed $s" >> "$Q"
    break
  fi
  if GT_TPU_SHIFT=matmul timeout 3600 python -u tools/seed_study.py \
      --seeds "$s" --epochs 2000 --out runs/r5_shift_matmul --no-eval \
      >> /tmp/r5_shift_matmul.log 2>&1; then
    echo "$(date -u +%H:%M:%S) matmul seed $s done" >> "$Q"
  else
    echo "$(date -u +%H:%M:%S) matmul seed $s FAILED/timeout" >> "$Q"
  fi
done

# 3. evaluate whatever trained (test-CSV bootstrap, k-seed ensembles)
timeout 3000 python -u tools/seed_study.py --seeds 11,23,37,53,71 \
    --out runs/r5_seed_study --eval-only \
    >> /tmp/r5_seed_study.log 2>&1 \
  && echo "$(date -u +%H:%M:%S) select eval done" >> "$Q" \
  || echo "$(date -u +%H:%M:%S) select eval FAILED" >> "$Q"
if [ -d runs/r5_shift_matmul ]; then
  timeout 2000 python -u tools/seed_study.py --seeds 11,23 \
      --out runs/r5_shift_matmul --eval-only \
      >> /tmp/r5_shift_matmul.log 2>&1 \
    && echo "$(date -u +%H:%M:%S) matmul eval done" >> "$Q" \
    || echo "$(date -u +%H:%M:%S) matmul eval FAILED" >> "$Q"
fi

echo "$(date -u +%H:%M:%S) stage1 END" >> "$Q"
