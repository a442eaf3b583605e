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
export GT_TPU_FFN_ACT16=0
export GT_TPU_SOFT_PREC=split2
export GT_TPU_POOL=off

# 0. the missing cell of the ensemble isolation matrix (VERDICT item
# 3c): DECORRELATED member streams + PER-ENDPOINT selection. The r5
# shared-stream arm measured confound (a) at ~0.024 LogD MAE
# (avg-selection 0.4400 -> per-endpoint 0.4160) with SHIFT=select
# pinned; decorrelation is the one remaining change vs that arm, and
# per-endpoint selection is the named fix for what broke round 4's
# decorrelated run. ~2.1 h.
if timeout 9000 python -u examples/multitask_ensemble.py --vmap \
    --n-models 9 --epochs 2000 --bf16 --eval-every 4 \
    --per-endpoint-select \
    --out runs/mt_ens_r5c \
    --test-csv /root/reference/examples/data/test-set/expansion_data_test_full_lb_flag.csv \
    --n-boot 1000 > /tmp/mt_ens_r5c.log 2>&1; then
  echo "$(date -u +%H:%M:%S) decorrelated+per-endpoint arm done" >> "$Q"
else
  echo "$(date -u +%H:%M:%S) decorrelated+per-endpoint arm FAILED/timeout" >> "$Q"
fi

# (GT_TPU_FFN_ACT16 stays 0: the round-3 seed-table recipe predates
# the act16 lever, and the study's comparability to that table matters
# more than a speed-neutral knob)

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
