#!/bin/bash
# Round-6 chip queue — runs AFTER the weighted multitask ensemble arm
# (runs/mt_ens_r6w3) frees the chip. Ordered by VERDICT r5 priority:
#   1. perf item 3: hidden-256 MFU falsification point (one bench run)
#   2. item 4: pool off/auto paired repeats (3 seeds) so the kernel's
#      0.11 short-horizon eval delta gets the SHIFT evidentiary standard
#   3. item 2: finish the 5-seed study (seeds 53/71) + the recipe-lever
#      probe (seed 23 with t_max=2000 — one long cosine vs 4 restarts)
#   4. item 5: the deadline-cut SHIFT=matmul trained-horizon pair
# All training runs pin the seed-table kernel numerics (select, byte
# masks, act16 off, pool off) exactly like tools/r5_queue_stage1.sh.
set -u
cd /root/repo
Q=/tmp/r6_queue_status.log
DEADLINE_EPOCH=${R6_DEADLINE_EPOCH:-0}

past_deadline() {
  [ "$DEADLINE_EPOCH" != "0" ] && [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]
}
note() { echo "$(date -u +%H:%M:%S) $*" >> "$Q"; }

note "r6 queue start (deadline=$DEADLINE_EPOCH)"

# 1. hidden-256 probe (default tier-0 pins; tile kernels parameterized)
if [ ! -s runs/bench_hidden256.json ]; then
  timeout 1800 python bench.py --hidden 256 \
    > runs/bench_hidden256.json 2> runs/bench_hidden256.log \
    && note "hidden-256 probe done" || note "hidden-256 probe FAILED"
fi

# 2. pool paired repeats: identical config, GT_TPU_POOL only difference
for s in 1 2 3; do
  past_deadline && { note "deadline before pool pair $s"; break; }
  for mode in off auto; do
    [ -s "runs/bench_pool_${mode}_s${s}.json" ] && continue
    GT_TPU_POOL=$mode timeout 1500 python bench.py --bench-seed "$s" \
      > "runs/bench_pool_${mode}_s${s}.json" \
      2> "runs/bench_pool_${mode}_s${s}.log" \
      && note "pool $mode seed $s done" || note "pool $mode seed $s FAILED"
  done
done

export GT_TPU_PROJ=off GT_TPU_SHIFT=select GT_TPU_FFN_PRNG=bytes \
       GT_TPU_FFN_ACT16=0 GT_TPU_SOFT_PREC=split2 GT_TPU_POOL=off

# 3a. remaining study seeds, whole-seed granularity
for s in 53 71; do
  past_deadline && { note "deadline before seed $s"; break; }
  timeout 3600 python -u tools/seed_study.py --seeds "$s" --epochs 2000 \
    --out runs/r5_seed_study --no-eval >> /tmp/r6_seed_study.log 2>&1 \
    && note "seed $s done" || note "seed $s FAILED/timeout"
done

# 3b. recipe-lever probe: best seed (23), one long cosine (t_max=2000)
if ! past_deadline; then
  mkdir -p runs/r6_tmax
  timeout 3600 python -m gt_pyg_tpu.cli train --csv \
    /root/reference/examples/data/train-set/expansion_log_data_train.csv \
    --endpoint LogD --epochs 2000 --bf16 --attn-impl tile --seed 23 \
    --avg-top-k 3 --t-max 2000 --log-every 100 \
    --out runs/r6_tmax/s23 >> /tmp/r6_tmax.log 2>&1 \
    && note "t_max=2000 probe done" || note "t_max probe FAILED/timeout"
fi

# 3b'. second recipe lever, one change per arm: EMA stream (decay 0.98
# per epoch ~ 0.999 per step at 18 steps/epoch), same seed 23
if ! past_deadline; then
  mkdir -p runs/r6_ema
  timeout 3600 python -m gt_pyg_tpu.cli train --csv \
    /root/reference/examples/data/train-set/expansion_log_data_train.csv \
    --endpoint LogD --epochs 2000 --bf16 --attn-impl tile --seed 23 \
    --avg-top-k 3 --ema 0.98 --log-every 100 \
    --out runs/r6_ema/s23 >> /tmp/r6_ema.log 2>&1 \
    && note "EMA probe done" || note "EMA probe FAILED/timeout"
fi

# 3c. evaluate everything trained so far (incremental summary.json)
timeout 3000 python -u tools/seed_study.py --seeds 11,23,37,53,71 \
  --out runs/r5_seed_study --eval-only >> /tmp/r6_seed_study.log 2>&1 \
  && note "seed-study eval done" || note "seed-study eval FAILED"
if [ -d runs/r6_tmax/s23 ]; then
  timeout 2000 python -u tools/seed_study.py --seeds 23 \
    --out runs/r6_tmax --eval-only >> /tmp/r6_tmax.log 2>&1 \
    && note "t_max eval done" || note "t_max eval FAILED"
fi
if [ -d runs/r6_ema/s23 ]; then
  timeout 2000 python -u tools/seed_study.py --seeds 23 \
    --out runs/r6_ema --eval-only >> /tmp/r6_ema.log 2>&1 \
    && note "EMA eval done" || note "EMA eval FAILED"
fi

# 4. SHIFT=matmul trained-horizon arms (select side = s11/s23 above)
for s in 11 23; do
  past_deadline && { note "deadline before matmul seed $s"; break; }
  GT_TPU_SHIFT=matmul timeout 3600 python -u tools/seed_study.py \
    --seeds "$s" --epochs 2000 --out runs/r6_shift_matmul --no-eval \
    >> /tmp/r6_shift_matmul.log 2>&1 \
    && note "matmul seed $s done" || note "matmul seed $s FAILED/timeout"
done
if [ -d runs/r6_shift_matmul ]; then
  timeout 2000 python -u tools/seed_study.py --seeds 11,23 \
    --out runs/r6_shift_matmul --eval-only >> /tmp/r6_shift_matmul.log 2>&1 \
    && note "matmul eval done" || note "matmul eval FAILED"
fi

note "r6 queue END"
