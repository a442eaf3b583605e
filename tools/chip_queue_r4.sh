#!/bin/bash
# Round-4 chip work queue — run unattended as soon as the TPU responds.
# Order: validate kprng -> kernel-variant sweep -> decorrelated ensemble
# retrain -> seed study. Each stage logs to /tmp/r4_<stage>.log and the
# queue stops on a stage failure (except the optional kprng check).
set -u
cd /root/repo
Q=/tmp/r4_queue_status.log
echo "$(date -u +%H:%M:%S) queue start" >> "$Q"

# 1. kprng validation (~3 min). Failure disables kprng for the rest.
KPRNG_OK=1
if ! timeout 1800 python tools/check_ffn_prng.py > /tmp/r4_kprng.log 2>&1; then
  KPRNG_OK=0
  echo "$(date -u +%H:%M:%S) kprng check FAILED (see /tmp/r4_kprng.log); pinning GT_TPU_FFN_PRNG=bytes" >> "$Q"
  export GT_TPU_FFN_PRNG=bytes
else
  echo "$(date -u +%H:%M:%S) kprng check OK" >> "$Q"
fi

# 2. kernel sweep (~40-90 min incl compiles)
if timeout 10800 python tools/sweep_r4.py --steps 100 > /tmp/r4_sweep.log 2>&1; then
  echo "$(date -u +%H:%M:%S) sweep done:" >> "$Q"
else
  echo "$(date -u +%H:%M:%S) sweep FAILED/timeout (see /tmp/r4_sweep.log)" >> "$Q"
fi
grep -h '"variant"' /tmp/sweep_r4.jsonl 2>/dev/null | python -c "
import json,sys
for l in sys.stdin:
    r=json.loads(l)
    print(' ', r.get('variant'), r.get('step_time_ms'), 'ms',
          r.get('mfu_vs_v5e_bf16_peak'), (r.get('error') or '')[:80])" >> "$Q" 2>/dev/null

# Pick the training config from the FASTEST converged variant measured
# on hardware (round-4 lesson: the v5 proj kernel compiled fine and was
# 36% slower — "worked" is not a selection criterion). Near-equal step
# times (within 3%) tie-break on eval_loss_last: a 1-2% speed win must
# not outrank a measurably better-converging variant (ADVICE r4 — the
# round-4 queue picked shift_matmul, eval 0.90, over v4_baseline, 0.81,
# for 0.7 ms).
eval "$(python - <<'PYEOF'
import json
best = None
try:
    for line in open("/tmp/sweep_r4.jsonl"):
        r = json.loads(line)
        if r.get("error") or not r.get("step_time_ms"):
            continue
        if r.get("eval_loss_last", 1e9) >= r.get("eval_loss_first", 0):
            continue                      # training-broken variant
        if best is None:
            best = r
        elif r["step_time_ms"] < best["step_time_ms"] * 0.97:
            best = r                      # clearly faster
        elif (r["step_time_ms"] < best["step_time_ms"] * 1.03
              and r.get("eval_loss_last", 1e9)
              < best.get("eval_loss_last", 1e9)):
            best = r                      # ~equal speed, converges better
except Exception:
    pass
if best is None:
    print("export GT_TPU_PROJ=off GT_TPU_SHIFT=select "
          "GT_TPU_FFN_PRNG=bytes GT_TPU_FFN_ACT16=0")
else:
    for k, v in (best.get("env") or {}).items():
        print(f"export {k}={v}")
PYEOF
)"
echo "$(date -u +%H:%M:%S) training env: PROJ=${GT_TPU_PROJ:-auto} FFN_PRNG=${GT_TPU_FFN_PRNG:-auto}" >> "$Q"

# 3. decorrelated 9-member ensemble retrain (~2-3 h).
# GT_TPU_FFN_PRNG pinned to bytes here: vmapping the kernel-PRNG path's
# SMEM seeds input is unproven; the byte-mask path is the known-good
# vmapped configuration and the ensemble is not perf-critical.
if GT_TPU_FFN_PRNG=bytes timeout 18000 python -u examples/multitask_ensemble.py --vmap --n-models 9 \
    --epochs 2000 --bf16 --eval-every 4 --out runs/mt_ens_vmap4 \
    --test-csv /root/reference/examples/data/test-set/expansion_data_test_full_lb_flag.csv \
    --n-boot 1000 > /tmp/mt_ens_vmap4.log 2>&1; then
  echo "$(date -u +%H:%M:%S) ensemble retrain done" >> "$Q"
else
  echo "$(date -u +%H:%M:%S) ensemble retrain FAILED/timeout" >> "$Q"
fi

# 4. seed study (~1.5-2 h)
if timeout 14400 python -u tools/seed_study.py > /tmp/r4_seeds.log 2>&1; then
  echo "$(date -u +%H:%M:%S) seed study done" >> "$Q"
else
  echo "$(date -u +%H:%M:%S) seed study FAILED/timeout" >> "$Q"
fi

echo "$(date -u +%H:%M:%S) queue END" >> "$Q"
