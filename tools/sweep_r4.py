#!/usr/bin/env python
"""Round-4 kernel-variant sweep on the flagship bench step.

One process, many traced variants: the GT_TPU_* knobs are read at TRACE
time, so setting os.environ between bench.measure() calls re-specializes
the kernels without paying a fresh process/runtime startup per variant.

Usage: python tools/sweep_r4.py [--steps N] [--only name1,name2]
Writes one JSON line per variant to stdout and /tmp/sweep_r4.jsonl.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE = {"GT_TPU_PROJ": "off", "GT_TPU_SHIFT": "select",
        "GT_TPU_FFN_ACT16": "0", "GT_TPU_SOFT_PREC": "split2",
        "GT_TPU_FFN_PRNG": "bytes"}

# Ordered by decision value: the full-v5 production candidate and the
# v4 re-baseline first (compiles on the tunnel can cost many minutes
# each; if the sweep is cut short the head of this list is what
# matters). The tail isolates the individual deltas and block sizes.
_V5 = {"GT_TPU_PROJ": "on", "GT_TPU_SHIFT": "matmul",
       "GT_TPU_FFN_ACT16": "1"}
VARIANTS = [
    # name, env overrides on BASE
    # v4_prod is bench.py's tier-0 default config after the round-4
    # proj verdict: v4 split path + matmul shift + in-core PRNG masks
    # + bf16 FFN activations
    ("v4_prod", {"GT_TPU_SHIFT": "matmul", "GT_TPU_FFN_PRNG": "kernel",
                 "GT_TPU_FFN_ACT16": "1"}),
    ("v4_act16", {"GT_TPU_SHIFT": "matmul", "GT_TPU_FFN_ACT16": "1"}),
    ("v5_kprng", dict(_V5, GT_TPU_FFN_PRNG="kernel")),
    ("v4_baseline", {}),
    ("v5_act16", dict(_V5)),
    ("v5_kprng_rb512", dict(_V5, GT_TPU_FFN_PRNG="kernel",
                            GT_TPU_FFN_RB="1024")),
    ("shift_matmul", {"GT_TPU_SHIFT": "matmul"}),
    ("v5_proj", {"GT_TPU_PROJ": "on", "GT_TPU_SHIFT": "matmul"}),
    ("v5_ffn_rb1024", dict(_V5, GT_TPU_FFN_RB="1024", GT_TPU_FFN_G="1")),
    ("v5_ffn_rb256g4", dict(_V5, GT_TPU_FFN_RB="256", GT_TPU_FFN_G="4")),
    ("v5_g16", dict(_V5, GT_TPU_TILES_G="16")),
    ("v5_g4", dict(_V5, GT_TPU_TILES_G="4")),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--only", default=None,
                   help="comma-separated variant names")
    p.add_argument("--out", default="/tmp/sweep_r4.jsonl")
    args = p.parse_args()

    import bench

    only = set(args.only.split(",")) if args.only else None
    results = []
    for name, overrides in VARIANTS:
        if only and name not in only:
            continue
        env = dict(BASE, **overrides)
        for k, v in env.items():
            os.environ[k] = v
        margs = argparse.Namespace(
            attn_impl="tile", ffn_impl="auto", norm_fold="auto",
            tile_edges=256, tile_pack="ffd", tile_nodes=128,
            steps=args.steps, warmup_steps=50)
        t0 = time.time()
        try:
            r = bench.measure(margs, args.batch)
            r["variant"] = name
            r["env"] = env
            r["wall_s"] = round(time.time() - t0, 1)
        except Exception as exc:  # keep sweeping past a broken variant
            r = {"variant": name, "env": env, "error": repr(exc)[:500],
                 "wall_s": round(time.time() - t0, 1)}
        line = json.dumps({k: r.get(k) for k in
                           ("variant", "step_time_ms", "edge_layer_per_s",
                            "mfu_vs_v5e_bf16_peak", "eval_loss_first",
                            "eval_loss_last", "compile_s", "wall_s",
                            "error")})
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(r, default=float) + "\n")
        results.append(r)
    return 0


if __name__ == "__main__":
    sys.exit(main())
