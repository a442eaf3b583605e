#!/usr/bin/env python
"""Round-5 layout sweep on the flagship bench step.

The round-4 roofline (RESULTS.md "Round 4") pinned the 43 ms operating
point on MXU issue latency and named ONE remaining lever class:
multi-graph node tiles — larger (TE, NT) tiles so each grid step issues
fewer, larger incidence matmuls. Per-edge incidence FLOPs scale with NT
(the one-hot [TE, NT] row is NT wide), so nt=256 doubles the structural
FLOP tax while halving the tile count; whether that trade pays on an
issue-bound step is exactly what this sweep measures. Also re-measures
the v5+kernel-PRNG rows that died on the pre-fix Mosaic seed limit
(VERDICT r4 item 6) and certifies the new all-default tier-0 config
(SHIFT=select after the round-5 default revert).

Usage: python tools/sweep_r5.py [--steps N] [--only name1,name2]
Writes one JSON line per variant to stdout and runs/sweep_r5.jsonl.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Explicit pins for every numerics-affecting knob (auto defaults after
# the round-5 SHIFT revert: select / kernel-PRNG / act16 / proj-off).
BASE = {"GT_TPU_PROJ": "off", "GT_TPU_SHIFT": "select",
        "GT_TPU_FFN_ACT16": "1", "GT_TPU_SOFT_PREC": "split2",
        "GT_TPU_FFN_PRNG": "kernel"}

_V5 = {"GT_TPU_PROJ": "on", "GT_TPU_FFN_ACT16": "1"}

# name, env overrides on BASE, layout (tile_edges, tile_nodes)
VARIANTS = [
    # the all-default tier-0 config post-revert (= BASE, nt=128):
    # certifies what an env-less `python bench.py` measures
    ("r5_default_nt128", {}, (256, 128)),
    # the layout experiment: 2x graphs per tile, half the grid steps
    ("nt256", {}, (512, 256)),
    ("nt256_g4", {"GT_TPU_TILES_G": "4"}, (512, 256)),
    ("nt256_g1", {"GT_TPU_TILES_G": "1"}, (512, 256)),
    # 4x: one [1024, 512] tile-pair per ~8 graphs
    ("nt512", {}, (1024, 512)),
    # matmul shift on the winning layout (pure speed row; the trained
    # A/B decides the default)
    ("nt256_shiftmm", {"GT_TPU_SHIFT": "matmul"}, (512, 256)),
    # VERDICT item 6: the two sweep-hole rows, post-PRNG-seed-fix
    ("v5_kprng", dict(_V5), (256, 128)),
    ("v5_kprng_rb1024", dict(_V5, GT_TPU_FFN_RB="1024"), (256, 128)),
    # round-5 trace finding: the fused FFN kernels are ~40% of the step
    # at 7-10x their rooflines while profiling "Compute"-bound — probe
    # the block-serialization hypothesis on the v4 path (round 4 only
    # swept RB under the demoted v5 config)
    ("ffn_rb1024", {"GT_TPU_FFN_RB": "1024"}, (512, 256)),
    ("ffn_rb2048", {"GT_TPU_FFN_RB": "2048"}, (512, 256)),
    ("ffn_rb1024_bytes", {"GT_TPU_FFN_RB": "1024",
                          "GT_TPU_FFN_PRNG": "bytes"}, (512, 256)),
    ("ffn_g4", {"GT_TPU_FFN_G": "4"}, (512, 256)),
    ("ffn_g8_rb256", {"GT_TPU_FFN_G": "8", "GT_TPU_FFN_RB": "256"},
     (512, 256)),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--only", default=None,
                   help="comma-separated variant names")
    p.add_argument("--out", default="runs/sweep_r5.jsonl")
    args = p.parse_args()

    import bench

    only = set(args.only.split(",")) if args.only else None
    for name, overrides, (te, nt) in VARIANTS:
        if only and name not in only:
            continue
        env = dict(BASE, **overrides)
        for k in ("GT_TPU_TILES_G", "GT_TPU_FFN_RB"):
            os.environ.pop(k, None)
        for k, v in env.items():
            os.environ[k] = v
        margs = argparse.Namespace(
            attn_impl="tile", ffn_impl="auto", norm_fold="auto",
            tile_edges=te, tile_nodes=nt, tile_pack="ffd",
            steps=args.steps, warmup_steps=50)
        t0 = time.time()
        try:
            r = bench.measure(margs, args.batch)
            r["variant"] = name
            r["env"] = env
            r["wall_s"] = round(time.time() - t0, 1)
        except Exception as exc:  # keep sweeping past a broken variant
            r = {"variant": name, "env": env, "tile_edges": te,
                 "tile_nodes": nt, "error": repr(exc)[:500],
                 "wall_s": round(time.time() - t0, 1)}
        line = json.dumps({k: r.get(k) for k in
                           ("variant", "tile_edges", "tile_nodes",
                            "step_time_ms", "edge_layer_per_s",
                            "mfu_vs_v5e_bf16_peak", "eval_loss_first",
                            "eval_loss_last", "compile_s", "wall_s",
                            "error")})
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(r, default=float) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
