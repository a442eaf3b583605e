"""Benchmark: edges/s/chip on batched GraphTransformerNet fwd+bwd.

Runs the flagship production configuration (hidden 128 / 4 GT layers /
8 heads / bn+gate / multi-aggregators — train_logd.ipynb cells 2 & 6) on
one chip with a realistic molecular batch featurized from the OpenADMET
training CSV (synthetic fallback when absent), and measures the full
training step: forward + composite loss + backward + AdamW update.

Prints ONE JSON line:
  {"metric": "edge_layer_throughput_fwdbwd", "value": <edges*layers/s>,
   "unit": "edge-layer/s/chip", "vs_baseline": <value / A100-PyG est.>}

Flags: --attn-impl {tile,lax} selects the fused per-tile Pallas kernel
(tile-packed batch layout) vs the XLA reference path; --batch-graphs
sets the batch size; --sweep "1024,2048" measures several batch sizes
and reports the best. The JSON detail includes the model-FLOPs estimate
and MFU against the v5e bf16 peak.

Baseline denominator: the reference publishes no throughput numbers
(SURVEY.md §6), so the denominator is an ESTIMATE of this same model on
PyG/A100, pinned at 7.0e6 edge-layer/s. Derivation (fixed in round 2 —
the round-1 header quoted 9.3e6 FLOPs/edge-layer, which was the
per-EDGE cost, i.e. 4 layers conflated into one, and then took 2e7 as
an "optimistic top" that its own 6%-MFU arithmetic puts at 2e6):

  cost of this model  = 2.65e6 FLOPs per edge-layer, fwd+bwd
                        (analytic dense count below: 1.31e12 FLOPs/step
                         at 123,200 real edges x 4 layers)
  A100 PyG estimate   = 312e12 (bf16/TF32-AMP peak) x 6% MFU / 2.65e6
                      ~= 7.0e6 edge-layer/s

6% MFU is the generous top for gather/scatter GNNs at hidden=128 (PyG
molecular models are typically scatter-bound at 1-5%; note 7.0e6
edge-layer/s also equals PyG sustaining ~96% of the A100's entire f32
peak (19.5 TFLOP/s), the realistic no-AMP ceiling). It remains an
estimate, not a measurement — MFU vs the v5e bf16 peak is reported
alongside as the absolute metric, and the JSON carries
`vs_baseline_r1_denominator` (the round-1 2e7 figure) for cross-round
continuity.
"""

import argparse
import functools
import json
import os
import sys
import time

A100_PYG_EDGE_LAYER_PER_S = 7.0e6
A100_PYG_EDGE_LAYER_PER_S_R1 = 2.0e7  # round-1 denominator (see header)
V5E_BF16_PEAK_FLOPS = 1.97e14

NUM_LAYERS = 4
TIMED_STEPS = 100


def model_flops_fwd(npad, ep, bp, hidden=128, a_gt=2, a_pool=4,
                    num_layers=NUM_LAYERS, node_in=140, edge_in=39,
                    tasks=1):
    """Analytic dense-matmul FLOPs of one forward pass (MACs * 2).

    Counts the Linear layers only (the attention core's elementwise ops
    and pooling/readout are minor)."""
    ffn_n = max(hidden, 4 * hidden)
    ffn_e = max(hidden, 2 * hidden)
    per_layer_node = (4 * hidden * hidden              # Q K V gate
                      + a_gt * hidden * hidden         # WO
                      + hidden * ffn_n + ffn_n * ffn_n
                      + ffn_n * hidden)                # node FFN
    per_layer_edge = (hidden * hidden                  # WE_value
                      + 2 * hidden * 8                 # WE_logits, e_gate
                      + hidden * hidden                # WOe
                      + hidden * ffn_e + ffn_e * ffn_e
                      + ffn_e * hidden)                # edge FFN
    emb = npad * node_in * hidden + ep * edge_in * hidden
    head = bp * (a_pool * hidden) * hidden * 2         # mu + log_var
    total_macs = (emb + head
                  + num_layers * (npad * per_layer_node
                                  + ep * per_layer_edge))
    return 2 * total_macs


def build_batch(batch_graphs=2048, tile_edges=None, tile_pack="ffd",
                tile_nodes=128):
    """Featurize + pack the bench batch; cached on disk (featurizing 2k+
    molecules costs minutes and dominates ablation turnaround)."""
    import pickle
    from pathlib import Path

    # tile_nodes joined the cache key in round 5; the nt=128 key stays
    # unchanged so pre-existing caches (whose pickles lack the field,
    # defaulting to 128 on load) remain valid
    nt_tag = "" if tile_nodes == 128 else f"_nt{tile_nodes}"
    cache = Path(f"/tmp/gt_bench_batch_{batch_graphs}_{tile_edges}_"
                 f"{tile_pack}{nt_tag}.pkl")
    if cache.exists():
        try:
            with open(cache, "rb") as f:
                return pickle.load(f)
        except Exception:
            pass
    batch = _build_batch_uncached(batch_graphs, tile_edges, tile_pack,
                                  tile_nodes)
    try:
        with open(cache, "wb") as f:
            pickle.dump(batch, f)
    except OSError:
        pass
    return batch


def _build_batch_uncached(batch_graphs, tile_edges, tile_pack="ffd",
                          tile_nodes=128):
    from gt_pyg_tpu.data import get_tensor_data, pad_graph_batch

    csv = ("/root/reference/examples/data/train-set/"
           "expansion_log_data_train.csv")
    try:
        import pandas as pd

        df = pd.read_csv(csv)
        smiles = df["SMILES"].tolist()
        y = df[["LogD"]].values.tolist()
        if batch_graphs > len(smiles):
            mult = batch_graphs // len(smiles) + 1
            smiles, y = smiles * mult, y * mult
        smiles, y = smiles[:batch_graphs], y[:batch_graphs]
    except Exception:
        base = ["CCO", "c1ccccc1", "CC(=O)Nc1ccc(O)cc1",
                "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "c1ccc2ccccc2c1",
                "CCN(CC)CC", "C1CCCCC1", "c1ccncc1"]
        smiles = (base * (batch_graphs // len(base) + 1))[:batch_graphs]
        y = [[1.0]] * len(smiles)

    graphs = get_tensor_data(smiles, y, progress=False)
    if tile_edges:
        return pad_graph_batch(graphs, tile_edges=tile_edges,
                               graph_pad=batch_graphs,
                               tile_pack=tile_pack,
                               tile_nodes=tile_nodes)
    return pad_graph_batch(graphs, node_multiple=1024, edge_multiple=2048,
                           graph_pad=batch_graphs)


def measure(args, batch_graphs):
    import jax
    import jax.numpy as jnp
    import optax

    from gt_pyg_tpu.nn import GraphTransformerNet
    from gt_pyg_tpu.train.losses import custom_loss
    from gt_pyg_tpu.train.trainer import init_on_host

    t_setup = time.time()
    tile_edges = args.tile_edges if args.attn_impl == "tile" else None
    batch = build_batch(batch_graphs, tile_edges, args.tile_pack,
                        args.tile_nodes)
    real_edges = int(batch.num_edges)

    model = GraphTransformerNet(
        node_dim_in=140, edge_dim_in=39, hidden_dim=args.hidden,
        num_gt_layers=NUM_LAYERS, num_heads=8, dropout=0.3, norm="bn",
        gate=True, gt_aggregators=("sum", "mean"),
        aggregators=("sum", "mean", "max", "std"),
        attn_impl=args.attn_impl if args.attn_impl != "lax" else "lax",
        ffn_impl=args.ffn_impl,
        norm_fold=args.norm_fold,
        dtype=jnp.bfloat16,
    )
    variables = init_on_host(model, batch,
                             jax.random.PRNGKey(args.bench_seed))
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    # Linear LR warmup like the production recipe (train_logd.ipynb cell
    # 11 warms up over 25 epochs). Without it the step is a knife's edge:
    # at init log_var sits at its +10 clamp (std≈e^5), the sampled preds
    # all hit the ±100 loss clip, and whether lr=1e-3 escapes or digs in
    # was decided by bf16 fusion-level rounding (BENCH_r02's loss 7.2→85
    # was the dig-in branch; an identical-math program with different aux
    # outputs converged to 0.58 on the same rng stream).
    schedule = optax.join_schedules(
        [optax.linear_schedule(1e-5, 1e-3, args.warmup_steps),
         optax.constant_schedule(1e-3)], [args.warmup_steps])
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adamw(schedule, weight_decay=1e-5))
    opt_state = tx.init(variables["params"])
    task_scale = jnp.ones((1,), jnp.float32)

    loss_fn = functools.partial(custom_loss, w_rae=1.0, w_huber=0.25,
                                w_corr=0.25, w_tau=0.1, w_r2=0.1,
                                huber_delta=0.5, tau_temp=2.0)

    @jax.jit
    def train_step(params, bstats, opt_state, batch, rng):
        rd, rr, rl = jax.random.split(rng, 3)

        def f(p):
            (pred, _), upd = model.apply(
                {"params": p, "batch_stats": bstats}, batch,
                deterministic=False,
                rngs={"dropout": rd, "reparam": rr},
                mutable=["batch_stats"])
            pred = pred.astype(jnp.float32)
            valid = batch.y_mask * jnp.isfinite(batch.y).astype(jnp.float32)
            # pred stays in the aux and feeds `ok` below: keeping pred
            # live as a program output works around an XLA/TPU wrong-code
            # compile that folded the entire backward to EXACT ZEROS when
            # pred was dead after the loss (same math, same keys: gnorm
            # 2177 with pred kept vs 0.0 without — tools/diag_grads.py,
            # RESULTS.md round 3). Mirrors train/trainer.py.
            return loss_fn(pred, batch.y, valid, task_scale=task_scale,
                           rng=rl), (upd["batch_stats"], pred)

        (loss, (nb, pred)), grads = jax.value_and_grad(
            f, has_aux=True)(params)
        updates, no = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # production guard (train/trainer.py): skip the update on a
        # non-finite gradient so one bad step can't poison the params —
        # lr=1e-3 on a single repeated batch spikes occasionally
        ok = (jnp.isfinite(optax.global_norm(grads))
              & jnp.isfinite(pred).all())
        new_params, no, nb = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b),
            (new_params, no, nb), (params, opt_state, bstats))
        return new_params, nb, no, loss

    # Deterministic sanity loss (pred = mu, no dropout, batch-moment BN):
    # the TRAINING loss is spiky by construction — the variational readout
    # samples pred = mu + sigma*eps during training (reference
    # model.py:334-341), and on an occasional step an eps outlier times a
    # not-yet-shrunk sigma sends the R2/tau terms through the roof for that
    # single step (BENCH_r02 recorded such a step as loss_last=85.3 while
    # the trajectory around it sat at 0.6). The convergence check below
    # therefore uses this deterministic loss; per-step training losses are
    # recorded as the trajectory.
    @jax.jit
    def eval_loss(params, bstats, batch):
        pred, _ = model.apply(
            {"params": params, "batch_stats": bstats}, batch,
            deterministic=True, zero_var=True)
        pred = pred.astype(jnp.float32)
        valid = batch.y_mask * jnp.isfinite(batch.y).astype(jnp.float32)
        return loss_fn(pred, batch.y, valid, task_scale=task_scale,
                       rng=jax.random.key(0, impl="rbg"))

    params, bstats = variables["params"], variables.get("batch_stats", {})
    # rbg keys are the framework default: threefry key derivation measured
    # ~11 ms/step of the 62.5 ms flagship step on v5e (RESULTS.md)
    rng = jax.random.key(args.bench_seed, impl="rbg")
    eval_first = float(eval_loss(params, bstats, jb))

    print(f"# [{args.attn_impl} b={batch_graphs}] setup "
          f"{time.time()-t_setup:.1f}s; compiling...",
          file=sys.stderr, flush=True)
    t_c = time.time()
    params, bstats, opt_state, loss = train_step(params, bstats, opt_state,
                                                 jb, rng)
    loss_first = float(loss)
    t_compile = time.time() - t_c
    print(f"# compile+first {t_compile:.1f}s", file=sys.stderr, flush=True)

    def run_steps(n, params, bstats, opt_state, rng):
        t0 = time.time()
        losses = []  # device scalars; fetching deferred past the timer
        for i in range(n):
            rng = jax.random.fold_in(rng, i)
            params, bstats, opt_state, loss = train_step(
                params, bstats, opt_state, jb, rng)
            losses.append(loss)
        losses[-1].block_until_ready()
        dt = time.time() - t0
        return dt, losses, params, bstats, opt_state, rng

    # tunnel fetch latency is fat-tailed; time two long runs, take faster
    n = args.steps
    t_a, losses_a, params, bstats, opt_state, rng = run_steps(
        n, params, bstats, opt_state, rng)
    print(f"# run1 {n} steps: {t_a:.1f}s", file=sys.stderr, flush=True)
    t_b, losses_b, params, bstats, opt_state, rng = run_steps(
        n, params, bstats, opt_state, rng)
    print(f"# run2 {n} steps: {t_b:.1f}s", file=sys.stderr, flush=True)
    dt = min(t_a, t_b) / n

    import numpy as np
    traj = np.asarray([float(v) for v in losses_a + losses_b])
    eval_last = float(eval_loss(params, bstats, jb))
    converged = eval_last < eval_first
    if not converged:
        print(f"# WARNING: deterministic eval loss did not decrease "
              f"({eval_first:.4f} -> {eval_last:.4f}) — the measured "
              f"step may be training-broken", file=sys.stderr, flush=True)

    npad = int(batch.node_x.shape[0])
    ep = int(batch.edge_attr.shape[0])
    flops_step = 3 * model_flops_fwd(npad, ep, batch_graphs,
                                     hidden=args.hidden)
    return {
        "attn_impl": args.attn_impl,
        "ffn_impl": args.ffn_impl,
        "hidden": args.hidden,
        "batch_graphs": batch_graphs,
        "real_edges": real_edges,
        "real_nodes": int(batch.num_nodes),
        "padded_nodes": npad,
        "padded_edges": ep,
        "tile_edges": tile_edges,
        "tile_nodes": args.tile_nodes,
        "tile_pack": args.tile_pack,
        "step_time_ms": round(dt * 1000, 2),
        "edge_layer_per_s": real_edges * NUM_LAYERS / dt,
        "flops_per_step_est": flops_step,
        "mfu_vs_v5e_bf16_peak": round(
            flops_step / dt / V5E_BF16_PEAK_FLOPS, 4),
        "norm_fold": args.norm_fold,
        # kernel-mode env knobs that change numerics/step time: resolve
        # them here so the artifact is unambiguous about what produced it
        "soft_prec": os.environ.get("GT_TPU_SOFT_PREC", "split2"),
        "gelu_mode": os.environ.get("GT_TPU_GELU", "(default)"),
        "ffn_blocks": {"rb": os.environ.get("GT_TPU_FFN_RB", "(auto)"),
                       "g": os.environ.get("GT_TPU_FFN_G", "(auto)")},
        "proj_fuse": os.environ.get("GT_TPU_PROJ", "auto"),
        "shift_gather": os.environ.get("GT_TPU_SHIFT", "select"),
        "ffn_prng": os.environ.get("GT_TPU_FFN_PRNG", "auto"),
        "ffn_act16": os.environ.get("GT_TPU_FFN_ACT16", "1"),
        "tiles_g": os.environ.get("GT_TPU_TILES_G", "8"),
        "compile_s": round(t_compile, 1),
        "loss_first": loss_first,
        "loss_last": float(traj[-1]),
        "loss_traj": {"first": float(traj[0]), "min": float(traj.min()),
                      "max": float(traj.max()),
                      "median_last20": float(np.median(traj[-20:]))},
        "eval_loss_first": eval_first,
        "eval_loss_last": eval_last,
        "converged": bool(converged),
        "loss_note": ("training losses sample the variational readout "
                      "(pred = mu + sigma*eps) and single steps spike by "
                      "design; eval_loss_* is the deterministic (zero_var, "
                      "eval-mode) convergence check"),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bench-seed", type=int, default=0,
                   help="init + rng-stream seed; non-zero values are "
                        "for repeated paired A/Bs (e.g. the pool "
                        "kernel's off/auto eval-delta repeats)")
    p.add_argument("--hidden", type=int, default=128,
                   help="model hidden dim; non-default values are for "
                        "MFU-scaling probes (the hidden-128 per-op "
                        "multiplier theory: if MFU ~doubles at 256, the "
                        "multiplier is the cost of narrow matmuls)")
    p.add_argument("--attn-impl", default="tile",
                   choices=["tile", "lax", "pallas"])
    p.add_argument("--ffn-impl", default="auto",
                   choices=["auto", "fused", "xla"])
    p.add_argument("--norm-fold", default="auto",
                   choices=["auto", "on", "off"])
    p.add_argument("--batch-graphs", type=int, default=2048)
    # tier-0 layout = the round-5 sweep winner (runs/sweep_r5.jsonl):
    # nt256/te512 multi-graph node tiles + FFN RB=1024 measured 42.60 ms
    # vs 44.37 ms for the all-default nt128 config, with the best
    # 200-step deterministic eval of the swept configs (0.852); the
    # sweep's shift=matmul row is 0.26 ms faster but converges worse
    # (0.931) and stays opt-in — see _shift_gather_mode.
    p.add_argument("--tile-edges", type=int, default=512)
    p.add_argument("--tile-nodes", type=int, default=256,
                   help="node rows per tile (128 = lane width; 256 = "
                        "multi-graph node tiles: ~half the kernel "
                        "issues at 2x the one-hot incidence FLOPs)")
    p.add_argument("--tile-pack", default="ffd",
                   choices=["ffd", "nextfit"])
    p.add_argument("--steps", type=int, default=TIMED_STEPS)
    p.add_argument("--warmup-steps", type=int, default=50,
                   help="linear LR warmup steps (the production recipe "
                        "warms up over 25 epochs; 0 disables)")
    p.add_argument("--sweep", default=None,
                   help="comma-separated batch sizes; report the best")
    args = p.parse_args()

    import jax

    # NOTE: jax persistent compilation cache is intentionally NOT enabled
    # here — it stalls under the axon remote-compile path.
    # Expose the cpu backend next to the accelerator so un-jitted
    # model.init runs on the host (seconds instead of minutes of remote
    # op-by-op dispatch).
    try:
        cur = jax.config.jax_platforms or ""
        if cur and "cpu" not in cur:
            jax.config.update("jax_platforms", cur + ",cpu")
    except Exception:
        pass

    sizes = ([int(s) for s in args.sweep.split(",")] if args.sweep
             else [args.batch_graphs])

    # tier-0 FFN row block = the sweep winner (ffn_rb1024, 42.60 ms);
    # bench-local so training recipes keep the library default (the
    # kernel-PRNG mask placement is blocking-dependent, so a library
    # default change would silently alter training mask streams)
    os.environ.setdefault("GT_TPU_FFN_RB", "1024")

    # Safety ladder for unattended (driver) runs: if the fastest kernel
    # configuration fails to compile/execute on this toolchain, step
    # down to progressively more conservative env pins instead of dying
    # — tier 1 disables the v5 projection fusion + hardware-PRNG masks +
    # the pooling-moments kernel, tier 2 additionally pins the v4-exact
    # shift/activation paths and the round-4 nt128 tile layout.
    tiers = [
        ({}, {}),
        ({"GT_TPU_PROJ": "off", "GT_TPU_FFN_PRNG": "bytes",
          "GT_TPU_POOL": "off"}, {}),
        ({"GT_TPU_PROJ": "off", "GT_TPU_FFN_PRNG": "bytes",
          "GT_TPU_POOL": "off", "GT_TPU_SHIFT": "select",
          "GT_TPU_FFN_ACT16": "0", "GT_TPU_FFN_RB": "512"},
         {"tile_edges": 256, "tile_nodes": 128}),
    ]

    # every env key any tier may pin — snapshot/restored per call so a
    # fallback at sweep size N does not leak conservative pins into
    # size N+1's tier-0 attempt (which would then silently measure the
    # conservative config while reporting no fallback_tier)
    _tier_keys = sorted({k for pins, _ in tiers for k in pins})

    def measure_safe(b):
        import copy

        env_snapshot = {k: os.environ.get(k) for k in _tier_keys}
        last_exc = None
        for i, (pins, arg_pins) in enumerate(tiers):
            for k, snap_v in env_snapshot.items():
                if snap_v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = snap_v
            for k, v in pins.items():
                os.environ[k] = v
            targs = args
            if arg_pins:
                targs = copy.copy(args)
                for k, v in arg_pins.items():
                    setattr(targs, k, v)
            try:
                r = measure(targs, b)
                if i:
                    r["fallback_tier"] = i
                    r["fallback_pins"] = {**pins, **arg_pins}
                    print(f"# NOTE: fell back to kernel tier {i} "
                          f"({pins}, {arg_pins})", file=sys.stderr,
                          flush=True)
                return r
            except Exception as exc:  # compile/runtime failure
                last_exc = exc
                print(f"# kernel tier {i} failed: {repr(exc)[:300]}",
                      file=sys.stderr, flush=True)
        raise last_exc

    runs = [measure_safe(b) for b in sizes]
    best = max(runs, key=lambda r: r["edge_layer_per_s"])

    result = {
        "metric": "edge_layer_throughput_fwdbwd",
        "value": round(best["edge_layer_per_s"], 1),
        "unit": "edge-layer/s/chip",
        "vs_baseline": round(
            best["edge_layer_per_s"] / A100_PYG_EDGE_LAYER_PER_S, 3),
        "detail": {
            **best,
            "num_gt_layers": NUM_LAYERS,
            "device": str(jax.devices()[0]),
            "dtype": "bfloat16",
            "prng": "rbg",
            "baseline_note": ("A100-PyG denominator 7.0e6 edge-layer/s is "
                              "a derived estimate (see bench.py header); "
                              "MFU is the absolute metric"),
            "vs_baseline_r1_denominator": round(
                best["edge_layer_per_s"] / A100_PYG_EDGE_LAYER_PER_S_R1, 3),
            "sweep": ([{k: r[k] for k in ("batch_graphs", "step_time_ms",
                                          "edge_layer_per_s",
                                          "mfu_vs_v5e_bf16_peak")}
                       for r in runs] if len(runs) > 1 else None),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
