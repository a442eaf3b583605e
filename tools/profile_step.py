"""Where does the train step spend its time?

Builds the flagship bench step (tile or lax attention), prints the
compiled XLA cost analysis (FLOPs / bytes accessed / estimated roofline
times against v5e peaks), and optionally captures a jax.profiler trace.

Usage (repo root, live chip):
    python tools/profile_step.py [--attn-impl tile] [--trace /tmp/tb]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

V5E_BF16_PEAK = 1.97e14       # FLOP/s
V5E_HBM_BW = 8.19e11          # B/s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--attn-impl", default="tile", choices=["tile", "lax"])
    p.add_argument("--ffn-impl", default="auto",
                   choices=["auto", "fused", "xla"])
    p.add_argument("--batch-graphs", type=int, default=2048)
    p.add_argument("--tile-edges", type=int, default=256)
    p.add_argument("--tile-nodes", type=int, default=128)
    p.add_argument("--trace", default=None,
                   help="directory for a jax.profiler trace (5 steps)")
    p.add_argument("--steps", type=int, default=30)
    args = p.parse_args()

    import functools

    import jax
    import jax.numpy as jnp
    import optax

    try:
        cur = jax.config.jax_platforms or ""
        if cur and "cpu" not in cur:
            jax.config.update("jax_platforms", cur + ",cpu")
    except Exception:
        pass

    from bench import NUM_LAYERS, build_batch
    from gt_pyg_tpu.nn import GraphTransformerNet
    from gt_pyg_tpu.train.losses import custom_loss
    from gt_pyg_tpu.train.trainer import init_on_host

    tile_edges = args.tile_edges if args.attn_impl == "tile" else None
    batch = build_batch(args.batch_graphs, tile_edges,
                        tile_nodes=args.tile_nodes)
    model = GraphTransformerNet(
        node_dim_in=140, edge_dim_in=39, hidden_dim=128,
        num_gt_layers=NUM_LAYERS, num_heads=8, dropout=0.3, norm="bn",
        gate=True, gt_aggregators=("sum", "mean"),
        aggregators=("sum", "mean", "max", "std"),
        attn_impl=args.attn_impl, ffn_impl=args.ffn_impl,
        dtype=jnp.bfloat16)
    variables = init_on_host(model, batch, jax.random.PRNGKey(0))
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adamw(1e-3, weight_decay=1e-5))
    opt_state = tx.init(variables["params"])
    loss_fn = functools.partial(custom_loss, w_rae=1.0, w_huber=0.25,
                                w_corr=0.25, w_tau=0.1, w_r2=0.1,
                                huber_delta=0.5, tau_temp=2.0)
    task_scale = jnp.ones((1,), jnp.float32)

    @jax.jit
    def train_step(params, bstats, opt_state, batch, rng):
        rd, rr, rl = jax.random.split(rng, 3)

        def f(p):
            (pred, _), upd = model.apply(
                {"params": p, "batch_stats": bstats}, batch,
                deterministic=False, rngs={"dropout": rd, "reparam": rr},
                mutable=["batch_stats"])
            pred = pred.astype(jnp.float32)
            valid = batch.y_mask * jnp.isfinite(batch.y).astype(jnp.float32)
            return loss_fn(pred, batch.y, valid, task_scale=task_scale,
                           rng=rl), upd["batch_stats"]

        (loss, nb), grads = jax.value_and_grad(f, has_aux=True)(params)
        updates, no = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), nb, no, loss

    params, bstats = variables["params"], variables.get("batch_stats", {})
    rng = jax.random.key(0, impl="rbg")

    lowered = train_step.lower(params, bstats, opt_state, jb, rng)
    print("# compiling...", file=sys.stderr, flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"# compile {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    byts = ca.get("bytes accessed", float("nan"))
    print(f"XLA cost analysis [{args.attn_impl}]:")
    print(f"  flops/step          {flops:.3e}  "
          f"-> {flops / V5E_BF16_PEAK * 1e3:.2f} ms at bf16 peak")
    print(f"  bytes accessed/step {byts:.3e}  "
          f"-> {byts / V5E_HBM_BW * 1e3:.2f} ms at HBM peak")
    for k in sorted(ca):
        if k.startswith("bytes accessed") and k != "bytes accessed":
            print(f"  {k}: {ca[k]:.3e}")
    mem = compiled.memory_analysis()
    if mem is not None:
        for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                     "output_size_in_bytes"):
            v = getattr(mem, attr, None)
            if v is not None:
                print(f"  {attr}: {v/1e9:.3f} GB")

    # measured step time
    out = train_step(params, bstats, opt_state, jb, rng)
    jax.block_until_ready(out[3])
    t0 = time.time()
    params2, bstats2, opt2, loss = params, bstats, opt_state, None
    for i in range(args.steps):
        rng = jax.random.fold_in(rng, i)
        params2, bstats2, opt2, loss = train_step(params2, bstats2, opt2,
                                                  jb, rng)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / args.steps
    print(f"  measured: {dt*1e3:.1f} ms/step "
          f"({int(batch.num_edges) * NUM_LAYERS / dt / 1e6:.2f}M "
          f"edge-layer/s)")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for i in range(5):
                rng = jax.random.fold_in(rng, 1000 + i)
                params2, bstats2, opt2, loss = train_step(
                    params2, bstats2, opt2, jb, rng)
            jax.block_until_ready(loss)
        print(f"  trace written to {args.trace}")


if __name__ == "__main__":
    main()
