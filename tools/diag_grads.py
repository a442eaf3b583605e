"""Locate non-finite gradient leaves in the flagship bench train step.

Computes value_and_grad of the exact bench loss at the INIT params for
several rng keys and prints, per param leaf, how many keys produced a
non-finite gradient — localizing the bf16 overflow that freezes the
bench step (params never update because the NaN-guard skips every step).

Usage: python tools/diag_grads.py [--keys 8] [--attn-impl tile] ...
"""

import argparse
import functools
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--attn-impl", default="tile", choices=["tile", "lax"])
    p.add_argument("--ffn-impl", default="auto",
                   choices=["auto", "fused", "xla"])
    p.add_argument("--batch-graphs", type=int, default=2048)
    p.add_argument("--tile-edges", type=int, default=256)
    p.add_argument("--norm-fold", default="auto",
                   choices=["auto", "on", "off"])
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--keys", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

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
    batch = build_batch(args.batch_graphs, tile_edges)
    model = GraphTransformerNet(
        node_dim_in=140, edge_dim_in=39, hidden_dim=128,
        num_gt_layers=NUM_LAYERS, num_heads=8, dropout=0.3, norm="bn",
        gate=True, gt_aggregators=("sum", "mean"),
        aggregators=("sum", "mean", "max", "std"),
        attn_impl=args.attn_impl, ffn_impl=args.ffn_impl,
        norm_fold=args.norm_fold,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32)
    variables = init_on_host(model, batch, jax.random.PRNGKey(0))
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    task_scale = jnp.ones((1,), jnp.float32)
    loss_fn = functools.partial(custom_loss, w_rae=1.0, w_huber=0.25,
                                w_corr=0.25, w_tau=0.1, w_r2=0.1,
                                huber_delta=0.5, tau_temp=2.0)

    @jax.jit
    def grad_stats(params, bstats, batch, rng):
        rd, rr, rl = jax.random.split(rng, 3)

        def f(p):
            (pred, _), upd = model.apply(
                {"params": p, "batch_stats": bstats}, batch,
                deterministic=False, rngs={"dropout": rd, "reparam": rr},
                mutable=["batch_stats"])
            pred = pred.astype(jnp.float32)
            valid = batch.y_mask * jnp.isfinite(batch.y).astype(jnp.float32)
            return loss_fn(pred, batch.y, valid, task_scale=task_scale,
                           rng=rl), (upd["batch_stats"], pred)

        (loss, (_, pred)), grads = jax.value_and_grad(
            f, has_aux=True)(params)
        interior = (jnp.abs(pred) < 100.0).sum()
        finite = jax.tree_util.tree_map(
            lambda g: jnp.isfinite(g).all(), grads)
        amax = jax.tree_util.tree_map(
            lambda g: jnp.abs(g).max(), grads)
        import optax
        return loss, finite, amax, optax.global_norm(grads), interior

    params, bstats = variables["params"], variables.get("batch_stats", {})
    base = jax.random.key(0, impl="rbg")

    bad_count = None
    max_amax = None
    n_bad_keys = 0
    for i in range(args.keys):
        rng = jax.random.fold_in(base, i)
        loss, finite, amax, gn, interior = grad_stats(params, bstats, jb,
                                                      rng)
        flat_f = jax.tree_util.tree_leaves_with_path(finite)
        n_bad = sum(int(not bool(v)) for _, v in flat_f)
        if n_bad:
            n_bad_keys += 1
        n_zero = sum(int(float(a) == 0.0) for _, a in
                     jax.tree_util.tree_leaves_with_path(amax))
        print(f"key {i}: loss {float(loss):8.4f}  gnorm {float(gn):12.4g} "
              f"nonfinite {n_bad}/{len(flat_f)} zero {n_zero} "
              f"pred_interior {int(interior)}", flush=True)
        if bad_count is None:
            bad_count = {jax.tree_util.keystr(kp): 0 for kp, _ in flat_f}
            max_amax = {jax.tree_util.keystr(kp): 0.0 for kp, _ in flat_f}
        for (kp, v), (_, a) in zip(flat_f,
                                   jax.tree_util.tree_leaves_with_path(amax)):
            ks = jax.tree_util.keystr(kp)
            if not bool(v):
                bad_count[ks] += 1
            max_amax[ks] = max(max_amax[ks], float(a))

    print(f"\n{n_bad_keys}/{args.keys} keys had non-finite grads")
    print("\nleaves by non-finite count (top 30):")
    for ks, c in sorted(bad_count.items(), key=lambda kv: -kv[1])[:30]:
        if c or max_amax[ks] > 1e4:
            print(f"  {c:3d}/{args.keys}  |g|max {max_amax[ks]:12.4g}  {ks}")


if __name__ == "__main__":
    main()
