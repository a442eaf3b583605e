"""Gradient A/B: tile kernel vs lax attention at identical params.

Builds ONE tile-packed batch, one set of params, and computes
loss+grads through both attention implementations (the tile-packed
layout is a valid sorted-edge layout, so the lax path consumes it
directly). Prints per-leaf relative gradient differences and the
worst offenders — separating kernel-numerics bugs from optimization
dynamics in the NaN hunt.

Usage: python tools/diag_grad_ab.py [--dtype bf16] [--steps 1]
       [--dropout 0.0]
"""

import argparse
import functools
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--batch-graphs", type=int, default=2048)
    p.add_argument("--tile-edges", type=int, default=256)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        cur = jax.config.jax_platforms or ""
        if cur and "cpu" not in cur:
            jax.config.update("jax_platforms", cur + ",cpu")
    except Exception:
        pass

    from bench import build_batch
    from gt_pyg_tpu.nn import GraphTransformerNet
    from gt_pyg_tpu.train.losses import custom_loss
    from gt_pyg_tpu.train.trainer import init_on_host

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    batch = build_batch(args.batch_graphs, args.tile_edges)
    kw = dict(node_dim_in=140, edge_dim_in=39, hidden_dim=128,
              num_gt_layers=4, num_heads=8, dropout=args.dropout,
              norm="bn", gate=True, gt_aggregators=("sum", "mean"),
              aggregators=("sum", "mean", "max", "std"), dtype=dtype)
    m_tile = GraphTransformerNet(attn_impl="tile", **kw)
    m_lax = GraphTransformerNet(attn_impl="lax", **kw)
    variables = init_on_host(m_tile, batch, jax.random.PRNGKey(args.seed))
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    task_scale = jnp.ones((1,), jnp.float32)
    loss_fn = functools.partial(custom_loss, w_rae=1.0, w_huber=0.25,
                                w_corr=0.25, w_tau=0.1, w_r2=0.1,
                                huber_delta=0.5, tau_temp=2.0)

    def make_grad(model):
        @jax.jit
        def g(params, bstats, batch, rng):
            rd, rr, rl = jax.random.split(rng, 3)

            def f(p):
                (pred, _), upd = model.apply(
                    {"params": p, "batch_stats": bstats}, batch,
                    deterministic=args.dropout == 0.0,
                    rngs={"dropout": rd, "reparam": rr},
                    mutable=["batch_stats"])
                pred = pred.astype(jnp.float32)
                valid = batch.y_mask * jnp.isfinite(batch.y).astype(
                    jnp.float32)
                return loss_fn(pred, batch.y, valid,
                               task_scale=task_scale, rng=rl)

            return jax.value_and_grad(f)(params)
        return g

    params, bstats = variables["params"], variables.get("batch_stats", {})
    rng = jax.random.key(args.seed, impl="rbg")
    lt, gt_ = make_grad(m_tile)(params, bstats, jb, rng)
    ll, gl = make_grad(m_lax)(params, bstats, jb, rng)
    print(f"loss tile={float(lt):.6f} lax={float(ll):.6f}")

    rows = []
    for path, a in jax.tree_util.tree_leaves_with_path(gt_):
        b = functools.reduce(
            lambda d, k: d[k.key], path, gl)
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        nd = np.linalg.norm(a - b)
        rel = nd / (nb + 1e-12)
        name = "/".join(str(k.key) for k in path)
        rows.append((rel, na, nb, name,
                     bool(np.isfinite(a).all()),
                     bool(np.isfinite(b).all())))
    rows.sort(reverse=True)
    print(f"{'rel_diff':>10} {'|tile|':>12} {'|lax|':>12} "
          f"finite(t/l) name")
    for rel, na, nb, name, fa, fb in rows[:25]:
        print(f"{rel:10.4f} {na:12.4f} {nb:12.4f}   {fa}/{fb}   {name}")
    gn_t = np.sqrt(sum(r[1] ** 2 for r in rows))
    gn_l = np.sqrt(sum(r[2] ** 2 for r in rows))
    print(f"global grad norm: tile {gn_t:.4f}  lax {gn_l:.4f}")


if __name__ == "__main__":
    main()
