"""Ablation benchmark: where does the train-step time go?

Variants compiled sequentially in one process, each slope-timed
(t(N2)-t(N1))/(N2-N1) with value fetches forcing completion.
"""

import sys
import time

import numpy as np


def slope_time(fn, state, n1=3, n2=13):
    def run(n, st):
        t0 = time.time()
        for i in range(n):
            st = fn(st, i)
        # force completion
        val = float(jax.tree_util.tree_leaves(st)[0].ravel()[0])
        return time.time() - t0, st

    t_a, state = run(n1, state)
    t_b, state = run(n2, state)
    return (t_b - t_a) / (n2 - n1), state


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    import optax

    from bench import build_batch, NUM_LAYERS
    from gt_pyg_tpu.nn import GraphTransformerNet
    from gt_pyg_tpu.train.losses import custom_loss, mae_loss

    batch = build_batch()
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    real_edges = int(batch.num_edges)
    print(f"# edges={real_edges}", file=sys.stderr, flush=True)

    def make_model(**kw):
        cfg = dict(node_dim_in=140, edge_dim_in=39, hidden_dim=128,
                   num_gt_layers=NUM_LAYERS, num_heads=8, dropout=0.3,
                   norm="bn", gate=True, gt_aggregators=("sum", "mean"),
                   aggregators=("sum", "mean", "max", "std"),
                   dtype=jnp.bfloat16)
        cfg.update(kw)
        return GraphTransformerNet(**cfg)

    def build_step(model, loss_kind="composite", fwd_only=False):
        variables = model.init({"params": jax.random.PRNGKey(0)}, jb,
                               deterministic=True)
        tx = optax.adamw(1e-3)
        opt0 = tx.init(variables["params"])

        def loss_of(pred, rl):
            valid = jb.y_mask * jnp.isfinite(jb.y).astype(jnp.float32)
            pred = pred.astype(jnp.float32)
            if loss_kind == "mae":
                return mae_loss(pred, jb.y, valid)
            return custom_loss(pred, jb.y, valid, w_rae=1.0, w_huber=0.25,
                               w_corr=0.25, w_tau=0.1, w_r2=0.1,
                               huber_delta=0.5, tau_temp=2.0,
                               task_scale=jnp.ones((1,)), rng=rl)

        if fwd_only:
            @jax.jit
            def step(st, rng):
                params, bstats = st
                (pred, _), upd = model.apply(
                    {"params": params, "batch_stats": bstats}, jb,
                    deterministic=False,
                    rngs={"dropout": rng, "reparam": rng},
                    mutable=["batch_stats"])
                l = loss_of(pred, rng)
                return (jax.tree_util.tree_map(
                    lambda p: p + 0.0 * l.astype(p.dtype), params),
                    upd["batch_stats"])

            st0 = (variables["params"], variables.get("batch_stats", {}))
        else:
            @jax.jit
            def step(st, rng):
                params, bstats, opt = st

                def f(p):
                    (pred, _), upd = model.apply(
                        {"params": p, "batch_stats": bstats}, jb,
                        deterministic=False,
                        rngs={"dropout": rng, "reparam": rng},
                        mutable=["batch_stats"])
                    return loss_of(pred, rng), upd["batch_stats"]

                (l, nb), g = jax.value_and_grad(f, has_aux=True)(params)
                u, no = tx.update(g, opt, params)
                return (optax.apply_updates(params, u), nb, no)

            st0 = (variables["params"], variables.get("batch_stats", {}),
                   opt0)

        def wrapped(st, i):
            return step(st, jax.random.PRNGKey(i))

        # warm up: compile + first execution complete before timing
        st0 = wrapped(st0, 999)
        _ = float(jax.tree_util.tree_leaves(st0)[0].ravel()[0])
        return wrapped, st0

    variants = [
        ("full_lax", dict(), "composite", False),
        ("full_pallas", dict(attn_impl="pallas", max_in_degree=8),
         "composite", False),
        ("fwd_only_lax", dict(), "composite", True),
        ("fwd_only_pallas", dict(attn_impl="pallas", max_in_degree=8),
         "composite", True),
    ]
    for name, mkw, lk, fo in variants:
        t0 = time.time()
        try:
            fn, st = build_step(make_model(**mkw), lk, fo)
            dt, _ = slope_time(fn, st)
            print(f"{name}: {dt*1000:.1f} ms/step "
                  f"({real_edges*NUM_LAYERS/dt/1e6:.1f}M edge-layer/s) "
                  f"[compile {time.time()-t0:.0f}s]", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
