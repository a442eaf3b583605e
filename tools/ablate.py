"""Variant ablation for the flagship train step on the live chip.

Timing: min of two 100-step runs per variant (tunnel fetch latency is
fat-tailed — slope methods and single runs are unreliable; see
RESULTS.md). Keys use the rbg default (the recorded threefry-keyed
ablation table in RESULTS.md predates the rbg switch and sits ~11 ms
higher per full step). Run from the repo root:
``python tools/ablate.py``.
"""

import sys
import time

sys.path.insert(0, ".")

if __name__ == "__main__":
    import jax, jax.numpy as jnp, optax
    from bench import build_batch, NUM_LAYERS
    from gt_pyg_tpu.nn import GraphTransformerNet
    from gt_pyg_tpu.train.losses import custom_loss, mae_loss
    from gt_pyg_tpu.train.trainer import init_on_host
    try:
        cur = jax.config.jax_platforms or ""
        if cur and "cpu" not in cur:
            jax.config.update("jax_platforms", cur + ",cpu")
    except Exception: pass

    batch = build_batch()
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    E = int(batch.num_edges)

    def make(**kw):
        cfg = dict(node_dim_in=140, edge_dim_in=39, hidden_dim=128,
                   num_gt_layers=NUM_LAYERS, num_heads=8, dropout=0.3,
                   norm="bn", gate=True, gt_aggregators=("sum","mean"),
                   aggregators=("sum","mean","max","std"), dtype=jnp.bfloat16)
        cfg.update(kw)
        return GraphTransformerNet(**cfg)

    def loss_of(pred, kind, rl):
        valid = jb.y_mask * jnp.isfinite(jb.y).astype(jnp.float32)
        p = pred.astype(jnp.float32)
        if kind == "mae":
            return mae_loss(p, jb.y, valid)
        return custom_loss(p, jb.y, valid, w_rae=1.0, w_huber=0.25,
                           w_corr=0.25, w_tau=(0.1 if kind=="composite" else 0.0),
                           w_r2=0.1, huber_delta=0.5, tau_temp=2.0,
                           task_scale=jnp.ones((1,)), rng=rl)

    def build(model, kind, grad=True):
        variables = init_on_host(model, batch, jax.random.PRNGKey(0))
        tx = optax.adamw(1e-3)
        opt0 = tx.init(variables["params"])
        @jax.jit
        def step(st, rng):
            p, bs, opt = st
            rngs = {"dropout": rng, "reparam": rng}
            def f(pp):
                (pred, _), upd = model.apply({"params": pp, "batch_stats": bs},
                    jb, deterministic=False, rngs=rngs, mutable=["batch_stats"])
                return loss_of(pred, kind, jax.random.PRNGKey(0)), upd["batch_stats"]
            if grad:
                (l, nb), g = jax.value_and_grad(f, has_aux=True)(p)
                u, no = tx.update(g, opt, p)
                return (optax.apply_updates(p, u), nb, no)
            l, nb = f(p)
            return (jax.tree_util.tree_map(lambda x: x + 0.0*l.astype(x.dtype), p), nb, opt)
        st = (variables["params"], variables.get("batch_stats", {}), opt0)
        st = step(st, jax.random.key(999, impl="rbg"))
        _ = float(jax.tree_util.tree_leaves(st)[0].ravel()[0])
        return step, st

    def timeit(step, st, n=100):
        best = None
        for _ in range(2):
            t0 = time.time()
            for i in range(n):
                st = step(st, jax.random.key(i, impl="rbg"))
            _ = float(jax.tree_util.tree_leaves(st)[0].ravel()[0])
            dt = (time.time()-t0)/n
            best = dt if best is None else min(best, dt)
        return best

    for name, mkw, kind, grad in [
        ("full", {}, "composite", True),
        ("fwd_only", {}, "composite", False),
        ("no_kendall", {}, "no_tau", True),
        ("mae_loss", {}, "mae", True),
        ("ln_nogate_sum", {"norm":"ln","gate":False,
                           "gt_aggregators":("sum",),
                           "aggregators":("sum",)}, "composite", True),
    ]:
        t0 = time.time()
        try:
            step, st = build(make(**mkw), kind, grad)
            dt = timeit(step, st)
            print(f"{name}: {dt*1000:.1f} ms/step ({E*NUM_LAYERS/dt/1e6:.1f}M e-l/s) [compile {time.time()-t0:.0f}s]", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:150]}", flush=True)
