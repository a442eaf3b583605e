"""Component-level timing of the flagship train step on the live chip.

Decomposes the bench step (bench.py shapes: batch 2048, production
config, bf16, tile layout) into: attention-kernel-only, forward-only,
forward+backward, optimizer-only, and model variants (lax path, LN
norm, no dropout). Timing: min of two runs per probe (tunnel fetch
latency is fat-tailed, RESULTS.md).

Usage: python tools/microbench.py [probe ...]   (default: all)
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")

STEPS = 50


def timeit(fn, *args):
    # fn must return something fetchable to force the round trip
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(2):
        t0 = time.time()
        for _ in range(STEPS):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.time() - t0) / STEPS)
    return min(times) * 1000


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    import optax

    try:
        cur = jax.config.jax_platforms or ""
        if cur and "cpu" not in cur:
            jax.config.update("jax_platforms", cur + ",cpu")
    except Exception:
        pass

    from bench import build_batch, NUM_LAYERS
    from gt_pyg_tpu.nn import GraphTransformerNet
    from gt_pyg_tpu.train.losses import custom_loss
    from gt_pyg_tpu.train.trainer import init_on_host

    want = sys.argv[1:] or None
    results = {}

    def probe(name):
        def deco(f):
            if want is None or name in want:
                t0 = time.time()
                results[name] = round(f(), 2)
                print(f"# {name}: {results[name]} ms "
                      f"(probe total {time.time()-t0:.0f}s)",
                      file=sys.stderr, flush=True)
            return f
        return deco

    TILE_EDGES = 256
    batch_t = build_batch(2048, TILE_EDGES)
    batch_f = build_batch(2048, None)
    jb_t = jax.tree_util.tree_map(jnp.asarray, batch_t)
    jb_f = jax.tree_util.tree_map(jnp.asarray, batch_f)

    def make_model(attn_impl="tile", **kw):
        cfg = dict(node_dim_in=140, edge_dim_in=39, hidden_dim=128,
                   num_gt_layers=NUM_LAYERS, num_heads=8, dropout=0.3,
                   norm="bn", gate=True, gt_aggregators=("sum", "mean"),
                   aggregators=("sum", "mean", "max", "std"),
                   attn_impl=attn_impl, dtype=jnp.bfloat16)
        cfg.update(kw)
        return GraphTransformerNet(**cfg)

    loss_fn = functools.partial(custom_loss, w_rae=1.0, w_huber=0.25,
                                w_corr=0.25, w_tau=0.1, w_r2=0.1,
                                huber_delta=0.5, tau_temp=2.0)
    ts = jnp.ones((1,), jnp.float32)

    def build_step(model, jb, mode):
        """mode: 'step' (fwd+bwd+opt), 'grad' (fwd+bwd), 'fwd'."""
        variables = init_on_host(model, jb, jax.random.PRNGKey(0))
        tx = optax.chain(optax.clip_by_global_norm(5.0),
                         optax.adamw(1e-3, weight_decay=1e-5))
        opt0 = tx.init(variables["params"])
        p0, b0 = variables["params"], variables.get("batch_stats", {})

        def f(p, bs, rngs, rl):
            (pred, _), upd = model.apply(
                {"params": p, "batch_stats": bs}, jb,
                deterministic=False, rngs=rngs, mutable=["batch_stats"])
            pred = pred.astype(jnp.float32)
            valid = jb.y_mask * jnp.isfinite(jb.y).astype(jnp.float32)
            return loss_fn(pred, jb.y, valid, task_scale=ts,
                           rng=rl), upd["batch_stats"]

        if mode == "fwd":
            @jax.jit
            def run(p, bs, rng):
                rd, rr, rl = jax.random.split(rng, 3)
                loss, _ = f(p, bs, {"dropout": rd, "reparam": rr}, rl)
                return loss
            return lambda rng: run(p0, b0, rng)
        if mode == "grad":
            @jax.jit
            def run(p, bs, rng):
                rd, rr, rl = jax.random.split(rng, 3)
                (loss, nb), grads = jax.value_and_grad(
                    f, has_aux=True)(p, bs, {"dropout": rd,
                                             "reparam": rr}, rl)
                return loss, grads
            return lambda rng: run(p0, b0, rng)

        @jax.jit
        def run(p, bs, opt, rng):
            rd, rr, rl = jax.random.split(rng, 3)
            (loss, nb), grads = jax.value_and_grad(
                f, has_aux=True)(p, bs, {"dropout": rd, "reparam": rr},
                                 rl)
            updates, nopt = tx.update(grads, opt, p)
            return optax.apply_updates(p, updates), nb, nopt, loss
        state = [p0, b0, opt0]

        def stepper(rng):
            state[0], state[1], state[2], loss = run(
                state[0], state[1], state[2], rng)
            return loss
        return stepper

    rng = jax.random.key(0, impl="rbg")

    @probe("step_tile")
    def _():
        return timeit(build_step(make_model("tile"), jb_t, "step"), rng)

    @probe("grad_tile")
    def _():
        return timeit(build_step(make_model("tile"), jb_t, "grad"), rng)

    @probe("fwd_tile")
    def _():
        return timeit(build_step(make_model("tile"), jb_t, "fwd"), rng)

    @probe("step_lax")
    def _():
        return timeit(build_step(make_model("lax"), jb_f, "step"), rng)

    @probe("fwd_lax")
    def _():
        return timeit(build_step(make_model("lax"), jb_f, "fwd"), rng)

    # ---- attention kernel alone (NUM_LAYERS sequential calls at the
    # bench tile shapes, random weights/inputs)
    def kernel_probe(grad):
        from gt_pyg_tpu.ops.pallas.gt_tile import gt_attention_tile

        npad = int(jb_t.node_x.shape[0])
        ep = int(jb_t.edge_attr.shape[0])
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 8)
        mk = lambda i, shape: jax.random.normal(ks[i], shape, jnp.bfloat16)
        q = mk(0, (npad, 128))
        k_ = mk(1, (npad, 128))
        v = mk(2, (npad, 128))
        gate_n = mk(3, (npad, 128))
        e_bias = mk(4, (ep, 8))
        e_val = mk(5, (ep, 128))
        e_gate = mk(6, (ep, 8))

        def many(q, k_, v, gate_n, e_bias, e_val, e_gate):
            tot = 0.0
            x = q
            for _ in range(NUM_LAYERS):
                out, eij = gt_attention_tile(
                    x, k_, v, jb_t.edge_src, jb_t.edge_dst, 8,
                    TILE_EDGES, e_bias=e_bias, e_val=e_val,
                    gate_n=gate_n, e_gate_logits=e_gate,
                    aggregators=("sum", "mean"))
                x = out[:, :128].astype(jnp.bfloat16)
                tot = tot + jnp.sum(out.astype(jnp.float32)) \
                    + jnp.sum(eij.astype(jnp.float32))
            return tot

        if grad:
            fn = jax.jit(jax.grad(many, argnums=(0, 1, 2, 3, 4, 5, 6)))
        else:
            fn = jax.jit(many)
        return timeit(fn, q, k_, v, gate_n, e_bias, e_val, e_gate)

    @probe("kernel_tile_fwd")
    def _():
        return kernel_probe(False)

    @probe("kernel_tile_fwdbwd")
    def _():
        return kernel_probe(True)

    # ---- optimizer alone
    @probe("opt_only")
    def _():
        model = make_model("tile")
        variables = init_on_host(model, jb_t, jax.random.PRNGKey(0))
        tx = optax.chain(optax.clip_by_global_norm(5.0),
                         optax.adamw(1e-3, weight_decay=1e-5))
        p0 = variables["params"]
        opt0 = tx.init(p0)

        @jax.jit
        def run(p, opt):
            grads = jax.tree_util.tree_map(lambda x: x * 1e-4, p)
            updates, nopt = tx.update(grads, opt, p)
            return optax.apply_updates(p, updates), nopt
        return timeit(lambda: run(p0, opt0))

    # ---- variants
    @probe("step_tile_ln")
    def _():
        return timeit(build_step(make_model("tile", norm="ln"), jb_t,
                                 "step"), rng)

    @probe("step_tile_nodrop")
    def _():
        return timeit(build_step(make_model("tile", dropout=0.0), jb_t,
                                 "step"), rng)

    print(json.dumps(results))
