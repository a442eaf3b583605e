"""Sweep the fused tile kernel's tiles-per-step (G) on the live chip.

Times kernel-only fwd and fwd+bwd (bench shapes: batch 2048, te=256,
4 sequential layers) for a grid of (g_fwd, g_bwd) pairs. The kernel
derives g_bwd = tiles_per_step // 2, so the sweep drives the public
``tiles_per_step`` knob.

Usage: python tools/tune_tiles.py [G ...]   (default: 2 4 8 16 32)
"""

import json
import sys
import time

sys.path.insert(0, ".")

STEPS = 50

if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    try:
        cur = jax.config.jax_platforms or ""
        if cur and "cpu" not in cur:
            jax.config.update("jax_platforms", cur + ",cpu")
    except Exception:
        pass

    from bench import build_batch, NUM_LAYERS
    from gt_pyg_tpu.ops.pallas.gt_tile import gt_attention_tile

    TILE_EDGES = 256
    jb = jax.tree_util.tree_map(jnp.asarray, build_batch(2048, TILE_EDGES))
    npad = int(jb.node_x.shape[0])
    ep = int(jb.edge_attr.shape[0])
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

    def timeit(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        times = []
        for _ in range(2):
            t0 = time.time()
            for _ in range(STEPS):
                out = fn(*args)
            jax.block_until_ready(out)
            times.append((time.time() - t0) / STEPS)
        return round(min(times) * 1000, 2)

    def many(g, q, k_, v, gate_n, e_bias, e_val, e_gate):
        tot = 0.0
        x = q
        for _ in range(NUM_LAYERS):
            out, eij = gt_attention_tile(
                x, k_, v, jb.edge_src, jb.edge_dst, 8, TILE_EDGES,
                e_bias=e_bias, e_val=e_val, gate_n=gate_n,
                e_gate_logits=e_gate, aggregators=("sum", "mean"),
                tiles_per_step=g)
            x = out[:, :128].astype(jnp.bfloat16)
            tot = tot + jnp.sum(out.astype(jnp.float32)) \
                + jnp.sum(eij.astype(jnp.float32))
        return tot

    gs = [int(a) for a in sys.argv[1:]] or [2, 4, 8, 16, 32]
    results = {}
    for g in gs:
        import functools

        f = functools.partial(many, g)
        try:
            fwd = timeit(jax.jit(f), q, k_, v, gate_n, e_bias, e_val,
                         e_gate)
            bwd = timeit(jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4, 5,
                                                      6))),
                         q, k_, v, gate_n, e_bias, e_val, e_gate)
        except Exception as e:  # VMEM OOM at large G
            results[f"g{g}"] = {"error": str(e).split("\n")[0][:200]}
            print(f"# G={g}: failed ({type(e).__name__})",
                  file=sys.stderr, flush=True)
            continue
        results[f"g{g}"] = {"fwd_ms": fwd, "fwdbwd_ms": bwd}
        print(f"# G={g}: fwd {fwd} ms, fwd+bwd {bwd} ms",
              file=sys.stderr, flush=True)
    print(json.dumps(results))
