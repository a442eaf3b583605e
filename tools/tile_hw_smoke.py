#!/usr/bin/env python
"""Hardware smoke test for the fused tile kernel: compile + numerics vs
lax on the real chip, at small scale (fast compile)."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    try:
        cur = jax.config.jax_platforms or ""
        if cur and "cpu" not in cur:
            jax.config.update("jax_platforms", cur + ",cpu")
    except Exception:
        pass
    print("devices:", jax.devices(), flush=True)

    from gt_pyg_tpu.data import get_tensor_data, pad_graph_batch
    from gt_pyg_tpu.ops.attention import gt_attention

    TE = 384
    smiles = ["CCO", "c1ccccc1", "CC(=O)Nc1ccc(O)cc1",
              "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "c1ccc2ccccc2c1",
              "CCN(CC)CC", "C1CCCCC1", "c1ccncc1"] * 8
    graphs = get_tensor_data(smiles, [[1.0]] * len(smiles),
                             progress=False)
    batch = pad_graph_batch(graphs, tile_edges=TE)
    npad = batch.node_x.shape[0]
    ep = batch.edge_attr.shape[0]
    print(f"Np={npad} Ep={ep} tiles={npad // 128}", flush=True)

    hidden, heads = 128, 8
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    kw = dict(
        q=f(npad, hidden), k=f(npad, hidden), v=f(npad, hidden),
        edge_src=jnp.asarray(batch.edge_src),
        edge_dst=jnp.asarray(batch.edge_dst),
        num_heads=heads,
        e_bias=f(ep, heads), e_val=f(ep, hidden),
        gate_n=f(npad, hidden), e_gate_logits=f(ep, heads),
    )
    nmask = jnp.asarray(batch.node_mask)
    emask = jnp.asarray(batch.edge_mask)
    keys = list(kw.keys())

    def loss(diff, impl):
        full = dict(kw)
        full.update(diff)
        out, eij = gt_attention(
            **full, aggregators=("sum", "mean"), impl=impl,
            tile_edges=TE if impl == "tile" else None)
        return (jnp.sum((out * nmask[:, None]) ** 2)
                + jnp.sum((eij * emask[:, None]) ** 2))

    diff_keys = ("q", "k", "v", "gate_n", "e_bias", "e_val",
                 "e_gate_logits")
    diff = {kn: kw[kn] for kn in diff_keys}

    for impl in ("tile", "lax"):
        t0 = time.time()
        vg = jax.jit(jax.value_and_grad(lambda d: loss(d, impl)))
        val, grads = vg(diff)
        val = float(val)
        print(f"{impl}: compile+first {time.time()-t0:.1f}s "
              f"loss={val:.6g}", flush=True)
        if impl == "tile":
            v_t, g_t = val, grads
        else:
            v_l, g_l = val, grads

    rel = abs(v_t - v_l) / max(abs(v_l), 1e-9)
    print(f"loss rel diff: {rel:.3e}")
    ok = rel < 1e-3
    for kn in diff_keys:
        a, b = np.asarray(g_t[kn]), np.asarray(g_l[kn])
        d = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-9)
        print(f"grad {kn}: max rel diff {d:.3e}")
        ok = ok and d < 5e-3
    print("NUMERICS", "OK" if ok else "MISMATCH", flush=True)

    # timing (fwd+bwd), small scale
    import functools

    for impl in ("tile", "lax"):
        vg = jax.jit(jax.value_and_grad(
            functools.partial(lambda d, i: loss(d, i), i=impl)))
        val, grads = vg(diff)
        float(val)
        n = 50
        t0 = time.time()
        for _ in range(n):
            val, grads = vg(diff)
        float(val)
        print(f"{impl}: {1000 * (time.time() - t0) / n:.2f} ms/iter "
              f"(fwd+bwd small)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
