#!/usr/bin/env python
"""On-chip validation of the kernel-PRNG FFN dropout path (TPU only —
pltpu.prng_* has no CPU lowering, so this cannot run in the test suite).

Checks, at a production-like shape:
1. determinism: two forward calls with the same rng are bit-identical;
2. dropout fraction ≈ rate on each mask site (inferred from zeros in
   the hidden-activation contribution — checked via output variance
   against the bytes path's statistics);
3. fwd/bwd mask consistency: for a linear probe direction, the VJP must
   match finite differences of the kernel's own forward (same seeds) —
   an inconsistent backward mask shows up as O(rate) relative error;
4. distinct draws/blocks decorrelate (outputs differ across rngs).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import os

    os.environ["GT_TPU_FFN_PRNG"] = "kernel"
    import jax
    import jax.numpy as jnp

    from gt_pyg_tpu.ops.pallas.ffn import fused_ffn

    R, DIN, H = 4096, 128, 512
    rng = np.random.default_rng(0)
    xn = jnp.asarray(rng.normal(0, 1, (R, DIN)), jnp.bfloat16)
    w0 = jnp.asarray(rng.normal(0, 0.05, (DIN, H)), jnp.float32)
    b0 = jnp.zeros((H,), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 0.05, (H, H)), jnp.float32)
    b1 = jnp.zeros((H,), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.05, (H, DIN)), jnp.float32)
    b2 = jnp.zeros((DIN,), jnp.float32)
    key = jax.random.key(7, impl="rbg")

    def f(x, k):
        return fused_ffn(x, None, w0, b0, w1, b1, w2, b2, act="gelu",
                         dropout_rate=0.3, dropout_rng=k)

    jf = jax.jit(f)
    y1 = np.asarray(jf(xn, key), np.float32)
    y2 = np.asarray(jf(xn, key), np.float32)
    assert np.array_equal(y1, y2), "same-rng forward not deterministic"
    print("determinism: OK")

    y3 = np.asarray(jf(xn, jax.random.key(8, impl="rbg")), np.float32)
    assert not np.array_equal(y1, y3), "different rngs give same output"
    print("rng sensitivity: OK")

    # fwd/bwd consistency: directional derivative by finite differences
    # of the KERNEL's own forward vs its VJP, same seeds. Use f32 probe
    # scale large enough to survive bf16 inputs.
    def loss(x):
        return jnp.sum(f(x, key).astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))(xn)
    v = jnp.asarray(rng.normal(0, 1, (R, DIN)), jnp.bfloat16)
    eps = 0.05
    lp = float(jax.jit(loss)(xn + eps * v))
    lm = float(jax.jit(loss)(xn - eps * v))
    fd = (lp - lm) / (2 * eps)
    vjp_dir = float(jnp.sum(g.astype(jnp.float32)
                            * v.astype(jnp.float32)))
    rel = abs(fd - vjp_dir) / max(1.0, abs(fd))
    print(f"fd={fd:.1f} vjp={vjp_dir:.1f} rel={rel:.4f}")
    assert rel < 0.08, ("fwd/bwd dropout masks inconsistent "
                        f"(rel {rel:.4f}) — kprng blocking mismatch?")
    print("fwd/bwd consistency: OK")

    # dropout really drops ~rate: compare train-mode output count of
    # exact zeros in the pre-residual part — indirect: eval-vs-train
    # variance ratio sanity
    y_eval = np.asarray(jax.jit(
        lambda x: fused_ffn(x, None, w0, b0, w1, b1, w2, b2, act="gelu",
                            dropout_rate=0.0, dropout_rng=None))(xn),
        np.float32)
    delta_train = y1 - np.asarray(xn, np.float32)
    delta_eval = y_eval - np.asarray(xn, np.float32)
    frac_zero = float((delta_train == 0).mean())
    print(f"train-mode exact-zero fraction of FFN delta: {frac_zero:.3f}"
          f" (out-mask rate 0.3 expected ~0.3); eval zeros: "
          f"{float((delta_eval == 0).mean()):.3f}")
    assert 0.2 < frac_zero < 0.4, "output dropout fraction off"
    print("ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
