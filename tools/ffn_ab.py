"""Micro A/B of the fused FFN kernel: where does its time go?

Times fwd and fwd+bwd of gt_pyg_tpu.ops.pallas.ffn.fused_ffn at the
flagship node-FFN shape ([R,128]->512->512->[R,128]) and edge-FFN shape
(hidden 256) under different activations / row blocks, isolating
transcendental cost (gelu vs relu) from matmul/HBM cost.

Usage: python tools/ffn_ab.py [R]
"""

import sys
import time

sys.path.insert(0, ".")

STEPS = 50


def timeit(fn, *args):
    import jax

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


def main():
    import jax
    import jax.numpy as jnp

    try:
        cur = jax.config.jax_platforms or ""
        if cur and "cpu" not in cur:
            jax.config.update("jax_platforms", cur + ",cpu")
    except Exception:
        pass

    from gt_pyg_tpu.ops.pallas.ffn import fused_ffn

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 57344
    rng = jax.random.PRNGKey(0)

    for h in (512, 256):
        din = dout = 128
        ks = jax.random.split(rng, 8)
        x = jax.random.normal(ks[0], (R, din), jnp.bfloat16)
        w0 = jax.random.normal(ks[1], (din, h), jnp.float32) * 0.05
        b0 = jnp.zeros((h,), jnp.float32)
        w1 = jax.random.normal(ks[2], (h, h), jnp.float32) * 0.05
        b1 = jnp.zeros((h,), jnp.float32)
        w2 = jax.random.normal(ks[3], (h, dout), jnp.float32) * 0.05
        b2 = jnp.zeros((dout,), jnp.float32)
        drng = jax.random.key(7, impl="rbg")

        for act in ("gelu", "relu"):
            def fwd(x, w0, b0, w1, b1, w2, b2):
                return fused_ffn(x, None, w0, b0, w1, b1, w2, b2,
                                 act=act, dropout_rate=0.3,
                                 dropout_rng=drng)

            def fwdbwd(x, w0, b0, w1, b1, w2, b2):
                def f(args):
                    return jnp.sum(fused_ffn(args[0], None, *args[1:],
                                             act=act, dropout_rate=0.3,
                                             dropout_rng=drng)
                                   .astype(jnp.float32))
                return jax.grad(f)((x, w0, b0, w1, b1, w2, b2))

            jf = jax.jit(fwd)
            jb = jax.jit(fwdbwd)
            t_f = timeit(jf, x, w0, b0, w1, b1, w2, b2)
            t_fb = timeit(jb, x, w0, b0, w1, b1, w2, b2)
            flops_f = 2 * R * (din * h + h * h + h * dout)
            print(f"R={R} h={h} act={act}: fwd {t_f:.3f} ms "
                  f"({flops_f / t_f * 1e3 / 1.97e14 * 100:.1f}% MFU), "
                  f"fwd+bwd {t_fb:.3f} ms "
                  f"(bwd~{t_fb - t_f:.3f}, "
                  f"{3 * flops_f / (t_fb - t_f) * 1e3 / 1.97e14 * 100:.1f}"
                  f"% MFU)", flush=True)


if __name__ == "__main__":
    main()
