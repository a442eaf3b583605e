"""Segment-moments pooling kernel: Σx / Σx² / counts as one MXU dot.

The readout pooling (reference ``gt_pyg/nn/model.py:158`` via PyG
``MultiAggregation`` over the graph index) needs three segment moments —
Σx, Σx², and per-segment counts — from which sum/mean/var/std all
derive. On TPU the XLA scatter-adds that compute them serialize
(~0.55 ms per scatter on the flagship batch, ~7% of HBM speed-of-light;
round-5 trace: 2.9 ms/step of a 43 ms step went to pooling scatters).

This kernel computes the moments the MXU way: per row block, build the
one-hot [nb, S] segment indicator in VMEM and contract it against
``[x, hi(x²), lo(x²)]`` in ONE dot (f32 accumulators across the
sequential grid); counts are a VPU column-sum of the same indicator.
No scatter, no HBM indicator traffic.

Exactness: ``x`` is cast to bf16 — exact when x is already
bf16-representable (the bf16 model's pooled stream is bf16 values
promoted to f32 by masking, so this path is gated to that case).
``x²`` is computed in f32 (exact product of bf16 values) and split
hi+lo into two bf16 columns, so the reconstructed Σx² matches the f32
scatter path up to summation order — a single-pass bf16 x² would lose
~2⁻⁸ relative and poison ``var = E[x²] − E[x]²`` whenever the variance
is much smaller than the mean square.

The backward is NOT a kernel: d/dx of a segment sum is a row gather,
and XLA row gathers are fast on TPU (it is scatters that serialize) —
``pool_moments`` carries a custom VJP that gathers the cotangents and
applies the product rule for the x² term.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
_BF16 = jnp.bfloat16


def _should_interpret() -> bool:
    import os

    if os.environ.get("GT_TPU_FORCE_INTERPRET", "0") == "1":
        return True
    try:
        # host-placed execution (e.g. trainer.init_on_host runs the
        # whole init under jax.default_device(cpu) while the process
        # default backend is the accelerator): Mosaic can't lower for
        # the CPU backend, so interpret there. The attention/FFN
        # kernels dodge this because init_on_host clones the model to
        # their lax/xla impls; pooling is gated inside multi_aggregate
        # and must detect the placement itself.
        dd = jax.config.jax_default_device
        if dd is not None and getattr(dd, "platform", None) == "cpu":
            return True
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _kernel(nb, s_pad, d, ids_ref, x_ref, mom_ref, cnt_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        mom_ref[:] = jnp.zeros_like(mom_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    ids = ids_ref[:]                                    # [nb, 1] i32
    x = x_ref[:].astype(_F32)                           # [nb, D]
    iota = jax.lax.broadcasted_iota(jnp.int32, (nb, s_pad), 1)
    oh = (ids == iota)                                  # [nb, S_pad]
    ohb = oh.astype(_BF16)
    xx = x * x                                          # exact in f32
    hi = xx.astype(_BF16)
    lo = (xx - hi.astype(_F32)).astype(_BF16)
    vals = jnp.concatenate([x.astype(_BF16), hi, lo], axis=1)  # [nb, 3D]
    mom_ref[:] += jax.lax.dot_general(
        ohb, vals, (((0,), (0,)), ((), ())),
        preferred_element_type=_F32)                    # [S_pad, 3D]
    cnt_ref[:] += jnp.sum(oh.astype(_F32), axis=0, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pool_moments(x, ids, num_segments: int, interpret: bool = False):
    """(Σx, Σx², counts) over segments, scatter-free.

    ``x``: [N, D] (bf16 or bf16-representable f32 — see module note),
    ``ids``: [N] int32 segment ids; rows with ids outside
    ``[0, num_segments)`` contribute nothing. Returns
    ``(sum [S, D] f32, sumsq [S, D] f32, counts [S] f32)``.
    """
    return _fwd_impl(x, ids, num_segments, interpret)


def _fwd_impl(x, ids, num_segments, interpret):
    n, d = x.shape
    s_pad = _round_up(max(num_segments, 1), 128)
    nb = 1024
    while nb > n and nb > 8:
        nb //= 2
    n_pad = _round_up(n, nb)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        ids = jnp.pad(ids, (0, n_pad - n), constant_values=-1)
    ids2 = ids.reshape(-1, 1).astype(jnp.int32)

    grid = (n_pad // nb,)
    mom, cnt = pl.pallas_call(
        functools.partial(_kernel, nb, s_pad, d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((s_pad, 3 * d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s_pad, 3 * d), _F32),
            jax.ShapeDtypeStruct((1, s_pad), _F32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret or _should_interpret(),
    )(ids2, x)
    s = mom[:num_segments, :d]
    ss = mom[:num_segments, d:2 * d] + mom[:num_segments, 2 * d:]
    return s, ss, cnt[0, :num_segments]


def _fwd_vjp(x, ids, num_segments, interpret):
    out = _fwd_impl(x, ids, num_segments, interpret)
    return out, (x, ids)


def _bwd_vjp(num_segments, interpret, res, g):
    x, ids = res
    g_s, g_ss, _g_cnt = g          # counts carry no x-gradient
    valid = (ids >= 0) & (ids < num_segments)
    safe = jnp.clip(ids, 0, num_segments - 1)
    # row gathers — fast on TPU (scatters are the serializing direction)
    gx = (jnp.take(g_s, safe, axis=0)
          + 2.0 * x.astype(_F32) * jnp.take(g_ss, safe, axis=0))
    gx = jnp.where(valid[:, None], gx, 0.0).astype(x.dtype)
    return gx, None


pool_moments.defvjp(_fwd_vjp, _bwd_vjp)
