"""Segment primitives for graph aggregation on TPU (lax reference path).

These replace the implicit native layer the reference delegates to PyG
(``MessagePassing.propagate`` gather/scatter, ``torch_geometric.utils.
softmax`` at ``gt_conv.py:390``, ``MultiAggregation`` at ``gt_conv.py:61`` /
``model.py:158``). All ops assume the batch layout produced by
:func:`gt_pyg_tpu.data.graph.pad_graph_batch`:

* segment ids are **sorted** (edges by destination, nodes by graph);
* padding rows point at a trash segment (``num_segments - 1`` after the
  ``+1`` convention used by callers), so no masking is needed inside the
  hot ops — callers slice the trash segment off.

Everything here is jit-friendly: static ``num_segments``, no data-dependent
shapes.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

# ELL-window segment ops: measured SLOWER than sorted scatters on v5e for
# this workload (fwd 74ms vs 36ms) — opt-in for experimentation.
USE_ELL = os.environ.get("GT_TPU_SEGMENT_ELL", "0") == "1"

# PyG's segment softmax adds 1e-16 to the denominator
# (torch_geometric.utils.softmax) — kept for activation parity.
_SOFTMAX_EPS = 1e-16

VALID_AGGREGATORS = frozenset({
    "sum", "add", "mean", "min", "max", "mul", "var", "std",
    "softmax", "powermean", "median",
})


def _seg(fn, x, ids, num_segments, sorted_ids=True):
    return fn(x, ids, num_segments=num_segments,
              indices_are_sorted=sorted_ids)


def segment_sum(x, ids, num_segments, sorted_ids=True):
    return _seg(jax.ops.segment_sum, x, ids, num_segments, sorted_ids)


def segment_mean(x, ids, num_segments, sorted_ids=True):
    s = segment_sum(x, ids, num_segments, sorted_ids)
    cnt = segment_sum(jnp.ones((x.shape[0],) + (1,) * (x.ndim - 1),
                               dtype=x.dtype), ids, num_segments, sorted_ids)
    return s / jnp.maximum(cnt, 1.0)


def segment_max(x, ids, num_segments, sorted_ids=True, empty_value=0.0):
    m = _seg(jax.ops.segment_max, x, ids, num_segments, sorted_ids)
    return jnp.where(jnp.isfinite(m), m, empty_value)


def segment_min(x, ids, num_segments, sorted_ids=True, empty_value=0.0):
    m = _seg(jax.ops.segment_min, x, ids, num_segments, sorted_ids)
    return jnp.where(jnp.isfinite(m), m, empty_value)


def segment_prod(x, ids, num_segments, sorted_ids=True):
    return _seg(jax.ops.segment_prod, x, ids, num_segments, sorted_ids)


def segment_var(x, ids, num_segments, sorted_ids=True):
    """PyG VarAggregation: E[x^2] - E[x]^2 (biased)."""
    mean = segment_mean(x, ids, num_segments, sorted_ids)
    mean2 = segment_mean(x * x, ids, num_segments, sorted_ids)
    return mean2 - mean * mean


def segment_std(x, ids, num_segments, sorted_ids=True, eps=1e-5):
    """PyG StdAggregation: sqrt(relu(var) + 1e-5)."""
    return jnp.sqrt(jax.nn.relu(segment_var(x, ids, num_segments, sorted_ids))
                    + eps)


def segment_softmax(logits, ids, num_segments, sorted_ids=True,
                    max_per_segment=None):
    """Numerically-stable softmax within segments.

    Matches ``torch_geometric.utils.softmax``: subtract per-segment max,
    exponentiate, normalize with a 1e-16 epsilon. With
    ``max_per_segment`` set (sorted ids), the reductions use the
    scatter-free ELL-window path; the max is stop-gradiented (its
    contribution cancels analytically).
    """
    from .gather import gather_by_dst

    if USE_ELL and max_per_segment is not None and sorted_ids:
        maxes = segment_max_ell(logits, ids, num_segments, max_per_segment)
        maxes = jax.lax.stop_gradient(
            jnp.where(jnp.isfinite(maxes), maxes, 0.0))
        unnorm = jnp.exp(logits - gather_by_dst(maxes, ids))
        denom = segment_sum_ell(unnorm, ids, num_segments, max_per_segment)
        return unnorm / (gather_by_dst(denom, ids) + _SOFTMAX_EPS)
    maxes = _seg(jax.ops.segment_max, logits, ids, num_segments, sorted_ids)
    maxes = jnp.where(jnp.isfinite(maxes), maxes, 0.0)
    unnorm = jnp.exp(logits - maxes[ids])
    denom = segment_sum(unnorm, ids, num_segments, sorted_ids)
    return unnorm / (denom[ids] + _SOFTMAX_EPS)


def _segment_softmax_weighted(x, ids, num_segments, sorted_ids=True):
    """PyG SoftmaxAggregation (t=1, non-learnable): sum(softmax(x) * x)."""
    alpha = segment_softmax(x, ids, num_segments, sorted_ids)
    return segment_sum(alpha * x, ids, num_segments, sorted_ids)


def _segment_powermean(x, ids, num_segments, sorted_ids=True, p=1.0):
    """PyG PowerMeanAggregation with default p=1 == mean."""
    if p == 1.0:
        return segment_mean(x, ids, num_segments, sorted_ids)
    xp = jnp.sign(x) * jnp.abs(x) ** p
    m = segment_mean(xp, ids, num_segments, sorted_ids)
    return jnp.sign(m) * jnp.abs(m) ** (1.0 / p)


# ---------------------------------------------------------------------------
# ELL-window segment ops (sorted ids, bounded segment size)
#
# TPU scatters serialize; for sorted segment ids with a static size bound
# K, every reduction can instead be a dense [S, K] gather + masked reduce
# (XLA fuses the gather into the reduction), and — crucially — the
# BACKWARD of a segment reduction is a plain gather by segment id, so the
# whole fwd+bwd pipeline is scatter-free. K comes from the data contract
# (molecular in-degree <= ~6; nodes/graph <= max_nodes_per_graph).
# ---------------------------------------------------------------------------


def _rowptr(ids, num_segments):
    """ptr [S+1]: segment s covers rows [ptr[s], ptr[s+1])."""
    return jnp.searchsorted(
        ids, jnp.arange(num_segments + 1, dtype=ids.dtype), side="left")


def _ell_window(ids, num_segments, k):
    """([S, K] row indices into x (== len(ids) for empty slots), mask)."""
    n = ids.shape[0]
    ptr = _rowptr(ids, num_segments)
    base = ptr[:-1]
    idx = base[:, None] + jnp.arange(k, dtype=ids.dtype)[None, :]
    valid = idx < ptr[1:, None]
    return jnp.where(valid, idx, n), valid


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_sum_ell(x, ids, num_segments, k):
    """Sorted-segment sum via an ELL window; bwd is a gather by id."""
    idx, valid = _ell_window(ids, num_segments, k)
    pad = jnp.zeros((1,) + x.shape[1:], x.dtype)
    xp = jnp.concatenate([x, pad], axis=0)
    g = xp[idx]                                   # [S, K, ...]
    vshape = valid.shape + (1,) * (x.ndim - 1)
    return jnp.where(valid.reshape(vshape), g, 0).sum(axis=1)


def _sum_ell_fwd(x, ids, num_segments, k):
    return segment_sum_ell(x, ids, num_segments, k), ids


def _sum_ell_bwd(num_segments, k, ids, g):
    gp = jnp.concatenate([g, jnp.zeros((1,) + g.shape[1:], g.dtype)],
                         axis=0)
    safe = jnp.minimum(ids, num_segments)
    return gp[safe], None


segment_sum_ell.defvjp(_sum_ell_fwd, _sum_ell_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_max_ell(x, ids, num_segments, k):
    """Sorted-segment max (empty segments -> -inf); bwd routes the
    cotangent to the (first) argmax row via gathers + equality."""
    idx, valid = _ell_window(ids, num_segments, k)
    pad = jnp.zeros((1,) + x.shape[1:], x.dtype)
    xp = jnp.concatenate([x, pad], axis=0)
    g = xp[idx]
    vshape = valid.shape + (1,) * (x.ndim - 1)
    neg = jnp.asarray(-jnp.inf, x.dtype)
    return jnp.where(valid.reshape(vshape), g, neg).max(axis=1)


def _max_ell_fwd(x, ids, num_segments, k):
    out = segment_max_ell(x, ids, num_segments, k)
    return out, (x, ids, out)


def _max_ell_bwd(num_segments, k, res, g):
    x, ids, out = res
    outp = jnp.concatenate([out, jnp.zeros((1,) + out.shape[1:],
                                           out.dtype)], axis=0)
    gp = jnp.concatenate([g, jnp.zeros((1,) + g.shape[1:], g.dtype)],
                         axis=0)
    safe = jnp.minimum(ids, num_segments)
    is_max = (x == outp[safe])
    # split the cotangent across ties (sum-of-subgradients convention
    # differs from XLA's first-hit, but is a valid subgradient and exact
    # when maxima are unique)
    ties = segment_sum_ell(is_max.astype(x.dtype), ids, num_segments, k)
    tiesp = jnp.concatenate([ties, jnp.ones((1,) + ties.shape[1:],
                                            ties.dtype)], axis=0)
    dx = jnp.where(is_max, gp[safe] / jnp.maximum(tiesp[safe], 1.0), 0.0)
    return dx, None


segment_max_ell.defvjp(_max_ell_fwd, _max_ell_bwd)


def build_ell_index(ids, num_segments, max_per_segment):
    """Dense [S, K] gather index for per-segment sorted ops (median).

    ``ids`` must be sorted. Entries beyond a segment's count are filled
    with ``len(ids)`` (callers append a pad row).
    """
    n = ids.shape[0]
    pos_in_seg = jnp.arange(n) - jnp.searchsorted(ids, ids, side="left")
    ell = jnp.full((num_segments, max_per_segment), n, dtype=jnp.int32)
    ok = pos_in_seg < max_per_segment
    rows = jnp.where(ok, ids, num_segments)  # out-of-bounds rows are dropped
    ell = ell.at[rows, jnp.where(ok, pos_in_seg, 0)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return ell


def segment_median(x, ids, num_segments, max_per_segment, sorted_ids=True):
    """Per-segment median via a dense ELL gather + sort.

    ``max_per_segment`` must bound the true segment sizes (static). Cost is
    O(S * K log K) — fine for molecular degrees/graph sizes.
    """
    n = x.shape[0]
    ell = build_ell_index(ids, num_segments, max_per_segment)  # [S, K]
    pad = jnp.zeros((1,) + x.shape[1:], dtype=x.dtype)
    xp = jnp.concatenate([x, pad], axis=0)
    gathered = xp[ell]                       # [S, K, ...]
    valid = (ell < n)                        # [S, K]
    vshape = valid.shape + (1,) * (x.ndim - 1)
    big = jnp.asarray(jnp.inf, dtype=x.dtype)
    masked = jnp.where(valid.reshape(vshape), gathered, big)
    srt = jnp.sort(masked, axis=1)           # valid values first
    cnt = valid.sum(axis=1)                  # [S]
    # PyG median = lower median (index (n-1)//2 of sorted values)
    mid = jnp.maximum(cnt - 1, 0) // 2
    idx = mid.reshape((-1, 1) + (1,) * (x.ndim - 1))
    med = jnp.take_along_axis(srt, jnp.broadcast_to(idx, (srt.shape[0], 1) + srt.shape[2:]), axis=1)
    med = med[:, 0]
    return jnp.where((cnt > 0).reshape((-1,) + (1,) * (x.ndim - 1)), med, 0.0)


# VMEM the moments kernel may claim before auto mode falls back to the
# scatter path: the kernel holds a [s_pad, 3d] f32 accumulator, a
# [1024, s_pad] one-hot (bf16) and a [1, s_pad] count row resident
# across the whole grid (ops/pallas/pool.py BlockSpecs). The flagship
# readout (s_pad≈256-512, d=128) uses well under 2 MB; the lax
# attention fallback calls multi_aggregate with num_segments ≈ the
# padded NODE count (tens of thousands) which would demand hundreds of
# MB and fail Mosaic compilation — that path must keep its scatters.
_POOL_MATMUL_VMEM_CAP = 12 * 1024 * 1024


def _use_pool_matmul(x, num_segments: int, lowp_exact: bool) -> bool:
    """Gate for the MXU segment-moments kernel (ops/pallas/pool.py).

    Engages only when the one-hot dot is EXACT for the data: x already
    bf16, or f32 that the caller certifies is bf16-representable
    (``lowp_exact`` — e.g. a bf16 stream promoted by a 0/1 mask
    multiply, the flagship pooling case) — and, in auto mode, only when
    the kernel's VMEM residency for ``num_segments`` segments fits
    under ``_POOL_MATMUL_VMEM_CAP`` (large segment counts, e.g. the lax
    attention fallback's per-node softmax denominators, stay on the
    scatter path instead of failing Mosaic compilation).
    ``GT_TPU_POOL=matmul`` forces it (interpret mode included, for CPU
    tests), ``off`` disables."""
    mode = os.environ.get("GT_TPU_POOL", "auto").lower()
    if mode == "off" or x.ndim != 2:
        return False
    ok_dtype = (x.dtype == jnp.bfloat16
                or (x.dtype == jnp.float32 and lowp_exact))
    if mode == "matmul":
        return ok_dtype
    s_pad = -(-max(int(num_segments), 1) // 128) * 128
    d = int(x.shape[1])
    vmem_bytes = s_pad * 3 * d * 4 + 1024 * s_pad * 2 + s_pad * 4
    if vmem_bytes > _POOL_MATMUL_VMEM_CAP:
        return False
    from .pallas.pool import _should_interpret

    return ok_dtype and not _should_interpret()


def multi_aggregate(
    x,
    ids,
    num_segments: int,
    aggregators: Sequence[str],
    sorted_ids: bool = True,
    max_per_segment: Optional[int] = None,
    lowp_exact: bool = False,
):
    """PyG MultiAggregation(mode="cat"): apply each aggregator over the
    segments and concatenate along the last axis.

    ``x``: [E, ...] messages (or [N, ...] node states for pooling).
    Returns [num_segments, ... * len(aggregators)].

    With ``max_per_segment`` set (and sorted ids), sum/mean/max/min/var/
    std ride the scatter-free ELL-window path. ``lowp_exact`` asserts
    that f32 ``x`` values are exactly bf16-representable, unlocking the
    MXU moments kernel for the sum/mean/var/std family (see
    :func:`_use_pool_matmul`).
    """
    ell = (max_per_segment
           if (USE_ELL and max_per_segment is not None and sorted_ids)
           else None)

    # Shared-moment fast path: sum/mean/var/std all derive from two
    # scatter moments (Σx, Σx²) plus per-segment counts. With sorted ids
    # the counts are scatter-free (rowptr diff), and the Σx / Σx² scatters
    # are computed once and reused across aggregators — the naive per-
    # aggregator path costs 5 device scatters for (sum, mean, max, std),
    # this one costs 3 (Σx, Σx², max). Measured ~1.7 ms/step of the
    # flagship 43.8 ms step (pooling scatters are serialization-bound on
    # TPU, ~15x off HBM speed-of-light).
    memo = {}

    needs_moments = any(a in ("sum", "add", "mean", "var", "std")
                        for a in aggregators)
    if (needs_moments and ell is None
            and _use_pool_matmul(x, num_segments, lowp_exact)):
        from .pallas.pool import pool_moments

        s, ss, cnt = pool_moments(x, ids, num_segments)
        memo["sum"], memo["sumsq"] = s, ss
        memo["cnt"] = cnt.reshape((-1,) + (1,) * (x.ndim - 1))

    def _counts():
        if "cnt" not in memo:
            if sorted_ids:
                cnt = jnp.diff(_rowptr(ids, num_segments)).astype(x.dtype)
                cnt = cnt.reshape((-1,) + (1,) * (x.ndim - 1))
            else:
                cnt = segment_sum(
                    jnp.ones((x.shape[0],) + (1,) * (x.ndim - 1),
                             dtype=x.dtype), ids, num_segments, sorted_ids)
            memo["cnt"] = cnt
        return memo["cnt"]

    def _sum():
        if "sum" not in memo:
            memo["sum"] = (segment_sum_ell(x, ids, num_segments, ell) if ell
                           else segment_sum(x, ids, num_segments, sorted_ids))
        return memo["sum"]

    def _sumsq():
        if "sumsq" not in memo:
            xx = x * x
            memo["sumsq"] = (segment_sum_ell(xx, ids, num_segments, ell)
                             if ell else
                             segment_sum(xx, ids, num_segments, sorted_ids))
        return memo["sumsq"]

    def _var():
        cnt = jnp.maximum(_counts(), 1.0)
        m1 = _sum() / cnt
        return _sumsq() / cnt - m1 * m1

    outs = []
    for aggr in aggregators:
        if aggr in ("sum", "add"):
            outs.append(_sum())
        elif aggr == "mean":
            outs.append(_sum() / jnp.maximum(_counts(), 1.0))
        elif aggr == "max":
            if ell:
                m = segment_max_ell(x, ids, num_segments, ell)
                outs.append(jnp.where(jnp.isfinite(m), m, 0.0))
            else:
                outs.append(segment_max(x, ids, num_segments, sorted_ids))
        elif aggr == "min":
            if ell:
                m = -segment_max_ell(-x, ids, num_segments, ell)
                outs.append(jnp.where(jnp.isfinite(m), m, 0.0))
            else:
                outs.append(segment_min(x, ids, num_segments, sorted_ids))
        elif aggr == "mul":
            prod = segment_prod(x, ids, num_segments, sorted_ids)
            outs.append(jnp.where(_counts() > 0, prod, 0.0))
        elif aggr == "var":
            outs.append(_var())
        elif aggr == "std":
            outs.append(jnp.sqrt(jax.nn.relu(_var()) + 1e-5))
        elif aggr == "softmax":
            outs.append(_segment_softmax_weighted(x, ids, num_segments,
                                                  sorted_ids))
        elif aggr == "powermean":
            outs.append(_segment_powermean(x, ids, num_segments, sorted_ids))
        elif aggr == "median":
            k = max_per_segment or 32
            outs.append(segment_median(x, ids, num_segments, k, sorted_ids))
        else:
            raise ValueError(f"unknown aggregator: {aggr!r}")
    return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
