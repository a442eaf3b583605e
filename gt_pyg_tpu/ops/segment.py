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
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

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


def segment_softmax(logits, ids, num_segments, sorted_ids=True):
    """Numerically-stable softmax within segments.

    Matches ``torch_geometric.utils.softmax``: subtract per-segment max,
    exponentiate, normalize with a 1e-16 epsilon. Empty segments never get
    gathered, so the -inf max of an empty segment is harmless.
    """
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


def multi_aggregate(
    x,
    ids,
    num_segments: int,
    aggregators: Sequence[str],
    sorted_ids: bool = True,
    max_per_segment: Optional[int] = None,
):
    """PyG MultiAggregation(mode="cat"): apply each aggregator over the
    segments and concatenate along the last axis.

    ``x``: [E, ...] messages (or [N, ...] node states for pooling).
    Returns [num_segments, ... * len(aggregators)].
    """
    outs = []
    for aggr in aggregators:
        if aggr in ("sum", "add"):
            outs.append(segment_sum(x, ids, num_segments, sorted_ids))
        elif aggr == "mean":
            outs.append(segment_mean(x, ids, num_segments, sorted_ids))
        elif aggr == "max":
            outs.append(segment_max(x, ids, num_segments, sorted_ids))
        elif aggr == "min":
            outs.append(segment_min(x, ids, num_segments, sorted_ids))
        elif aggr == "mul":
            prod = segment_prod(x, ids, num_segments, sorted_ids)
            cnt = segment_sum(jnp.ones((x.shape[0],) + (1,) * (x.ndim - 1),
                                       dtype=x.dtype),
                              ids, num_segments, sorted_ids)
            outs.append(jnp.where(cnt > 0, prod, 0.0))
        elif aggr == "var":
            outs.append(segment_var(x, ids, num_segments, sorted_ids))
        elif aggr == "std":
            outs.append(segment_std(x, ids, num_segments, sorted_ids))
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
