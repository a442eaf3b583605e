"""Row gathers with sorted-segment backward passes.

Autodiff of ``x[idx]`` emits a scatter-add with no sortedness hint — the
slow path on TPU. Both gather directions in the attention core have a
sorted order available:

* gathers by **destination** (Q rows): ``edge_dst`` is already sorted;
* gathers by **source** (K/V/gate rows): ``edge_perm_src`` (from
  ``pad_graph_batch``) reorders edges by source.

``gather_rows`` keeps the forward a plain gather but rewrites the
backward as a sorted ``segment_sum`` (optionally through the
permutation), so every reduction in the train step rides the
sorted-segment fast path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gather_rows(x: jnp.ndarray, idx: jnp.ndarray,
                sort_perm: Optional[jnp.ndarray], already_sorted: bool):
    """``x[idx]`` with a sorted-segment backward.

    Args:
        x: [N, ...] rows (the trash row, if any, included).
        idx: [E] int32 gather indices.
        sort_perm: [E] permutation such that ``idx[sort_perm]`` is
            non-decreasing; pass None when ``already_sorted``.
        already_sorted: idx is already non-decreasing.
    """
    return x[idx]


def _fwd(x, idx, sort_perm, already_sorted):
    return x[idx], (x.shape[0], idx, sort_perm)


def _bwd(already_sorted, res, g):
    n_rows, idx, sort_perm = res
    if already_sorted:
        gs, ids = g, idx
    else:
        gs = g[sort_perm]
        ids = idx[sort_perm]
    dx = jax.ops.segment_sum(gs, ids, num_segments=n_rows,
                             indices_are_sorted=True)
    return dx, None, None


gather_rows.defvjp(_fwd, _bwd)


def gather_by_dst(x, edge_dst):
    """Gather node rows per edge by (sorted) destination index."""
    return gather_rows(x, edge_dst, None, True)


def gather_by_src(x, edge_src, edge_perm_src=None):
    """Gather node rows per edge by source index; backward uses the
    src-sort permutation when provided."""
    if edge_perm_src is None:
        return x[edge_src]
    return gather_rows(x, edge_src, edge_perm_src, False)
