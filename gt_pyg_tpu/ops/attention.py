"""Edge-featured multi-head graph attention — the framework's hot op.

Functional core of GTConv's message passing (reference semantics from
``gt_pyg/nn/gt_conv.py:266-393``, math invariants listed in SURVEY.md
§3.2):

    logits_e = sum_d(Q[dst_e] * K[src_e]) / sqrt(Dh) + E_bias_e
    logits_e *= sigmoid(e_gate_e)                (optional)
    V_e = (V[src_e] + E_val_e)                   (edge value added first)
    V_e *= sigmoid(G[src_e])                     (optional, after add)
    alpha_e = segment_softmax(logits_e, dst)
    alpha_e = dropout(alpha_e)
    out_n = aggregate_a(alpha_e * V_e)           (per aggregator, concat)
    eij_e = (Q[dst_e] * K[src_e]) / sqrt(Dh) * E_val_e   (edge update path)

TPU layout note: everything stays 2-D ``[rows, hidden]`` — a
``[rows, H, Dh]`` tensor with Dh=16 pads its minor dim to the 128-lane
tile, inflating memory traffic ~8x. Per-head reductions/broadcasts run
as matmuls against a constant block-indicator matrix (MXU work).

Two implementations share the contract: the ``lax`` path (XLA gathers +
sorted segment ops — always available, the autodiff/semantics reference)
and the fused Pallas TPU kernel
(:mod:`gt_pyg_tpu.ops.pallas.gt_attention`).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .segment import multi_aggregate, segment_softmax


def head_indicator(num_heads: int, dh: int, dtype=jnp.float32):
    """S [hidden, H]: S[i, h] = 1 iff i // dh == h. ``x @ S`` sums each
    head's block; ``a @ S.T`` broadcasts per-head scalars across Dh."""
    s = np.kron(np.eye(num_heads, dtype=np.float32),
                np.ones((dh, 1), np.float32))
    return jnp.asarray(s, dtype)


def _interleave_perm_np(num_heads: int, dh: int,
                        num_aggrs: int) -> np.ndarray:
    hidden = num_heads * dh
    perm = np.empty(num_aggrs * hidden, np.int32)
    for h in range(num_heads):
        for a in range(num_aggrs):
            for d in range(dh):
                perm[h * num_aggrs * dh + a * dh + d] = a * hidden + h * dh + d
    return perm


def interleave_perm(num_heads: int, dh: int, num_aggrs: int) -> jnp.ndarray:
    """Permutation mapping aggregator-major concat [a][h][d] onto the
    reference layout [h][a][d] (PyG MultiAggregation cat on the last axis
    of [N, H, Dh] then flatten — gt_conv.py:61,310)."""
    return jnp.asarray(_interleave_perm_np(num_heads, dh, num_aggrs))


def wo_row_perm(num_heads: int, dh: int, num_aggrs: int) -> jnp.ndarray:
    """Row permutation for a weight that consumes the reference
    [h][a][d] layout, so it can consume the kernels' aggregator-major
    [a][h][d] output directly:

        interleave_cols(out) @ W == out @ W[wo_row_perm(...)]

    (``out[:, p] @ W == out @ W[argsort(p)]``.) Permuting the ~[A·H·Dh,
    hidden] weight once per step replaces relayouting the [rows,
    A·H·Dh] activation (and its transpose in the VJP) every step."""
    return jnp.asarray(
        np.argsort(_interleave_perm_np(num_heads, dh, num_aggrs)))


def interleave_cols(out: jnp.ndarray, num_heads: int, dh: int,
                    num_aggrs: int) -> jnp.ndarray:
    """Apply :func:`interleave_perm` as a static reshape/transpose.

    Equivalent to ``out[:, interleave_perm(H, dh, A)]`` but expressed as
    an axes transpose so its VJP is the inverse transpose — the gather
    form's VJP is a column scatter, which XLA lowers to a ~A·H·dh-trip
    dynamic-update-slice while loop (profiled at ~3 ms per layer on the
    flagship step)."""
    n = out.shape[0]
    return (out.reshape(n, num_aggrs, num_heads, dh)
               .transpose(0, 2, 1, 3)
               .reshape(n, num_aggrs * num_heads * dh))


def gt_attention(
    q: jnp.ndarray,              # [Np, hidden]
    k: jnp.ndarray,              # [Np, hidden]
    v: jnp.ndarray,              # [Np, hidden]
    edge_src: jnp.ndarray,       # [Ep] int32 (padding -> Np)
    edge_dst: jnp.ndarray,       # [Ep] int32, sorted (padding -> Np)
    num_heads: int,
    e_bias: Optional[jnp.ndarray] = None,    # [Ep, H]
    e_val: Optional[jnp.ndarray] = None,     # [Ep, hidden]
    gate_n: Optional[jnp.ndarray] = None,    # [Np, hidden]
    e_gate_logits: Optional[jnp.ndarray] = None,  # [Ep, H]
    aggregators: Sequence[str] = ("sum",),
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    max_in_degree: int = 16,
    impl: str = "lax",
    edge_perm_src: Optional[jnp.ndarray] = None,  # [Ep] src-sort perm
    tile_edges: Optional[int] = None,
    raw_layout: bool = False,
    tile_nodes: Optional[int] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Returns (node_out [Np, hidden * A] in reference [h][a][d] layout,
    or aggregator-major [a][h][d] when ``raw_layout`` — consumers then
    permute their weight rows with :func:`wo_row_perm`; eij [Ep, hidden]
    or None).

    Padding edges must target the trash node slot ``Np`` (an extra
    segment that is computed and discarded), and padding sources the
    trash row of the node arrays — except in the tile-packed layout
    (``tile_edges`` set), where they target their own tile's first
    padding row.

    ``impl``: "lax" (XLA reference path), "tile" (fused per-tile Pallas
    kernel — requires a tile-packed batch; falls back to lax for
    aggregators beyond sum/mean), "pallas" (the v1 chunked kernel), or
    "auto" (tile when the batch is tile-packed, else lax).
    """
    if impl == "auto":
        impl = "tile" if tile_edges is not None else "lax"
    if impl == "tile":
        from .pallas.gt_tile import gt_attention_tile

        if tile_edges is None:
            raise ValueError(
                "attn_impl='tile' requires a tile-packed batch "
                "(pad_graph_batch(..., tile_edges=...))")
        supported = all(a in ("sum", "add", "mean") for a in aggregators)
        if supported:
            return gt_attention_tile(
                q, k, v, edge_src, edge_dst, num_heads, tile_edges,
                e_bias, e_val, gate_n, e_gate_logits, aggregators,
                dropout_rate, dropout_rng, raw_layout=raw_layout,
                tile_nodes=tile_nodes,
            )
        impl = "lax"  # fall through
    if impl == "pallas":
        from .pallas.gt_attention import gt_attention_pallas

        out, eij = gt_attention_pallas(
            q, k, v, edge_src, edge_dst, num_heads, e_bias, e_val, gate_n,
            e_gate_logits, aggregators, dropout_rate, dropout_rng,
            max_in_degree=max_in_degree, edge_perm_src=edge_perm_src,
        )
        if raw_layout and len(aggregators) > 1:
            # v1 kernel emits [h][a][d]; undo to aggregator-major
            n = out.shape[0]
            h, a = num_heads, len(aggregators)
            dh = q.shape[1] // num_heads
            out = (out.reshape(n, h, a, dh).transpose(0, 2, 1, 3)
                      .reshape(n, a * h * dh))
        return out, eij
    return _gt_attention_lax(
        q, k, v, edge_src, edge_dst, num_heads, e_bias, e_val, gate_n,
        e_gate_logits, aggregators, dropout_rate, dropout_rng,
        max_in_degree, edge_perm_src, raw_layout,
    )


def form_messages(q, k, v, edge_src, edge_dst, num_heads, e_bias, e_val,
                  gate_n, e_gate_logits, edge_perm_src):
    """Shared XLA stage: per-edge logits [Ep, H], messages [Ep, hidden],
    and eij [Ep, hidden] — all 2-D."""
    from .gather import gather_by_dst, gather_by_src

    npad, hidden = q.shape
    dh = hidden // num_heads
    scale = 1.0 / math.sqrt(dh)
    S = head_indicator(num_heads, dh, jnp.float32)

    zrow = jnp.zeros((1, hidden), dtype=q.dtype)
    qp = jnp.concatenate([q, zrow], axis=0)
    kp = jnp.concatenate([k, zrow], axis=0)
    vp = jnp.concatenate([v, zrow], axis=0)

    q_i = gather_by_dst(qp, edge_dst)        # [Ep, hidden]
    k_j = gather_by_src(kp, edge_src, edge_perm_src)
    v_j = gather_by_src(vp, edge_src, edge_perm_src)

    prod = (q_i * k_j * scale).astype(jnp.float32)   # [Ep, hidden]
    logits = jax.lax.dot(prod, S,
                         precision=jax.lax.Precision.HIGHEST)  # [Ep, H]

    eij = None
    if e_val is not None:
        eij = (prod * e_val.astype(jnp.float32)).astype(q.dtype)
        v_j = v_j + e_val
    if e_bias is not None:
        logits = logits + e_bias.astype(jnp.float32)
    if gate_n is not None:
        gp = jnp.concatenate([gate_n, zrow], axis=0)
        v_j = v_j * jax.nn.sigmoid(
            gather_by_src(gp, edge_src, edge_perm_src))
    if e_gate_logits is not None:
        logits = logits * jax.nn.sigmoid(e_gate_logits.astype(jnp.float32))
    return logits, v_j, eij, S


def _gt_attention_lax(
    q, k, v, edge_src, edge_dst, num_heads, e_bias, e_val, gate_n,
    e_gate_logits, aggregators, dropout_rate, dropout_rng, max_in_degree,
    edge_perm_src=None, raw_layout=False,
):
    npad, hidden = q.shape
    dh = hidden // num_heads
    logits, v_j, eij, S = form_messages(
        q, k, v, edge_src, edge_dst, num_heads, e_bias, e_val, gate_n,
        e_gate_logits, edge_perm_src)

    alpha = segment_softmax(logits, edge_dst, npad + 1,
                            max_per_segment=max_in_degree)   # [Ep, H]
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    alpha.shape)
        alpha = jnp.where(keep, alpha / (1.0 - dropout_rate), 0.0)

    # broadcast per-head alpha across Dh lanes via the indicator matmul
    alpha_full = jax.lax.dot(alpha, S.T,
                             precision=jax.lax.Precision.HIGHEST)
    messages = alpha_full.astype(v_j.dtype) * v_j        # [Ep, hidden]
    out = multi_aggregate(messages, edge_dst, npad + 1, aggregators,
                          max_per_segment=max_in_degree)  # [Np+1, hidden*A]
    out = out[:npad]
    if len(aggregators) > 1 and not raw_layout:
        out = interleave_cols(out, num_heads, dh, len(aggregators))
    return out, eij
