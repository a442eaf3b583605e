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

Two implementations share this contract: the ``lax`` path (XLA gathers +
sorted segment ops — always available, used for parity tests and as the
autodiff reference) and the fused Pallas TPU kernel
(:mod:`gt_pyg_tpu.ops.pallas.gt_attention`).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .segment import multi_aggregate, segment_softmax


def gt_attention(
    q: jnp.ndarray,              # [Np, H, Dh]
    k: jnp.ndarray,              # [Np, H, Dh]
    v: jnp.ndarray,              # [Np, H, Dh]
    edge_src: jnp.ndarray,       # [Ep] int32 (padding -> Np)
    edge_dst: jnp.ndarray,       # [Ep] int32, sorted (padding -> Np)
    e_bias: Optional[jnp.ndarray] = None,    # [Ep, H]
    e_val: Optional[jnp.ndarray] = None,     # [Ep, H, Dh]
    gate_n: Optional[jnp.ndarray] = None,    # [Np, H, Dh]
    e_gate_logits: Optional[jnp.ndarray] = None,  # [Ep, H]
    aggregators: Sequence[str] = ("sum",),
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    max_in_degree: int = 16,
    impl: str = "lax",
    edge_perm_src: Optional[jnp.ndarray] = None,  # [Ep] src-sort perm
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Returns (node_out [Np, H, Dh*A], eij [Ep, H, Dh] or None).

    Padding edges must target the trash node slot ``Np`` (an extra segment
    that is computed and discarded), and padding sources the trash row of
    the node arrays (zeros there keep the math clean).
    """
    if impl == "pallas":
        from .pallas.gt_attention import gt_attention_pallas

        return gt_attention_pallas(
            q, k, v, edge_src, edge_dst, e_bias, e_val, gate_n,
            e_gate_logits, aggregators, dropout_rate, dropout_rng,
            max_in_degree=max_in_degree, edge_perm_src=edge_perm_src,
        )
    return _gt_attention_lax(
        q, k, v, edge_src, edge_dst, e_bias, e_val, gate_n, e_gate_logits,
        aggregators, dropout_rate, dropout_rng, max_in_degree,
        edge_perm_src,
    )


def _gt_attention_lax(
    q, k, v, edge_src, edge_dst, e_bias, e_val, gate_n, e_gate_logits,
    aggregators, dropout_rate, dropout_rng, max_in_degree,
    edge_perm_src=None,
):
    from .gather import gather_by_dst, gather_by_src

    npad, num_heads, dh = q.shape
    scale = 1.0 / math.sqrt(dh)

    # pad the node arrays with a trash row so padding src/dst gathers hit
    # zeros instead of clamping onto a real node
    zrow = jnp.zeros((1, num_heads, dh), dtype=q.dtype)
    qp = jnp.concatenate([q, zrow], axis=0)
    kp = jnp.concatenate([k, zrow], axis=0)
    vp = jnp.concatenate([v, zrow], axis=0)

    q_i = gather_by_dst(qp, edge_dst)        # [Ep, H, Dh]
    k_j = gather_by_src(kp, edge_src, edge_perm_src)
    v_j = gather_by_src(vp, edge_src, edge_perm_src)

    logits_vec = q_i * k_j * scale           # [Ep, H, Dh]
    logits = logits_vec.sum(axis=-1)         # [Ep, H]

    eij = None
    if e_val is not None:
        eij = logits_vec * e_val             # [Ep, H, Dh] (edge-update path)
        v_j = v_j + e_val                    # edge value added BEFORE gate
    if e_bias is not None:
        logits = logits + e_bias
    if gate_n is not None:
        gp = jnp.concatenate([gate_n, zrow], axis=0)
        v_j = v_j * jax.nn.sigmoid(
            gather_by_src(gp, edge_src, edge_perm_src))
    if e_gate_logits is not None:
        logits = logits * jax.nn.sigmoid(e_gate_logits)

    alpha = segment_softmax(logits, edge_dst, npad + 1,
                            max_per_segment=max_in_degree)   # [Ep, H]
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    alpha.shape)
        alpha = jnp.where(keep, alpha / (1.0 - dropout_rate), 0.0)

    messages = alpha[..., None] * v_j        # [Ep, H, Dh]
    out = multi_aggregate(messages, edge_dst, npad + 1, aggregators,
                          max_per_segment=max_in_degree)   # [Np+1, H, Dh*A]
    return out[:npad], eij
