"""Fused Pallas TPU kernel: segment softmax + weighted aggregation.

The hot half of GTConv's message passing. The lax path materializes
``alpha`` [Ep, H] and ``alpha * V`` [Ep, H, Dh] in HBM between segment
ops; this kernel performs the whole softmax-normalize-aggregate in VMEM
with a single read of the per-edge logits/messages and a single write of
the per-node outputs (flash-attention-style running max/sum across edge
chunks).

Layout contract (from ``pad_graph_batch``): edges sorted by destination;
padding edges carry ``dst == Np`` so they fall outside every node tile's
range and are masked naturally.

Segment membership inside a tile is resolved with a one-hot matrix
``M[NT, TE] = (dst == tile_node)``, turning the segment reductions into
MXU matmuls (``M @ exp_logits``, ``M @ weighted_messages``) — the TPU-
native way to scatter over sorted segments.

Grid: ``(num_node_tiles, chunks_per_tile)``. The per-tile edge ranges are
found via scalar-prefetched block offsets (``tile_block_start``), computed
in XLA from ``searchsorted``; ``chunks_per_tile`` is static, derived from
``max_in_degree`` (molecular graphs: degree <= ~6).

Supported aggregators: ``sum`` (+ ``mean``); other aggregators fall back
to the lax path in :mod:`gt_pyg_tpu.ops.attention`.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile sizes: NT dst-nodes per tile, TE edges per chunk
NT = 128
TE = 256
# scoped-VMEM budget for the kernel (v5e has 128MB VMEM; the default
# 16MB stack limit is too tight for the [NT, TE] working set)
_VMEM_LIMIT = 100 * 1024 * 1024

_NEG_INF = -1e30
_SOFTMAX_EPS = 1e-16


def _fused_kernel(
    # scalar prefetch
    tile_block_start_ref,      # [T] int32: first TE-block touching tile t
    # inputs (blocked)
    logits_ref,                # [TE, H]
    vmsg_ref,                  # [TE, H*Dh]
    keep_ref,                  # [TE, H] (dropout keep, pre-scaled) or ones
    dst_ref,                   # [TE, 1] int32
    # outputs
    out_sum_ref,               # [NT, H*Dh]
    out_cnt_ref,               # [NT, H]   (softmax denominator)
    deg_ref,                   # [NT, H]   (in-degree, for mean)
    # scratch
    run_max, run_sum, run_out, run_deg,
    *, heads: int, dh: int, chunks: int,
):
    t = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        run_max[:] = jnp.full_like(run_max, _NEG_INF)
        run_sum[:] = jnp.zeros_like(run_sum)
        run_out[:] = jnp.zeros_like(run_out)
        run_deg[:] = jnp.zeros_like(run_deg)

    node_base = t * NT
    node_ids = node_base + jax.lax.broadcasted_iota(jnp.int32, (NT, 1), 0)
    dst = dst_ref[:, 0]                                   # [TE]
    # one-hot membership [NT, TE]
    member = (dst[None, :] == node_ids).astype(jnp.float32)

    logits = logits_ref[:].astype(jnp.float32)            # [TE, H]
    belong = (dst[:, None] >= node_base) & (dst[:, None] < node_base + NT)
    masked_logits = jnp.where(belong, logits, _NEG_INF)   # [TE, H]

    # chunk max per (node, head). A [NT, TE, H] broadcast would pad the
    # minor dim of H up to 128 lanes (~34MB VMEM), so reduce per head in
    # 2D (static loop, H is small).
    head_maxes = []
    for h in range(heads):
        lh = jnp.where(member > 0, masked_logits[:, h][None, :], _NEG_INF)
        head_maxes.append(jnp.max(lh, axis=1, keepdims=True))   # [NT, 1]
    chunk_max = jnp.concatenate(head_maxes, axis=1)             # [NT, H]

    new_max = jnp.maximum(run_max[:], chunk_max)
    scale = jnp.exp(run_max[:] - new_max)                  # [NT, H]

    # exp(logits - new_max[dst]) with the tile max routed back to edges
    max_e = jax.lax.dot_general(
        member, new_max,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [TE, H]
    p = jnp.where(belong, jnp.exp(masked_logits - max_e), 0.0)  # [TE, H]

    run_sum[:] = run_sum[:] * scale + jax.lax.dot(
        member, p, preferred_element_type=jnp.float32)
    run_deg[:] = run_deg[:] + jax.lax.dot(
        member, belong.astype(jnp.float32),
        preferred_element_type=jnp.float32)

    # weighted messages: (p * keep) broadcast over Dh, then M @ msgs on MXU.
    # Mosaic cannot reshape across the (H, Dh) split, so expand per head
    # with 2D column ops (static loop, H is small).
    keep = keep_ref[:].astype(jnp.float32)
    vmsg = vmsg_ref[:].astype(jnp.float32)                 # [TE, H*Dh]
    pk = (p * keep)                                        # [TE, H]
    weighted = jnp.concatenate(
        [vmsg[:, h * dh:(h + 1) * dh] * pk[:, h:h + 1]
         for h in range(heads)], axis=1)                   # [TE, H*Dh]
    contrib = jax.lax.dot(member, weighted,
                          preferred_element_type=jnp.float32)  # [NT, H*Dh]
    scale_full = jnp.concatenate(
        [jnp.broadcast_to(scale[:, h:h + 1], (NT, dh))
         for h in range(heads)], axis=1)                   # [NT, H*Dh]
    run_out[:] = run_out[:] * scale_full + contrib
    run_max[:] = new_max

    @pl.when(c == chunks - 1)
    def _finalize():
        out_sum_ref[:] = run_out[:]
        out_cnt_ref[:] = run_sum[:]
        deg_ref[:] = run_deg[:]


def fused_segment_attention(
    logits: jnp.ndarray,        # [Ep, H] f32
    vmsg: jnp.ndarray,          # [Ep, hidden] (or [Ep, H, Dh])
    edge_dst: jnp.ndarray,      # [Ep] int32 sorted (padding == Np)
    npad: int,
    keep: Optional[jnp.ndarray] = None,   # [Ep, H] dropout keep/(1-rate)
    max_in_degree: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (sum_out [Np, hidden], denom [Np, H], degree [Np, H])."""
    ep, heads = logits.shape
    if vmsg.ndim == 3:
        vmsg = vmsg.reshape(ep, -1)
    dh = vmsg.shape[-1] // heads

    n_tiles = pl.cdiv(npad, NT)
    npad_r = n_tiles * NT
    # static chunk budget from the degree bound
    chunks = max(1, math.ceil((NT * max_in_degree) / TE) + 1)

    # pad edge arrays to TE multiples, plus one extra block so the last
    # tile's misaligned window stays in bounds; at least `chunks` blocks
    # must exist so every (tile, chunk) read is in range
    ep_r = max(pl.cdiv(ep, TE) + 1, chunks) * TE
    pad_e = ep_r - ep
    big_dst = jnp.int32(npad_r + NT)  # outside every tile
    logits_p = jnp.pad(logits, ((0, pad_e), (0, 0)))
    vmsg_p = jnp.pad(vmsg, ((0, pad_e), (0, 0)))
    keep_p = (jnp.pad(keep, ((0, pad_e), (0, 0)), constant_values=1.0)
              if keep is not None
              else jnp.ones((ep_r, heads), jnp.float32))
    dst_p = jnp.pad(edge_dst.astype(jnp.int32), (0, pad_e),
                    constant_values=big_dst)
    # padding edges in the original array point at Np; remap them outside
    # the rounded node range as well
    dst_p = jnp.where(dst_p >= npad, big_dst, dst_p)[:, None]  # [Ep_r, 1]

    # first TE-block relevant to each node tile
    tile_starts = jnp.searchsorted(
        dst_p[:, 0], jnp.arange(n_tiles, dtype=jnp.int32) * NT,
        side="left").astype(jnp.int32)
    n_blocks = ep_r // TE
    tile_block_start = jnp.minimum(tile_starts // TE,
                                   jnp.maximum(n_blocks - chunks, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, chunks),
        in_specs=[
            pl.BlockSpec((TE, heads),
                         lambda t, c, tbs: (tbs[t] + c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TE, heads * dh),
                         lambda t, c, tbs: (tbs[t] + c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TE, heads),
                         lambda t, c, tbs: (tbs[t] + c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TE, 1),
                         lambda t, c, tbs: (tbs[t] + c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NT, heads * dh), lambda t, c, tbs: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NT, heads), lambda t, c, tbs: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NT, heads), lambda t, c, tbs: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((NT, heads), jnp.float32),
            pltpu.VMEM((NT, heads), jnp.float32),
            pltpu.VMEM((NT, heads * dh), jnp.float32),
            pltpu.VMEM((NT, heads), jnp.float32),
        ],
    )

    out_sum, denom, degree = pl.pallas_call(
        functools.partial(_fused_kernel, heads=heads, dh=dh, chunks=chunks),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((npad_r, heads * dh), jnp.float32),
            jax.ShapeDtypeStruct((npad_r, heads), jnp.float32),
            jax.ShapeDtypeStruct((npad_r, heads), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(tile_block_start, logits_p, vmsg_p, keep_p, dst_p)

    return out_sum[:npad], denom[:npad], degree[:npad]


def _normalize(out_sum, denom, degree, aggs, dh):
    """out_sum [Np, hidden]; denom/degree [Np, H] broadcast across Dh
    lanes by interleaved repeat. Output concat is aggregator-major; the
    caller permutes to the reference [h][a][d] layout."""
    den = jnp.repeat(denom, dh, axis=1) + _SOFTMAX_EPS     # [Np, hidden]
    outs = []
    for a in aggs:
        if a in ("sum", "add"):
            outs.append(out_sum / den)
        elif a == "mean":
            deg = jnp.maximum(jnp.repeat(degree, dh, axis=1), 1.0)
            outs.append(out_sum / den / deg)
    return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _attention_core(logits, vmsg, keep_arr, edge_dst, npad, max_in_degree,
                    aggs, num_heads):
    """Normalized attention output [Np, H, Dh*A] with custom VJP (forward
    = fused Pallas kernel; backward = lax segment ops on recomputed
    alpha). ``keep_arr`` is the dropout keep/(1-rate) array (all-ones
    when dropout is off); its cotangent is zero (the mask is fixed for
    the step)."""
    dh = vmsg.shape[-1] // num_heads
    out_sum, denom, degree = fused_segment_attention(
        logits, vmsg, edge_dst, npad, keep=keep_arr,
        max_in_degree=max_in_degree)
    return _normalize(out_sum, denom, degree, aggs, dh)


def _core_fwd(logits, vmsg, keep_arr, edge_dst, npad, max_in_degree, aggs,
              num_heads):
    out = _attention_core(logits, vmsg, keep_arr, edge_dst, npad,
                          max_in_degree, aggs, num_heads)
    return out, (logits, vmsg, keep_arr, edge_dst)


def _core_bwd(npad, max_in_degree, aggs, num_heads, residuals, g_out):
    from ..attention import head_indicator
    from ..gather import gather_by_dst
    from ..segment import segment_softmax, segment_sum

    logits, vmsg, keep, edge_dst = residuals
    ep, heads = logits.shape
    hidden = vmsg.shape[-1]
    dh = hidden // heads
    ids = edge_dst
    ns = npad + 1
    S = head_indicator(heads, dh, jnp.float32)

    alpha = segment_softmax(logits, ids, ns)               # [Ep, H]

    # fold the per-aggregator cotangents into one upstream gradient on
    # o_n = sum_e alpha*keep*V: 'sum' passes through, 'mean' divides by
    # the (logit-independent) in-degree
    degree = segment_sum(jnp.ones((ep, heads), jnp.float32)
                         * (ids < npad)[:, None], ids, ns)
    deg = jnp.repeat(jnp.maximum(degree[:npad], 1.0), dh, axis=1)
    g_eff = jnp.zeros((npad, hidden), jnp.float32)
    off = 0
    for a in aggs:
        piece = g_out[..., off:off + hidden]
        if a in ("sum", "add"):
            g_eff = g_eff + piece
        elif a == "mean":
            g_eff = g_eff + piece / deg
        off += hidden

    g_p = jnp.pad(g_eff, ((0, 1), (0, 0)))
    g_e = gather_by_dst(g_p, ids)                          # [Ep, hidden]

    ak_full = jax.lax.dot(alpha * keep, S.T,
                          precision=jax.lax.Precision.HIGHEST)
    g_vmsg = ak_full * g_e
    s = jax.lax.dot(g_e * vmsg, S,
                    precision=jax.lax.Precision.HIGHEST) * keep  # [Ep, H]
    weighted = segment_sum(alpha * s, ids, ns)             # [Np+1, H]
    g_logits = alpha * (s - weighted[ids])
    return g_logits, g_vmsg, jnp.zeros_like(keep), jnp.zeros_like(edge_dst)


_attention_core.defvjp(_core_fwd, _core_bwd)


def gt_attention_pallas(
    q, k, v, edge_src, edge_dst, num_heads, e_bias, e_val, gate_n,
    e_gate_logits, aggregators: Sequence[str], dropout_rate: float,
    dropout_rng, max_in_degree: int = 16, edge_perm_src=None,
):
    """Pallas-backed gt_attention (same 2-D contract as the lax path).

    Per-edge logits/messages form in XLA (gathers + elementwise fuse
    well); the softmax+aggregate runs in the fused kernel. Falls back to
    the lax path for aggregators beyond sum/mean.
    """
    from ..attention import (_gt_attention_lax, form_messages,
                             interleave_cols)

    aggs = tuple(aggregators)
    if any(a not in ("sum", "add", "mean") for a in aggs):
        return _gt_attention_lax(q, k, v, edge_src, edge_dst, num_heads,
                                 e_bias, e_val, gate_n, e_gate_logits,
                                 aggs, dropout_rate, dropout_rng,
                                 max_in_degree, edge_perm_src)

    npad, hidden = q.shape
    dh = hidden // num_heads
    logits, v_j, eij, _ = form_messages(
        q, k, v, edge_src, edge_dst, num_heads, e_bias, e_val, gate_n,
        e_gate_logits, edge_perm_src)

    if dropout_rate > 0.0 and dropout_rng is not None:
        keep_arr = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate,
            logits.shape).astype(jnp.float32) / (1.0 - dropout_rate)
    else:
        keep_arr = jnp.ones(logits.shape, jnp.float32)

    out = _attention_core(logits.astype(jnp.float32),
                          v_j.astype(jnp.float32), keep_arr,
                          edge_dst.astype(jnp.int32), npad, max_in_degree,
                          aggs, num_heads)
    if len(aggs) > 1:
        out = interleave_cols(out, num_heads, dh, len(aggs))
    return out.astype(q.dtype), eij
