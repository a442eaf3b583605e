"""Fused per-tile Pallas kernel for GTConv message passing (v2).

Replaces the whole gather → SDDMM → segment-softmax → SpMM pipeline of
:func:`gt_pyg_tpu.ops.attention.gt_attention` (the role of PyG's
``MessagePassing.propagate`` + ``torch_geometric.utils.softmax`` at
reference ``gt_pyg/nn/gt_conv.py:306-393``) with ONE kernel launch per
direction, exploiting the tile-packed batch layout
(:func:`gt_pyg_tpu.data.graph.pad_graph_batch` with ``tile_edges``):

* graphs are bin-packed into aligned tiles of ``NT = 128`` node rows and
  ``TE`` edge rows, and **edges never leave their tile** — so every
  gather/scatter in the attention block becomes a small MXU matmul
  against a one-hot tile-local indicator matrix, entirely in VMEM:

      gather  x[dst]   ->  S_dst[TE, NT] @ x_tile[NT, hidden]
      scatter sum_dst  ->  S_dst^T contraction (dot_general over the
                           edge axis) — no XLA scatter anywhere

* all edges of a destination node live in one tile, so the segment
  softmax completes in a single pass (no flash-style running max);

* the backward has the same structure (its scatters are indicator
  contractions too), so the VJP is a second fused kernel and the train
  step contains **no** XLA scatter/gather on the attention path.

Per-head reductions/broadcasts run as matmuls against the constant
head-indicator matrix — the ``[rows, hidden]`` 2-D layout is kept
throughout (a ``[*, H, Dh]`` layout with Dh=16 would pad its minor dim
to the 128-lane tile).

Supported aggregators: ``sum``/``add``/``mean``. Math invariants match
the lax path exactly (SURVEY.md §3.2): value-add-before-gate, per-head
logit bias + sigmoid logit gate, softmax over incoming edges with the
PyG 1e-16 denominator epsilon, attention dropout on alpha, and the
pre-softmax QK ⊙ E_val edge output. (The raw-vs-normed edge-state
asymmetry is resolved by the caller, which passes both projections.)
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...data.graph import TILE_NODES as NT

_SOFTMAX_EPS = 1e-16
_NEG_INF = -1e30
_F32 = jnp.float32


def _head_indicator(num_heads: int, dh: int) -> np.ndarray:
    """S [hidden, H]: x @ S sums each head's Dh block; a @ S.T broadcasts
    per-head scalars across the head's lanes."""
    return np.kron(np.eye(num_heads, dtype=np.float32),
                   np.ones((dh, 1), np.float32))


def _should_interpret() -> bool:
    import os

    if os.environ.get("GT_TPU_FORCE_INTERPRET", "0") == "1":
        return True
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


# f32 dots pin HIGHEST precision: the MXU otherwise truncates f32
# operands to one bf16 pass (measured ~3e-2 relative gradient error vs
# the lax path on v5e). bf16 operands must use DEFAULT — Mosaic rejects
# an fp32-precision matmul on bf16 vectors ("Bad lhs type").
#
# Matmul-dtype policy (md): when the model computes in bf16, EVERY dot
# in the kernel runs single-pass bf16 with f32 accumulation — the
# indicator matrices are one-hot (exact in bf16) so gathers/broadcasts
# stay exact and scatters round their f32 values once, exactly like any
# other bf16 matmul in the net. When the model computes in f32 the
# kernel is bit-faithful (HIGHEST everywhere) for golden-parity tests.
# This matters: a HIGHEST f32 matmul costs 6 MXU passes, and the
# fwd+bwd kernels are dominated by [TE,NT]-indicator contractions.
def _mm_dtype(dtype):
    return dtype if dtype == jnp.bfloat16 else _F32


def _prec(a, b):
    if a.dtype == _F32 and b.dtype == _F32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def _dot(a, b):
    return jax.lax.dot(a, b, preferred_element_type=_F32,
                       precision=_prec(a, b))


def _dot_t(a, b):
    """Contract over the (leading) edge axis: a [E, N], b [E, F] ->
    [N, F]. The TPU-native scatter: an MXU matmul with lhs-transposed
    dimension numbers instead of an XLA scatter."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=_F32,
        precision=_prec(a, b))


def _dot_rt(a, b):
    """a [E, N], b [H, N] -> [E, H] (contract both minor axes)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=_F32,
        precision=_prec(a, b))


def _segment_max_t(sd_b, logits, heads):
    """Exact per-(node, head) max over member edges.

    sd_b [TE, NT] bool membership, logits [TE, H] f32. Returns
    node_max_T [H, NT] with empty segments forced to 0 (static head
    loop — a [NT, TE, H] broadcast would pad H to 128 lanes)."""
    maxes = []
    for h in range(heads):
        lh = jnp.where(sd_b, logits[:, h:h + 1], _NEG_INF)   # [TE, NT]
        maxes.append(jnp.max(lh, axis=0, keepdims=True))     # [1, NT]
    node_max_t = jnp.concatenate(maxes, axis=0)              # [H, NT]
    return jnp.where(node_max_t > _NEG_INF / 2, node_max_t, 0.0)


# cfg tuple: (heads, dh, te, aggs, has_gate, has_edge, tiles_per_step)
#
# Each grid step processes ``tiles_per_step`` (G) consecutive tiles with
# a static inner loop: per-step Mosaic control overhead (~µs) was
# measured to dominate the kernel at G=1 (2048 grid steps for the
# 4-layer bench batch vs a ~2 ms matmul floor), and the per-tile matmul
# shapes are unchanged, so amortizing the overhead G× is pure win as
# long as the G-tile working set fits VMEM.
def _fwd_body(cfg, refs):
    heads, dh, te, aggs, has_gate, has_edge, g_tiles = cfg
    scale = 1.0 / math.sqrt(dh)
    i = iter(refs)
    q_ref, k_ref, v_ref = next(i), next(i), next(i)
    gate_ref = next(i) if has_gate else None
    if has_edge:
        e_bias_ref, e_val_ref = next(i), next(i)
        e_gate_ref = next(i) if has_gate else None
    keep_ref, src_ref, dst_ref = next(i), next(i), next(i)
    s_head_ref = next(i)
    out_ref = next(i)
    eij_ref = next(i) if has_edge else None

    S_m_raw = s_head_ref[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, (te, NT), 1)

    for g in range(g_tiles):
        en = pl.ds(g * te, te)                      # edge-row window
        nn_ = pl.ds(g * NT, NT)                     # node-row window
        base = (pl.program_id(0) * g_tiles + g) * NT
        sl = src_ref[en] - base                     # [TE, 1] tile-local
        dl = dst_ref[en] - base
        ss_b = sl == iota                           # [TE, NT]
        sd_b = dl == iota
        md = _mm_dtype(q_ref.dtype)
        ss_m, sd_m = ss_b.astype(md), sd_b.astype(md)

        q_e = _dot(sd_m, q_ref[nn_].astype(md))     # [TE, hidden] f32
        k_e = _dot(ss_m, k_ref[nn_].astype(md))
        v_e = _dot(ss_m, v_ref[nn_].astype(md))

        prod = q_e * k_e * scale
        S_m = S_m_raw.astype(md)                    # [hidden, H]
        # Softmax chain precision: the [·,H]-shaped contractions (logit
        # reduce, max gather, denominator sum/gather) run f32 — their
        # FLOPs are H/hidden (~6%) of the wide gathers, but bf16 here
        # destabilizes bf16 TRAINING: a bf16-rounded max leaves up to
        # 0.4%·|max| in the exponent and a bf16 denominator perturbs
        # every alpha; measured as loss divergence by ~step 20 at
        # lr=1e-3 where the f32-softmax lax path trains cleanly. The
        # wide [TE,NT]@[NT,hidden] gathers stay in md (the MXU win).
        sd_f = sd_b.astype(_F32)
        logits = _dot(prod, S_m_raw)                # [TE, H] f32
        if has_edge:
            e_val = e_val_ref[en].astype(_F32)
            eij_ref[en] = (prod * e_val).astype(eij_ref.dtype)
            logits = logits + e_bias_ref[en].astype(_F32)
            v_msg = v_e + e_val
        else:
            v_msg = v_e
        if has_gate:
            v_msg = v_msg * jax.nn.sigmoid(
                _dot(ss_m, gate_ref[nn_].astype(md)))
            if has_edge:
                logits = logits * jax.nn.sigmoid(
                    e_gate_ref[en].astype(_F32))

        node_max_t = _segment_max_t(sd_b, logits, heads)  # [H, NT]
        p = jnp.exp(logits - _dot_rt(sd_f, node_max_t))
        # node degree rides the denominator contraction as an extra lane
        # column (both outputs are lane-padded to 128 anyway) — no
        # separate MXU pass for "mean"
        need_deg = "mean" in aggs
        if need_deg:
            aug = jnp.concatenate([p, jnp.ones((te, 1), _F32)], axis=1)
            den_deg = _dot_t(sd_f, aug)                   # [NT, H+1]
            denom, deg = den_deg[:, :heads], jnp.maximum(
                den_deg[:, heads:], 1.0)
        else:
            denom, deg = _dot_t(sd_f, p), None            # [NT, H]
        alpha = p / (_dot(sd_f, denom) + _SOFTMAX_EPS)
        alpha = alpha * keep_ref[en].astype(_F32)

        msg = _dot(alpha.astype(md), S_m.T) * v_msg       # [TE, hidden]
        sum_out = _dot_t(sd_m, msg.astype(md))            # [NT, hidden]

        outs = []
        for a in aggs:
            if a == "sum":
                outs.append(sum_out)
            elif a == "mean":
                outs.append(sum_out / deg)
        out = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
        out_ref[nn_] = out.astype(out_ref.dtype)


def _bwd_body(cfg, refs):
    heads, dh, te, aggs, has_gate, has_edge, g_tiles = cfg
    scale = 1.0 / math.sqrt(dh)
    hidden = heads * dh
    i = iter(refs)
    q_ref, k_ref, v_ref = next(i), next(i), next(i)
    gate_ref = next(i) if has_gate else None
    if has_edge:
        e_bias_ref, e_val_ref = next(i), next(i)
        e_gate_ref = next(i) if has_gate else None
    keep_ref, src_ref, dst_ref = next(i), next(i), next(i)
    s_head_ref = next(i)
    g_out_ref = next(i)
    g_eij_ref = next(i) if has_edge else None
    dq_ref, dk_ref, dv_ref = next(i), next(i), next(i)
    dgate_ref = next(i) if has_gate else None
    if has_edge:
        de_bias_ref, de_val_ref = next(i), next(i)
        de_gate_ref = next(i) if has_gate else None

    iota = jax.lax.broadcasted_iota(jnp.int32, (te, NT), 1)
    S_m_raw = s_head_ref[:]

    for g in range(g_tiles):
        en = pl.ds(g * te, te)
        nn_ = pl.ds(g * NT, NT)
        base = (pl.program_id(0) * g_tiles + g) * NT
        sl = src_ref[en] - base
        dl = dst_ref[en] - base
        ss_b = sl == iota
        sd_b = dl == iota
        md = _mm_dtype(q_ref.dtype)
        ss_m, sd_m = ss_b.astype(md), sd_b.astype(md)
        S_m = S_m_raw.astype(md)

        # ---- recompute forward intermediates (all in VMEM)
        sd_f = sd_b.astype(_F32)

        q_e = _dot(sd_m, q_ref[nn_].astype(md))
        k_e = _dot(ss_m, k_ref[nn_].astype(md))
        v_e = _dot(ss_m, v_ref[nn_].astype(md))
        prod = q_e * k_e * scale
        logits = _dot(prod, S_m_raw)                # f32 (see fwd note)
        if has_edge:
            e_val = e_val_ref[en].astype(_F32)
            logits_pre = logits + e_bias_ref[en].astype(_F32)
            v_base = v_e + e_val
        else:
            logits_pre = logits
            v_base = v_e
        if has_gate:
            sig_g = jax.nn.sigmoid(_dot(ss_m, gate_ref[nn_].astype(md)))
            v_msg = v_base * sig_g
            if has_edge:
                sig_eg = jax.nn.sigmoid(e_gate_ref[en].astype(_F32))
                logits_fin = logits_pre * sig_eg
            else:
                logits_fin = logits_pre
        else:
            v_msg = v_base
            logits_fin = logits_pre

        node_max_t = _segment_max_t(sd_b, logits_fin, heads)
        p = jnp.exp(logits_fin - _dot_rt(sd_f, node_max_t))
        need_deg = "mean" in aggs
        if need_deg:
            aug = jnp.concatenate([p, jnp.ones((te, 1), _F32)], axis=1)
            den_deg = _dot_t(sd_f, aug)
            denom, deg = den_deg[:, :heads], jnp.maximum(
                den_deg[:, heads:], 1.0)
        else:
            denom, deg = _dot_t(sd_f, p), None
        alpha_raw = p / (_dot(sd_f, denom) + _SOFTMAX_EPS)
        keep = keep_ref[en].astype(_F32)
        alpha = alpha_raw * keep
        alpha_full = _dot(alpha.astype(md), S_m.T)        # [TE, hidden]

        # ---- reverse
        # fold aggregator cotangents into one per-node message gradient
        g_node = jnp.zeros((NT, hidden), _F32)
        off = 0
        for a in aggs:
            piece = g_out_ref[nn_, off:off + hidden].astype(_F32)
            if a == "sum":
                g_node = g_node + piece
            elif a == "mean":
                g_node = g_node + piece / deg
            off += hidden

        g_msg = _dot(sd_m, g_node.astype(md))             # [TE, hidden]
        g_alpha_full = g_msg * v_msg
        g_v_msg = alpha_full * g_msg

        g_alpha = _dot(g_alpha_full.astype(md), S_m)      # [TE, H]
        g_alpha_raw = g_alpha * keep
        # softmax VJP within segments: a * (g - sum_seg(a * g)). The
        # subtraction CANCELS when attention is peaked (alpha ~ 1 on one
        # edge makes g and the segment sum nearly equal), so the sum and
        # its gather-back must be f32 — in bf16 the ~0.4%-of-|a·g|
        # rounding dwarfs the true difference and the logit gradient
        # comes out wrong-signed; measured as bf16 training divergence
        # at lr=1e-3 (loss climbs, NaN by ~step 40) with the lax path
        # healthy on the identical stream.
        t_e = alpha_raw * g_alpha_raw
        t_n = _dot_t(sd_f, t_e)                           # [NT, H] f32
        g_logits = alpha_raw * (g_alpha_raw - _dot(sd_f, t_n))

        if has_gate and has_edge:
            g_logits_pre = g_logits * sig_eg
            de_gate_ref[en] = (g_logits * logits_pre * sig_eg
                               * (1.0 - sig_eg)).astype(de_gate_ref.dtype)
        else:
            g_logits_pre = g_logits
        if has_edge:
            de_bias_ref[en] = g_logits_pre.astype(de_bias_ref.dtype)

        g_prod = _dot(g_logits_pre.astype(md), S_m.T)     # [TE, hidden]
        if has_edge:
            g_eij = g_eij_ref[en].astype(_F32)
            g_prod = g_prod + g_eij * e_val
            g_e_val = g_eij * prod
        if has_gate:
            g_v_base = g_v_msg * sig_g
            g_gate_e = g_v_msg * v_base * sig_g * (1.0 - sig_g)
            dgate_ref[nn_] = _dot_t(
                ss_m, g_gate_e.astype(md)).astype(dgate_ref.dtype)
        else:
            g_v_base = g_v_msg
        if has_edge:
            de_val_ref[en] = (g_e_val + g_v_base).astype(de_val_ref.dtype)

        g_q_e = g_prod * k_e * scale
        g_k_e = g_prod * q_e * scale

        dq_ref[nn_] = _dot_t(sd_m, g_q_e.astype(md)).astype(dq_ref.dtype)
        dk_ref[nn_] = _dot_t(ss_m, g_k_e.astype(md)).astype(dk_ref.dtype)
        dv_ref[nn_] = _dot_t(ss_m,
                             g_v_base.astype(md)).astype(dv_ref.dtype)


def _edge_block(cfg, width):
    te, g = cfg[2], cfg[6]
    return pl.BlockSpec((g * te, width), lambda t: (t, 0),
                        memory_space=pltpu.VMEM)


def _node_block(cfg, width):
    g = cfg[6]
    return pl.BlockSpec((g * NT, width), lambda t: (t, 0),
                        memory_space=pltpu.VMEM)


def _collect_inputs(cfg, q, k, v, gate_n, e_bias, e_val, e_gate, keep,
                    src, dst):
    heads, dh, te, aggs, has_gate, has_edge, g_tiles = cfg
    hidden = heads * dh
    arrays = [q, k, v]
    specs = [_node_block(cfg, hidden)] * 3
    if has_gate:
        arrays.append(gate_n)
        specs.append(_node_block(cfg, hidden))
    if has_edge:
        arrays += [e_bias, e_val]
        specs += [_edge_block(cfg, heads), _edge_block(cfg, hidden)]
        if has_gate:
            arrays.append(e_gate)
            specs.append(_edge_block(cfg, heads))
    arrays += [keep, src.reshape(-1, 1), dst.reshape(-1, 1),
               jnp.asarray(_head_indicator(heads, dh))]
    specs += [_edge_block(cfg, heads), _edge_block(cfg, 1),
              _edge_block(cfg, 1),
              pl.BlockSpec((hidden, heads), lambda t: (0, 0),
                           memory_space=pltpu.VMEM)]
    return arrays, specs


def _cost(cfg, npad, ep, n_big_matmuls):
    heads, dh, te, aggs, has_gate, has_edge, g_tiles = cfg
    hidden = heads * dh
    n_tiles = npad // NT
    per_tile = n_big_matmuls * 2 * te * NT * hidden
    return pl.CostEstimate(
        flops=n_tiles * per_tile,
        bytes_accessed=(npad * hidden * 4 * 4 + ep * hidden * 4 * 2),
        transcendentals=n_tiles * te * heads,
    )


def _pick_tiles_per_step(n_tiles: int, te: int, want: int) -> int:
    """Largest divisor of n_tiles that is <= want (grid length must be
    integral; packing rounds tile counts to ``tiles_multiple`` so the
    preferred G usually divides exactly)."""
    g = max(1, min(want, n_tiles))
    while n_tiles % g:
        g -= 1
    return g


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tile_core(cfg, q, k, v, gate_n, e_bias, e_val, e_gate, keep, src,
               dst):
    """Fused forward. Returns (out [Np, hidden*A] aggregator-major,
    eij [Ep, hidden] or a 0-element placeholder). Inactive optional args
    are 1-element dummies (cfg flags gate which ones reach the kernel).

    ``cfg`` is an 8-tuple (heads, dh, te, aggs, has_gate, has_edge,
    g_fwd, g_bwd); the fwd/bwd kernels run with their own
    tiles-per-step (the bwd working set is ~2x the fwd's, so it uses a
    smaller G to stay inside scoped VMEM)."""
    cfg = cfg[:6] + (cfg[6],)          # 7-tuple view with G = g_fwd
    heads, dh, te, aggs, has_gate, has_edge, g_tiles = cfg
    hidden = heads * dh
    npad, ep = q.shape[0], src.shape[0]
    n_tiles = npad // NT

    arrays, in_specs = _collect_inputs(cfg, q, k, v, gate_n, e_bias,
                                       e_val, e_gate, keep, src, dst)
    out_shapes = [jax.ShapeDtypeStruct((npad, hidden * len(aggs)),
                                       q.dtype)]
    out_specs = [_node_block(cfg, hidden * len(aggs))]
    if has_edge:
        out_shapes.append(jax.ShapeDtypeStruct((ep, hidden), q.dtype))
        out_specs.append(_edge_block(cfg, hidden))

    res = pl.pallas_call(
        functools.partial(lambda c, *refs: _fwd_body(c, refs), cfg),
        grid=(n_tiles // g_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=_cost(cfg, npad, ep, 6 + has_gate),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,),
            # f32 (golden-parity) runs at G=8 need ~18MB scoped VMEM —
            # over the 16MB default; v5e has 128MB physical
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_should_interpret(),
    )(*arrays)
    out = res[0]
    eij = res[1] if has_edge else jnp.zeros((0,), q.dtype)
    return out, eij


def _tile_core_fwd(cfg, q, k, v, gate_n, e_bias, e_val, e_gate, keep,
                   src, dst):
    out = _tile_core(cfg, q, k, v, gate_n, e_bias, e_val, e_gate, keep,
                     src, dst)
    return out, (q, k, v, gate_n, e_bias, e_val, e_gate, keep, src, dst)


def _tile_core_bwd(cfg, residuals, cotangents):
    cfg = cfg[:6] + (cfg[7],)          # 7-tuple view with G = g_bwd
    heads, dh, te, aggs, has_gate, has_edge, g_tiles = cfg
    hidden = heads * dh
    q, k, v, gate_n, e_bias, e_val, e_gate, keep, src, dst = residuals
    g_out, g_eij = cotangents
    npad, ep = q.shape[0], src.shape[0]
    n_tiles = npad // NT

    arrays, in_specs = _collect_inputs(cfg, q, k, v, gate_n, e_bias,
                                       e_val, e_gate, keep, src, dst)
    arrays.append(g_out.astype(q.dtype))
    in_specs.append(_node_block(cfg, hidden * len(aggs)))
    if has_edge:
        arrays.append(g_eij.astype(q.dtype))
        in_specs.append(_edge_block(cfg, hidden))

    out_shapes = [jax.ShapeDtypeStruct((npad, hidden), q.dtype)] * 3
    out_specs = [_node_block(cfg, hidden)] * 3
    if has_gate:
        out_shapes.append(jax.ShapeDtypeStruct((npad, hidden), q.dtype))
        out_specs.append(_node_block(cfg, hidden))
    if has_edge:
        out_shapes += [
            jax.ShapeDtypeStruct((ep, heads), jnp.float32),
            jax.ShapeDtypeStruct((ep, hidden), q.dtype),
        ]
        out_specs += [_edge_block(cfg, heads), _edge_block(cfg, hidden)]
        if has_gate:
            out_shapes.append(jax.ShapeDtypeStruct((ep, heads),
                                                   jnp.float32))
            out_specs.append(_edge_block(cfg, heads))

    res = pl.pallas_call(
        functools.partial(lambda c, *refs: _bwd_body(c, refs), cfg),
        grid=(n_tiles // g_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=_cost(cfg, npad, ep, 12 + 2 * has_gate),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,),
            # f32 (golden-parity) runs at G=8 need ~18MB scoped VMEM —
            # over the 16MB default; v5e has 128MB physical
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_should_interpret(),
    )(*arrays)

    i = iter(res)
    dq, dk, dv = next(i), next(i), next(i)
    dgate = next(i) if has_gate else jnp.zeros_like(gate_n)
    if has_edge:
        de_bias = next(i).astype(e_bias.dtype)
        de_val = next(i)
        de_gate = (next(i).astype(e_gate.dtype) if has_gate
                   else jnp.zeros_like(e_gate))
    else:
        de_bias = jnp.zeros_like(e_bias)
        de_val = jnp.zeros_like(e_val)
        de_gate = jnp.zeros_like(e_gate)
    return (dq, dk, dv, dgate, de_bias, de_val, de_gate,
            jnp.zeros_like(keep), jnp.zeros_like(src),
            jnp.zeros_like(dst))


_tile_core.defvjp(_tile_core_fwd, _tile_core_bwd)


def gt_attention_tile(
    q: jnp.ndarray,              # [Np, hidden]
    k: jnp.ndarray,
    v: jnp.ndarray,
    edge_src: jnp.ndarray,       # [Ep] int32, tile-packed layout
    edge_dst: jnp.ndarray,       # [Ep] int32, tile-packed layout
    num_heads: int,
    tile_edges: int,
    e_bias: Optional[jnp.ndarray] = None,        # [Ep, H]
    e_val: Optional[jnp.ndarray] = None,         # [Ep, hidden]
    gate_n: Optional[jnp.ndarray] = None,        # [Np, hidden]
    e_gate_logits: Optional[jnp.ndarray] = None,  # [Ep, H]
    aggregators: Sequence[str] = ("sum",),
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    tiles_per_step: int = 8,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Tile-fused gt_attention (same contract as the lax path; requires
    a tile-packed batch). Returns (node_out [Np, hidden*A] in reference
    [h][a][d] layout, eij [Ep, hidden] or None)."""
    from ..attention import interleave_cols

    npad, hidden = q.shape
    ep = edge_src.shape[0]
    if npad % NT != 0 or ep % tile_edges != 0 \
            or npad // NT != ep // tile_edges:
        raise ValueError(
            f"batch is not tile-packed for tile_edges={tile_edges}: "
            f"Np={npad}, Ep={ep}")
    aggs = tuple("sum" if a == "add" else a for a in aggregators)
    unsupported = [a for a in aggs if a not in ("sum", "mean")]
    if unsupported:
        raise NotImplementedError(
            f"gt_attention_tile supports sum/mean aggregators, got "
            f"{unsupported}")

    heads = num_heads
    dh = hidden // heads
    has_gate = gate_n is not None
    has_edge = e_val is not None
    g_fwd = _pick_tiles_per_step(npad // NT, int(tile_edges),
                                 int(tiles_per_step))
    g_bwd = _pick_tiles_per_step(npad // NT, int(tile_edges),
                                 max(1, int(tiles_per_step) // 2))
    cfg = (heads, dh, int(tile_edges), aggs, has_gate, has_edge,
           g_fwd, g_bwd)

    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate,
            (ep, heads)).astype(jnp.float32) / (1.0 - dropout_rate)
    else:
        keep = jnp.ones((ep, heads), jnp.float32)

    dummy = jnp.zeros((1,), q.dtype)
    out, eij = _tile_core(
        cfg, q, k, v,
        gate_n if has_gate else dummy,
        e_bias if has_edge else dummy,
        e_val if has_edge else dummy,
        (e_gate_logits if (has_edge and has_gate) else dummy),
        keep, edge_src.astype(jnp.int32), edge_dst.astype(jnp.int32))

    if len(aggs) > 1:
        out = interleave_cols(out, heads, dh, len(aggs))
    return out, (eij if has_edge else None)
