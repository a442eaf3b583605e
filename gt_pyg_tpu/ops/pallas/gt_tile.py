"""Fused per-tile Pallas kernel for GTConv message passing (v4).

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

v3 structural changes over v2 (each measured against a device profile
of the v2 flagship step):

* **Merged operand/cotangent buffers.** The kernel consumes the merged
  projection outputs directly — ``qkvg [Np, (3+gate)·hidden]`` and
  ``e_all [Ep, hidden + (1+gate)·H]`` — and slices per-tensor views in
  VMEM. The v2 interface took q/k/v/gate/e_bias/e_val/e_gate as seven
  arrays, which forced XLA to materialize slice fusions over HBM
  (~1.6 ms/step on the flagship batch) just to split the merged matmul
  outputs, plus concat fusions on the backward to reassemble the
  merged-projection cotangent. The VJP likewise emits single merged
  ``dqkvg`` / ``de_all`` buffers.

* **Concatenated gathers/scatters.** K/V/gate share the source-side
  indicator, so they gather as ONE ``[TE,NT] @ [NT, (2+gate)·hidden]``
  matmul (and their gradients scatter as one contraction). Fewer,
  wider MXU issues — the v2 kernel was issue-bound, not FLOP-bound.

* **Per-destination-node softmax shift (v4).** v3 shipped ONE shift
  per (tile, head); mathematically exact by shift-invariance, but
  trained models carry pre-softmax logits of O(1e4-1e5) (WE_logits
  reads the raw residual edge stream) and exp(l - tile_max) underflowed
  every node whose own max sat > ~87 below the tile max — 35-47% of
  nodes on the round-2 production checkpoint, zero attention rows AND
  zero softmax gradients (RESULTS.md round 3). v4 computes an exact
  per-node shift: per head, a masked [TE,NT] column max + an exact
  one-hot select-sum gather back to edge rows (f32 VPU).

* **Softmax residuals saved for the backward (v4).** The forward emits
  p [Ep,H] and den/deg [Np,H+1] f32 as custom-VJP residuals, so the
  backward skips the masked-max loop, the exp, and the denominator
  scatter — and alpha = p/den comes from one consistent forward
  evaluation (recomputing p against a loaded denominator leaks ~0.1%
  of the cotangent through the broken softmax-VJP cancellation).

* **Division after the scatter.** ``Σ α·m = (Σ p·m)/denom`` per
  destination node, so the forward divides by the per-node denominator
  once on the node side ([NT,H] broadcast) instead of gathering the
  denominator back to every edge. (The backward still gathers it back
  — it needs per-edge alpha for the softmax VJP.)

* **Dropout bits in-kernel.** The caller passes raw uint32 random bits
  ``[Ep, H]``; the keep mask (compare + scale) is computed in VMEM.
  v2 materialized an f32 keep mask through an XLA u32→f32 divide
  fusion per layer (~0.2 ms each).

* **Aggregator-major output.** The kernel writes ``[a][h][d]`` column
  order; callers that need the reference ``[h][a][d]`` layout permute
  the rows of the CONSUMING projection's weight instead of relayouting
  activations every step (`ops.attention.interleave_perm`).

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

from ...data.graph import TILE_NODES

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
# Matmul-dtype policy (md): when the model computes in bf16, EVERY wide
# dot in the kernel runs single-pass bf16 with f32 accumulation — the
# indicator matrices are one-hot (exact in bf16) so gathers/broadcasts
# stay exact and scatters round their f32 values once, exactly like any
# other bf16 matmul in the net. When the model computes in f32 the
# kernel is bit-faithful (HIGHEST everywhere) for golden-parity tests.
#
# Softmax-chain precision: the [·,H]-shaped f32 contractions (logit
# head-reduce, denominator sum and its gather-back/broadcast, softmax
# VJP sum) must NOT drop to one-pass bf16 — a bf16-rounded denominator
# perturbs every alpha and a bf16 softmax-VJP sum loses the
# peaked-attention cancellation; both measured as bf16 TRAINING
# divergence at lr=1e-3 (loss climbs, NaN by ~step 40) with the lax
# path healthy on the identical stream. In bf16 mode the strategy is
# tiered via GT_TPU_SOFT_PREC (see _soft_mode; Mosaic lowers only
# DEFAULT and HIGHEST — HIGH is rejected): 'split2' (production
# default) splits the value operand into bf16 hi+lo single-pass dots,
# 'highest' runs the 6-pass f32-exact dots, 'default' is single-pass
# bf16 (measurement only). f32 compute always pins HIGHEST.
def _mm_dtype(dtype):
    return dtype if dtype == jnp.bfloat16 else _F32


def _prec(a, b):
    if a.dtype == _F32 and b.dtype == _F32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def _dot(a, b):
    return jax.lax.dot(a, b, preferred_element_type=_F32,
                       precision=_prec(a, b))


def _soft_mode(md):
    # Softmax-chain f32 dot strategy. Mosaic lowers only DEFAULT and
    # HIGHEST (HIGH is rejected), and HIGHEST is 6 MXU passes. NOTE the
    # lanes: these dots are [·,H]-"narrow" but H pads to 128 lanes, so
    # each costs as much as a full [·,128]-wide matmul ×passes — a large
    # share of the kernel's MXU issue load. Modes (GT_TPU_SOFT_PREC, in
    # bf16 compute only; f32 compute is always bit-faithful HIGHEST):
    #   highest (default) — 6-pass, f32-exact products;
    #   split2            — the VALUE operand splits into bf16 hi+lo
    #                       single-pass dots (other operand is one-hot /
    #                       bf16-exact): ~2^-16 relative product error
    #                       at 1/3 the passes;
    #   default           — single-pass bf16 (0.4% relative rounding on
    #                       p/alpha — measurement mode).
    # split2 is the bf16 production default: measured 43.75 vs 45.44
    # ms/step on the flagship bench with equal-or-better convergence
    # (deterministic eval loss 0.87 vs 0.90 after 200 steps); 'default'
    # measured 44.0 ms with worse convergence (1.10).
    import os

    if md == jnp.bfloat16:
        m = os.environ.get("GT_TPU_SOFT_PREC", "split2").lower()
        if m in ("default", "split2"):
            return m
    return "highest"


def _split2(vals, other):
    hi = vals.astype(jnp.bfloat16)
    lo = (vals - hi.astype(_F32)).astype(jnp.bfloat16)
    return hi, lo, other.astype(jnp.bfloat16)


def _dot_soft(a, b, md, values="lhs"):
    """f32 dot on the softmax chain; ``values`` names the operand that
    carries real values (the other is a one-hot indicator / bf16-exact
    head matrix). See :func:`_soft_mode`."""
    mode = _soft_mode(md)
    if mode == "highest":
        return jax.lax.dot(a, b, preferred_element_type=_F32,
                           precision=jax.lax.Precision.HIGHEST)
    if mode == "default":
        return jax.lax.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                           preferred_element_type=_F32)
    if values == "lhs":
        hi, lo, bb = _split2(a, b)
        return (jax.lax.dot(hi, bb, preferred_element_type=_F32)
                + jax.lax.dot(lo, bb, preferred_element_type=_F32))
    hi, lo, aa = _split2(b, a)
    return (jax.lax.dot(aa, hi, preferred_element_type=_F32)
            + jax.lax.dot(aa, lo, preferred_element_type=_F32))


def _dot_t_soft(a, b, md):
    """Edge-axis contraction (scatter) on the softmax chain: ``a`` is
    the one-hot destination indicator, ``b`` carries the values."""
    mode = _soft_mode(md)
    if mode == "highest":
        return _dot_t(a, b, jax.lax.Precision.HIGHEST)
    if mode == "default":
        return _dot_t(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                      jax.lax.Precision.DEFAULT)
    hi, lo, aa = _split2(b, a)
    return (_dot_t(aa, hi, jax.lax.Precision.DEFAULT)
            + _dot_t(aa, lo, jax.lax.Precision.DEFAULT))


def _shift_gather_mode():
    import os

    # Default reverted to "select" in round 5: the matmul shift gather
    # wins 0.7 ms/step (43.25 vs 43.92 ms) but every round-4 sweep row
    # that trained under it showed worse 200-step deterministic eval
    # loss (runs/sweep_r4.jsonl: 0.90-0.93 vs 0.805 for select) and it
    # is a named suspect in the round-4 ensemble regression. The
    # trained-horizon A/B (tools/r5_queue_stage1.sh) decides whether
    # matmul is re-promoted; until the data supports it, a default that
    # touches training numerics stays on the exact path.
    return os.environ.get("GT_TPU_SHIFT", "select").lower()


def _dot_gather_shift(sd, vals_t, md):
    """Gather per-node shift values back to edge rows as ONE MXU matmul
    over all heads: sd [TE, NT] one-hot × vals_t [H, NT] → [TE, H].

    Exactness analysis (v5): the one-hot row-select makes every product
    either 0 or the node's value, so f32-HIGHEST is bit-exact. In bf16
    compute the value operand splits hi+lo (two single-pass dots): the
    gathered shift carries ~2^-16 RELATIVE error, but the SAME rounded
    value reaches every edge of the node — and a per-node-constant shift
    error cancels between softmax numerator and denominator (alpha is
    shift-invariant), so the only hazard is exp overflow, which needs
    |logit| ≳ 1e6·88 — far beyond trained scales. Single-pass bf16 would
    NOT be safe (0.4% of a 1e5-scale shift ≈ e^400 overflow), so this
    site ignores GT_TPU_SOFT_PREC=default."""
    vals = vals_t.T                             # [NT, H]
    if md != jnp.bfloat16:
        return jax.lax.dot(sd, vals, preferred_element_type=_F32,
                           precision=jax.lax.Precision.HIGHEST)
    hi = vals.astype(jnp.bfloat16)
    lo = (vals - hi.astype(_F32)).astype(jnp.bfloat16)
    sdb = sd.astype(jnp.bfloat16)
    return (jax.lax.dot(sdb, hi, preferred_element_type=_F32)
            + jax.lax.dot(sdb, lo, preferred_element_type=_F32))


def _dot_logits(a, b):
    """The pre-softmax logit head-reduce stays HIGHEST regardless of the
    GT_TPU_SOFT_PREC toggle: its operands are O(10-100) QK products and
    a single-pass bf16 truncation injects O(1) ABSOLUTE logit noise —
    comparable to real inter-edge logit differences. The toggleable
    sites only touch p in (0,1] (denominators/broadcasts) or gradient
    values, where the rounding is benign relative noise."""
    return jax.lax.dot(a, b, preferred_element_type=_F32,
                       precision=jax.lax.Precision.HIGHEST)


def _dot_t(a, b, prec):
    """Contract over the (leading) edge axis: a [E, N], b [E, F] ->
    [N, F]. The TPU-native scatter: an MXU matmul with lhs-transposed
    dimension numbers instead of an XLA scatter."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=_F32,
        precision=prec)


# cfg tuple (the view a kernel body sees — nt is always LAST):
#   (heads, dh, te, aggs, has_gate, has_edge, drop_rate, g_tiles, nt)
#
# Each grid step processes ``g_tiles`` (G) consecutive tiles with a
# static inner loop: per-step Mosaic control overhead (~µs) was
# measured to dominate the kernel at G=1 (2048 grid invocations per
# 4-layer step against a ~3 ms matmul floor), and the per-tile matmul
# shapes are unchanged, so amortizing the overhead G× is pure win as
# long as the G-tile working set fits VMEM.
#
# ``nt`` (node rows per tile) defaults to 128 = the TPU lane width; 256
# is the round-5 "multi-graph node tile" layout — roughly half the
# tiles (and kernel issues) per batch at 2x the one-hot incidence
# FLOPs, probing whether the measured MXU-issue-bound step trades FLOPs
# for issue count profitably.
def _recompute_tile(cfg, refs, en, nn_, base, iota, qkvg=None,
                    e_all=None, md=None):
    """Shared fwd/bwd-recompute stage. Returns a dict of per-tile
    intermediates (all f32 unless noted).

    ``qkvg``/``e_all`` default to slices of HBM-resident input refs (the
    v4 interface); the projection-fused v5 kernel passes them as VMEM
    VALUES it just computed from the residual streams."""
    heads, dh, te, aggs, has_gate, has_edge, drop_rate = cfg[:7]
    nt = iota.shape[1]
    hidden = heads * dh
    scale = 1.0 / math.sqrt(dh)

    if md is None:
        md = _mm_dtype(refs["qkvg"].dtype)

    sl = refs["src"][en] - base                 # [TE, 1] tile-local
    dl = refs["dst"][en] - base
    ss_b = sl == iota                           # [TE, NT]
    sd_b = dl == iota
    ss_m, sd_m = ss_b.astype(md), sd_b.astype(md)

    if qkvg is None:
        qkvg = refs["qkvg"][nn_].astype(md)     # [NT, (3+gate)·hidden]
    q_e = _dot(sd_m, qkvg[:, :hidden])          # [TE, hidden] f32
    kvg_e = _dot(ss_m, qkvg[:, hidden:])        # [TE, (2+gate)·hidden]
    k_e = kvg_e[:, :hidden]
    v_e = kvg_e[:, hidden:2 * hidden]

    prod = q_e * k_e * scale
    S_m_raw = refs["s_head"][:]
    logits = _dot_logits(prod, S_m_raw)         # [TE, H] f32

    e_val = None
    if has_edge:
        if e_all is None:
            e_all = refs["e_all"][en]
        e_val = e_all[:, :hidden].astype(_F32)
        logits = logits + e_all[:, hidden:hidden + heads].astype(_F32)
        v_msg = v_e + e_val
    else:
        v_msg = v_e
    sig_g = None
    if has_gate:
        sig_g = jax.nn.sigmoid(kvg_e[:, 2 * hidden:])
        v_base = v_msg
        v_msg = v_msg * sig_g
    else:
        v_base = v_msg
    sig_eg = None
    logits_pre = logits
    if has_gate and has_edge:
        sig_eg = jax.nn.sigmoid(
            e_all[:, hidden + heads:].astype(_F32))
        logits = logits * sig_eg

    # Per-DESTINATION-NODE softmax shift. v3 used one shift per
    # (tile, head) — shift-invariance makes that mathematically exact,
    # but numerically exp(l - tile_max) underflows to 0 for every node
    # whose own max logit sits > ~87 below the tile max, zeroing that
    # node's whole attention row AND its softmax gradient. Harmless at
    # init (logits are O(1)), catastrophic at trained weights: the
    # pre-softmax logits include WE_logits(raw residual edge stream),
    # which training grows to O(1e4-1e5); measured on the round-2
    # production checkpoint, 35-47% of nodes in layers 1-3 underflowed,
    # deviating the tile forward from the lax forward by up to 0.54
    # LogD units and costing ~7% val RAE (RESULTS.md round 3).
    #
    # Per head: a masked [TE, NT] column max, then an EXACT one-hot
    # select-sum gather back to edge rows (f32 VPU — matmul gathers
    # would round the shift to bf16, and a 0.4% error on a 1e5-scale
    # shift re-introduces exp overflow).
    valid = (dl >= 0) & (dl < nt)               # [TE, 1]
    logits = jnp.where(valid, logits, _NEG_INF)
    sd_f = sd_b.astype(_F32)
    if "p_saved" in refs:
        # backward pass: the forward saved the softmax numerators p and
        # the denominator/degree sums as residuals — the masked-max
        # loop, the exp, and the denominator scatter all disappear, AND
        # alpha = p/den comes entirely from one consistent forward
        # evaluation. (Recomputing p against a LOADED denominator broke
        # the exact softmax-VJP cancellation: the recomputed logits
        # differ from the forward's by ULPs — 1e-3 absolute at 1e4
        # logit scale — so alpha for a single-edge node came out
        # 1±1e-3 instead of exactly 1, leaking ~0.1% of the incoming
        # cotangent into every e_bias gradient.)
        p = refs["p_saved"][en].astype(_F32)
        den_deg = refs["den_deg"][nn_].astype(_F32)
    else:
        m_cols = []
        for hh in range(heads):
            m_cols.append(jnp.max(
                jnp.where(sd_b, logits[:, hh:hh + 1], _NEG_INF),
                axis=0, keepdims=True))         # [1, NT] node maxes
        m_node_t = jnp.concatenate(m_cols, axis=0)      # [H, NT]
        if _shift_gather_mode() == "select":
            # v4 gather: exact per-head one-hot select-sums (f32 VPU) —
            # the default; ~2x the VPU passes of the matmul gather but
            # bit-exact (see _shift_gather_mode for the A/B evidence)
            s_edge = jnp.concatenate(
                [jnp.sum(jnp.where(sd_b, m_node_t[hh:hh + 1, :], 0.0),
                         axis=1, keepdims=True)
                 for hh in range(heads)], axis=1)       # [TE, H]
        else:
            s_edge = _dot_gather_shift(sd_f, m_node_t, md)
        # valid rows have s_edge >= their logit - eps (own edge
        # participates in the node max; the bf16 matmul gather can be
        # ~2^-16 relative off, uniformly per node) so p <= ~1; padding
        # rows gathered s=0 and logits=-inf
        p = jnp.exp(logits - s_edge)            # [TE, H]; padding -> 0
        # node degree rides the denominator contraction as an extra
        # lane column (both outputs are lane-padded to 128 anyway)
        aug = jnp.concatenate([p, jnp.ones((te, 1), _F32)], axis=1)
        den_deg = _dot_t_soft(sd_f, aug, md)    # [NT, H+1]
    denom = den_deg[:, :heads]
    deg = (jnp.maximum(den_deg[:, heads:heads + 1], 1.0)
           if "mean" in aggs else None)

    keep = None
    if drop_rate > 0.0:
        # reproduce jax.random.bernoulli(key, 1-rate) bit-for-bit from
        # the raw key-stream bits (uniform's f32 construction is
        # bitcast((bits >> 9) | 0x3F800000) - 1.0), so the mask
        # placement is identical to the lax path under the same key
        bits = refs["bits"][en]                 # [TE, H] uint32
        fb = (bits >> 9) | jnp.uint32(0x3F800000)
        u = jax.lax.bitcast_convert_type(fb, _F32) - 1.0
        keep = jnp.where(u < (1.0 - drop_rate),
                         1.0 / (1.0 - drop_rate), 0.0)

    return dict(ss_m=ss_m, sd_m=sd_m, sd_f=sd_f, md=md, q_e=q_e,
                k_e=k_e, v_e=v_e, kvg_e=kvg_e, prod=prod,
                logits_pre=logits_pre, e_val=e_val, v_base=v_base,
                v_msg=v_msg, sig_g=sig_g, sig_eg=sig_eg, p=p,
                denom=denom, deg=deg, keep=keep, S_m_raw=S_m_raw,
                scale=scale, den_deg=den_deg)


def _fwd_body(cfg, refs):
    heads, dh, te, aggs, has_gate, has_edge, drop_rate, g_tiles, nt = cfg
    hidden = heads * dh
    iota = jax.lax.broadcasted_iota(jnp.int32, (te, nt), 1)

    for g in range(g_tiles):
        en = pl.ds(g * te, te)                  # edge-row window
        nn_ = pl.ds(g * nt, nt)                 # node-row window
        base = (pl.program_id(0) * g_tiles + g) * nt
        t = _recompute_tile(cfg, refs, en, nn_, base, iota)
        md = t["md"]

        if has_edge:
            refs["eij"][en] = (t["prod"] * t["e_val"]).astype(
                refs["eij"].dtype)
        if "p_out" in refs:
            refs["p_out"][en] = t["p"]
            refs["den_deg_out"][nn_] = t["den_deg"]

        p_keep = t["p"] if t["keep"] is None else t["p"] * t["keep"]
        # numerator: scatter p·m, divide by the denominator node-side
        S_m = t["S_m_raw"].astype(md)
        msg = _dot(p_keep.astype(md), S_m.T) * t["v_msg"]   # [TE, hidden]
        sum_pre = _dot_t(t["sd_m"], msg.astype(md), _prec(S_m, S_m))
        denom_bc = _dot_soft(t["denom"], t["S_m_raw"].T, md) \
            + _SOFTMAX_EPS                                  # [NT, hidden]
        sum_out = sum_pre / denom_bc

        outs = []
        for a in aggs:
            if a == "sum":
                outs.append(sum_out)
            elif a == "mean":
                outs.append(sum_out / t["deg"])
        out = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
        refs["out"][nn_] = out.astype(refs["out"].dtype)


def _bwd_body(cfg, refs):
    heads, dh, te, aggs, has_gate, has_edge, drop_rate, g_tiles, nt = cfg
    hidden = heads * dh
    iota = jax.lax.broadcasted_iota(jnp.int32, (te, nt), 1)

    for g in range(g_tiles):
        en = pl.ds(g * te, te)
        nn_ = pl.ds(g * nt, nt)
        base = (pl.program_id(0) * g_tiles + g) * nt
        t = _recompute_tile(cfg, refs, en, nn_, base, iota)
        md = t["md"]
        S_m = t["S_m_raw"].astype(md)
        sd_f = t["sd_f"]

        # the backward needs per-edge alpha explicitly (softmax VJP)
        den_e = _dot_soft(sd_f, t["denom"], md,
                          values="rhs") + _SOFTMAX_EPS      # [TE, H]
        alpha_raw = t["p"] / den_e
        alpha = alpha_raw if t["keep"] is None else alpha_raw * t["keep"]
        alpha_full = _dot(alpha.astype(md), S_m.T)          # [TE, hidden]

        # fold aggregator cotangents into one per-node message gradient
        g_node = jnp.zeros((nt, hidden), _F32)
        off = 0
        for a in aggs:
            piece = refs["g_out"][nn_, off:off + hidden].astype(_F32)
            if a == "sum":
                g_node = g_node + piece
            elif a == "mean":
                g_node = g_node + piece / t["deg"]
            off += hidden

        g_msg = _dot(t["sd_m"], g_node.astype(md))          # [TE, hidden]
        g_alpha_full = g_msg * t["v_msg"]
        g_v_msg = alpha_full * g_msg

        g_alpha = _dot_soft(g_alpha_full, t["S_m_raw"], md)  # [TE, H]
        g_alpha_raw = g_alpha if t["keep"] is None else g_alpha * t["keep"]
        # softmax VJP within segments: a * (g - sum_seg(a * g)). The
        # subtraction CANCELS when attention is peaked (alpha ~ 1 on one
        # edge makes g and the segment sum nearly equal), so the sum and
        # its gather-back stay f32 (HIGH — see precision note).
        t_e = alpha_raw * g_alpha_raw
        t_n = _dot_t_soft(sd_f, t_e, md)                    # [NT, H]
        g_logits = alpha_raw * (g_alpha_raw
                                - _dot_soft(sd_f, t_n, md, values="rhs"))

        if has_gate and has_edge:
            g_logits_pre = g_logits * t["sig_eg"]
            de_gate = (g_logits * t["logits_pre"] * t["sig_eg"]
                       * (1.0 - t["sig_eg"]))
        else:
            g_logits_pre = g_logits
            de_gate = None

        g_prod = _dot(g_logits_pre.astype(md), S_m.T)       # [TE, hidden]
        if has_edge:
            g_eij = refs["g_eij"][en].astype(_F32)
            g_prod = g_prod + g_eij * t["e_val"]
            g_e_val = g_eij * t["prod"]
        if has_gate:
            g_v_base = g_v_msg * t["sig_g"]
            g_gate_e = g_v_msg * t["v_base"] * t["sig_g"] \
                * (1.0 - t["sig_g"])
        else:
            g_v_base = g_v_msg
            g_gate_e = None

        g_q_e = g_prod * t["k_e"] * t["scale"]
        g_k_e = g_prod * t["q_e"] * t["scale"]

        # one destination-side scatter (dq) + one source-side scatter
        # (dk|dv|dgate), written as a single merged cotangent buffer
        dq = _dot_t(t["sd_m"], g_q_e.astype(md), _prec(S_m, S_m))
        kv_grads = [g_k_e, g_v_base]
        if has_gate:
            kv_grads.append(g_gate_e)
        dkvg = _dot_t(t["ss_m"],
                      jnp.concatenate(kv_grads, axis=1).astype(md),
                      _prec(S_m, S_m))
        refs["dqkvg"][nn_] = jnp.concatenate(
            [dq, dkvg], axis=1).astype(refs["dqkvg"].dtype)

        if has_edge:
            de_parts = [g_e_val + g_v_base, g_logits_pre]
            if has_gate:
                de_parts.append(de_gate)
            refs["de_all"][en] = jnp.concatenate(
                de_parts, axis=1).astype(refs["de_all"].dtype)


def _edge_block(cfg, width):
    te, g = cfg[2], cfg[7]
    return pl.BlockSpec((g * te, width), lambda t: (t, 0),
                        memory_space=pltpu.VMEM)


def _node_block(cfg, width):
    g, nt = cfg[7], cfg[-1]     # nt is LAST in every body-cfg form
    return pl.BlockSpec((g * nt, width), lambda t: (t, 0),
                        memory_space=pltpu.VMEM)


def _collect_inputs(cfg, qkvg, e_all, bits, src, dst):
    heads, dh, te, aggs, has_gate, has_edge, drop_rate, g_tiles, nt = cfg
    hidden = heads * dh
    names = ["qkvg"]
    arrays = [qkvg]
    specs = [_node_block(cfg, hidden * (3 + has_gate))]
    if has_edge:
        names.append("e_all")
        arrays.append(e_all)
        specs.append(_edge_block(cfg, hidden + heads * (1 + has_gate)))
    if drop_rate > 0.0:
        names.append("bits")
        arrays.append(bits)
        specs.append(_edge_block(cfg, heads))
    names += ["src", "dst", "s_head"]
    arrays += [src.reshape(-1, 1), dst.reshape(-1, 1),
               jnp.asarray(_head_indicator(heads, dh))]
    specs += [_edge_block(cfg, 1), _edge_block(cfg, 1),
              pl.BlockSpec((hidden, heads), lambda t: (0, 0),
                           memory_space=pltpu.VMEM)]
    return names, arrays, specs


def _cost(cfg, npad, ep, n_big_matmuls):
    heads, dh, te, nt = cfg[0], cfg[1], cfg[2], cfg[-1]
    hidden = heads * dh
    n_tiles = npad // nt
    per_tile = n_big_matmuls * 2 * te * nt * hidden
    return pl.CostEstimate(
        flops=n_tiles * per_tile,
        bytes_accessed=(npad * hidden * 4 * 4 + ep * hidden * 4 * 2),
        transcendentals=n_tiles * te * heads,
    )


def _resolve_tiles_g(tiles_per_step, nt=TILE_NODES):
    """Default fwd tiles-per-grid-step (bwd uses half): 8 at nt=128
    unless the GT_TPU_TILES_G env knob overrides (sweepable without
    model args). Larger node tiles scale the per-tile working set
    ~(nt/128)^2 (the [TE, NT] indicators dominate), so the default
    shrinks accordingly to stay inside scoped VMEM."""
    import os

    if tiles_per_step is not None:
        return int(tiles_per_step)
    env = os.environ.get("GT_TPU_TILES_G")
    if env is not None:
        return int(env)
    return max(1, (8 * 128 * 128) // (int(nt) * int(nt)))


def _pick_tiles_per_step(n_tiles: int, want: int) -> int:
    """Largest divisor of n_tiles that is <= want (grid length must be
    integral; packing rounds tile counts to ``tiles_multiple`` so the
    preferred G usually divides exactly)."""
    g = max(1, min(want, n_tiles))
    while n_tiles % g:
        g -= 1
    return g


def _run_fwd(cfg, qkvg, e_all, bits, src, dst, save_soft):
    """Forward pallas_call. With ``save_soft`` the kernel additionally
    emits the per-edge softmax shift and per-node denominator/degree
    sums so the backward can skip recomputing them (the masked-max loop
    and the denominator scatter are the expensive parts of the softmax
    chain; the extra HBM traffic is ~4 MB/layer)."""
    heads, dh, te, aggs, has_gate, has_edge, drop_rate, g_tiles, nt = cfg
    hidden = heads * dh
    npad, ep = qkvg.shape[0], src.shape[0]
    n_tiles = npad // nt

    names, arrays, in_specs = _collect_inputs(cfg, qkvg, e_all, bits,
                                              src, dst)
    out_shapes = [jax.ShapeDtypeStruct((npad, hidden * len(aggs)),
                                       qkvg.dtype)]
    out_specs = [_node_block(cfg, hidden * len(aggs))]
    out_names = ["out"]
    if has_edge:
        out_shapes.append(jax.ShapeDtypeStruct((ep, hidden), qkvg.dtype))
        out_specs.append(_edge_block(cfg, hidden))
        out_names.append("eij")
    if save_soft:
        out_shapes.append(jax.ShapeDtypeStruct((ep, heads), _F32))
        out_specs.append(_edge_block(cfg, heads))
        out_names.append("p_out")
        out_shapes.append(jax.ShapeDtypeStruct((npad, heads + 1), _F32))
        out_specs.append(_node_block(cfg, heads + 1))
        out_names.append("den_deg_out")

    def body(*refs):
        _fwd_body(cfg, dict(zip(names + out_names, refs)))

    res = pl.pallas_call(
        body,
        grid=(n_tiles // g_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=_cost(cfg, npad, ep, 5 + has_gate),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,),
            # f32 (golden-parity) runs at G=8 need ~18MB scoped VMEM —
            # over the 16MB default; v5e has 128MB physical
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_should_interpret(),
    )(*arrays)
    out = res[0]
    eij = res[1] if has_edge else jnp.zeros((0,), qkvg.dtype)
    extras = res[-2:] if save_soft else (None, None)
    return out, eij, extras


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tile_core(cfg, qkvg, e_all, bits, src, dst):
    """Fused forward. Returns (out [Np, hidden*A] aggregator-major
    [a][h][d] layout, eij [Ep, hidden] or a 0-element placeholder).
    Inactive optional args are 1-element dummies (cfg flags gate which
    reach the kernel).

    ``cfg`` is a 10-tuple (heads, dh, te, aggs, has_gate, has_edge,
    drop_rate, g_fwd, g_bwd, nt); the fwd/bwd kernels run with their
    own tiles-per-step (the bwd working set is ~2x the fwd's, so it
    uses a smaller G to stay inside scoped VMEM)."""
    cfg9 = cfg[:7] + (cfg[7], cfg[9])  # body view with G = g_fwd
    out, eij, _ = _run_fwd(cfg9, qkvg, e_all, bits, src, dst,
                           save_soft=False)
    return out, eij


def _tile_core_fwd(cfg, qkvg, e_all, bits, src, dst):
    cfg9 = cfg[:7] + (cfg[7], cfg[9])
    out, eij, (p_saved, den_deg) = _run_fwd(cfg9, qkvg, e_all, bits, src,
                                            dst, save_soft=True)
    return (out, eij), (qkvg, e_all, bits, src, dst, p_saved, den_deg)


def _tile_core_bwd(cfg, residuals, cotangents):
    cfg = cfg[:7] + (cfg[8], cfg[9])   # body view with G = g_bwd
    heads, dh, te, aggs, has_gate, has_edge, drop_rate, g_tiles, nt = cfg
    hidden = heads * dh
    qkvg, e_all, bits, src, dst, p_saved, den_deg = residuals
    g_out, g_eij = cotangents
    npad, ep = qkvg.shape[0], src.shape[0]
    n_tiles = npad // nt

    names, arrays, in_specs = _collect_inputs(cfg, qkvg, e_all, bits,
                                              src, dst)
    names += ["p_saved", "den_deg"]
    arrays += [p_saved, den_deg]
    in_specs += [_edge_block(cfg, heads), _node_block(cfg, heads + 1)]
    names.append("g_out")
    arrays.append(g_out.astype(qkvg.dtype))
    in_specs.append(_node_block(cfg, hidden * len(aggs)))
    if has_edge:
        names.append("g_eij")
        arrays.append(g_eij.astype(qkvg.dtype))
        in_specs.append(_edge_block(cfg, hidden))

    out_shapes = [jax.ShapeDtypeStruct((npad, hidden * (3 + has_gate)),
                                       qkvg.dtype)]
    out_specs = [_node_block(cfg, hidden * (3 + has_gate))]
    out_names = ["dqkvg"]
    if has_edge:
        w = hidden + heads * (1 + has_gate)
        # emit in e_all.dtype (f32 in bf16 mode): the edge stream's
        # logit-bias columns are deliberately f32 — routing their
        # cotangents through a bf16 output would round-trip them
        out_shapes.append(jax.ShapeDtypeStruct((ep, w), e_all.dtype))
        out_specs.append(_edge_block(cfg, w))
        out_names.append("de_all")

    def body(*refs):
        _bwd_body(cfg, dict(zip(names + out_names, refs)))

    res = pl.pallas_call(
        body,
        grid=(n_tiles // g_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=_cost(cfg, npad, ep, 10 + 2 * has_gate),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_should_interpret(),
    )(*arrays)

    dqkvg = res[0]
    de_all = res[1] if has_edge else jnp.zeros_like(e_all)
    return (dqkvg, de_all, jnp.zeros_like(bits), jnp.zeros_like(src),
            jnp.zeros_like(dst))


_tile_core.defvjp(_tile_core_fwd, _tile_core_bwd)


# ---------------------------------------------------------------------------
# v5: projection-fused kernel. The whole GTConv attention block —
# pre-norm-folded Q/K/V/gate and edge projections, the attention core,
# and the WO / WOe output projections — runs as ONE kernel per
# direction over the residual streams x [Np, Din] and e [Ep, De].
#
# What this removes vs v4 (per layer, per direction, flagship batch):
# the XLA projection matmul tier (measured 7.2 ms/step at 19% MFU in
# round 3) and the HBM round trips of qkvg [Np, (3+gate)·hidden],
# e_all [Ep, hidden+(1+gate)·H] (f32), out [Np, A·hidden] and
# eij [Ep, hidden] — the projections' operands (residual streams) are
# already the kernel's inputs, and the weights ([~0.3 MB total) ride
# VMEM as constant-index blocks.
#
# Precision contract (bf16 compute; f32 is HIGHEST everywhere):
# * qkvg is computed f32 (dot accum + folded f32 bias — the folded
#   x@(a·W) and b@W terms are large and CANCEL; bf16-rounding before
#   the add is the round-2 instability) and cast ONCE to bf16 — the
#   same values v4 read from the bf16 HBM buffer.
# * e_all stays f32 in VMEM: the logit-bias columns reach O(1e4-1e5)
#   at trained weights and never touch bf16 here (v4 stored them f32
#   in HBM for the same reason; v5 never stores them at all).
# * dx uses single-pass bf16 on dqkvg (v4 STORED dqkvg in bf16, so
#   this matches the status quo exactly); de / dW_e_all split the f32
#   de_all operand hi+lo (v4 stored de_all f32 — split2 keeps ~2^-16
#   relative instead of bf16's 0.4%).
# * weight/bias grads accumulate in f32 VMEM across a sequential grid
#   (the FFN kernel's reduction pattern).
#
# Reference roles fused here: gt_conv.py:289-303 (projections),
# :306-393 (propagate/message), :310-313 (WO), :333 (WOe).
# ---------------------------------------------------------------------------

# proj cfg (body view, 11-tuple — nt last, as everywhere):
#   (heads, dh, te, aggs, has_gate, has_edge, drop_rate, g_tiles,
#    din, de, nt)
def _proj_qkvg(cfg, refs, x_t, md):
    q = _dot(x_t, refs["w_qkvg"][:].astype(md)) \
        + refs["b_qkvg"][:].astype(_F32)
    return q.astype(md)


def _proj_eall(cfg, refs, e_t, md):
    return _dot(e_t, refs["w_eall"][:].astype(md)) \
        + refs["b_eall"][:].astype(_F32)        # stays f32


def _agg_out(cfg, t, md):
    """Recompute the aggregated node output [NT, hidden·A] (fwd math,
    shared by the fwd body and the WO weight-grad in the bwd body)."""
    heads, dh, te, aggs = cfg[0], cfg[1], cfg[2], cfg[3]
    hidden = heads * dh
    p_keep = t["p"] if t["keep"] is None else t["p"] * t["keep"]
    S_m = t["S_m_raw"].astype(md)
    msg = _dot(p_keep.astype(md), S_m.T) * t["v_msg"]
    sum_pre = _dot_t(t["sd_m"], msg.astype(md), _prec(S_m, S_m))
    denom_bc = _dot_soft(t["denom"], t["S_m_raw"].T, md) + _SOFTMAX_EPS
    sum_out = sum_pre / denom_bc
    outs = []
    for a in aggs:
        if a == "sum":
            outs.append(sum_out)
        elif a == "mean":
            outs.append(sum_out / t["deg"])
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


def _proj_fwd_body(cfg, refs):
    (heads, dh, te, aggs, has_gate, has_edge, drop_rate, g_tiles,
     din, de, nt) = cfg
    hidden = heads * dh
    iota = jax.lax.broadcasted_iota(jnp.int32, (te, nt), 1)
    md = _mm_dtype(refs["x"].dtype)

    for g in range(g_tiles):
        en = pl.ds(g * te, te)
        nn_ = pl.ds(g * nt, nt)
        base = (pl.program_id(0) * g_tiles + g) * nt
        x_t = refs["x"][nn_].astype(md)
        e_t = refs["e"][en].astype(md)
        qkvg = _proj_qkvg(cfg, refs, x_t, md)
        e_all = _proj_eall(cfg, refs, e_t, md)
        t = _recompute_tile(cfg, refs, en, nn_, base, iota, qkvg=qkvg,
                            e_all=e_all, md=md)

        eij = t["prod"] * t["e_val"]            # [TE, hidden] f32
        e_attn = _dot(eij.astype(md), refs["w_oe"][:].astype(md)) \
            + refs["b_oe"][:].astype(_F32)
        refs["e_attn"][en] = e_attn.astype(refs["e_attn"].dtype)

        if "p_out" in refs:
            refs["p_out"][en] = t["p"]
            refs["den_deg_out"][nn_] = t["den_deg"]

        out = _agg_out(cfg, t, md)              # [NT, hidden·A] f32
        attn = _dot(out.astype(md), refs["w_o"][:].astype(md)) \
            + refs["b_o"][:].astype(_F32)
        refs["attn_out"][nn_] = attn.astype(refs["attn_out"].dtype)


def _split2_dot(a_f32, b, dn=None):
    """f32 × bf16 dot with the f32 operand split hi+lo (2 single-pass
    bf16 dots, ~2^-16 relative)."""
    hi = a_f32.astype(jnp.bfloat16)
    lo = (a_f32 - hi.astype(_F32)).astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)
    if dn is None:
        return (jax.lax.dot(hi, bb, preferred_element_type=_F32)
                + jax.lax.dot(lo, bb, preferred_element_type=_F32))
    return (jax.lax.dot_general(hi, bb, dn, preferred_element_type=_F32)
            + jax.lax.dot_general(lo, bb, dn,
                                  preferred_element_type=_F32))


def _dot_mixed(a_f32, b, md, dn=None):
    """Contract an f32 VMEM value against weights/operands: split2 in
    bf16 mode, HIGHEST in f32 mode."""
    if md == jnp.bfloat16:
        return _split2_dot(a_f32, b, dn)
    if dn is None:
        return jax.lax.dot(a_f32, b.astype(_F32),
                           preferred_element_type=_F32,
                           precision=jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(a_f32, b.astype(_F32), dn,
                               preferred_element_type=_F32,
                               precision=jax.lax.Precision.HIGHEST)


# aᵀ @ b (contract both operands' dim 0) — the FFN kernel's proven
# weight-grad pattern on hardware Mosaic. Transposed-RHS contractions
# (a @ bᵀ) instead use an explicit .T on the (small, loop-invariant)
# weight value, matching the shipped kernels' S_m.T idiom.
_DN_ROWS = (((0,), (0,)), ((), ()))


def _proj_bwd_body(cfg, refs):
    (heads, dh, te, aggs, has_gate, has_edge, drop_rate, g_tiles,
     din, de, nt) = cfg
    hidden = heads * dh
    iota = jax.lax.broadcasted_iota(jnp.int32, (te, nt), 1)
    md = _mm_dtype(refs["x"].dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for nm in ("gw_qkvg", "gw_eall", "gw_o", "gw_oe"):
            refs[nm][:] = jnp.zeros_like(refs[nm])

    for g in range(g_tiles):
        en = pl.ds(g * te, te)
        nn_ = pl.ds(g * nt, nt)
        base = (pl.program_id(0) * g_tiles + g) * nt
        x_t = refs["x"][nn_].astype(md)
        e_t = refs["e"][en].astype(md)
        qkvg = _proj_qkvg(cfg, refs, x_t, md)
        e_all = _proj_eall(cfg, refs, e_t, md)
        t = _recompute_tile(cfg, refs, en, nn_, base, iota, qkvg=qkvg,
                            e_all=e_all, md=md)
        S_m = t["S_m_raw"].astype(md)
        sd_f = t["sd_f"]

        # ---- WO backward: g_out = g_attn @ WOᵀ; dWO += outᵀ g_attn
        g_attn = refs["g_attn_out"][nn_].astype(md)       # [NT, din]
        w_o = refs["w_o"][:]
        g_out_full = jax.lax.dot(
            g_attn, w_o.astype(md).T,
            preferred_element_type=_F32)                  # [NT, A·hidden]
        # v4 stored `out` in bf16 HBM before XLA's dWO matmul — the
        # md-cast single-pass here matches that status quo
        out = _agg_out(cfg, t, md)                        # f32
        refs["gw_o"][:hidden * len(aggs), :] += jax.lax.dot_general(
            out.astype(md), g_attn, _DN_ROWS,
            preferred_element_type=_F32, precision=_prec(g_attn, g_attn))
        refs["gw_o"][hidden * len(aggs):, :] += jnp.sum(
            g_attn.astype(_F32), axis=0, keepdims=True)

        # ---- WOe backward: g_eij = g_e_attn @ WOeᵀ; dWOe += eijᵀ g
        g_e_attn = refs["g_e_attn"][en].astype(md)        # [TE, de]
        w_oe = refs["w_oe"][:]
        g_eij = jax.lax.dot(
            g_e_attn, w_oe.astype(md).T,
            preferred_element_type=_F32)                  # [TE, hidden]
        eij = t["prod"] * t["e_val"]                      # v4: bf16 HBM
        refs["gw_oe"][:hidden, :] += jax.lax.dot_general(
            eij.astype(md), g_e_attn, _DN_ROWS,
            preferred_element_type=_F32, precision=_prec(g_e_attn,
                                                         g_e_attn))
        refs["gw_oe"][hidden:, :] += jnp.sum(
            g_e_attn.astype(_F32), axis=0, keepdims=True)

        # ---- attention core backward (v4 math on VMEM values) ----
        den_e = _dot_soft(sd_f, t["denom"], md,
                          values="rhs") + _SOFTMAX_EPS
        alpha_raw = t["p"] / den_e
        alpha = alpha_raw if t["keep"] is None else alpha_raw * t["keep"]
        alpha_full = _dot(alpha.astype(md), S_m.T)

        g_node = jnp.zeros((nt, hidden), _F32)
        off = 0
        for a in aggs:
            piece = g_out_full[:, off:off + hidden]
            if a == "sum":
                g_node = g_node + piece
            elif a == "mean":
                g_node = g_node + piece / t["deg"]
            off += hidden

        g_msg = _dot(t["sd_m"], g_node.astype(md))
        g_alpha_full = g_msg * t["v_msg"]
        g_v_msg = alpha_full * g_msg

        g_alpha = _dot_soft(g_alpha_full, t["S_m_raw"], md)
        g_alpha_raw = (g_alpha if t["keep"] is None
                       else g_alpha * t["keep"])
        t_e = alpha_raw * g_alpha_raw
        t_n = _dot_t_soft(sd_f, t_e, md)
        g_logits = alpha_raw * (g_alpha_raw
                                - _dot_soft(sd_f, t_n, md, values="rhs"))

        if has_gate:
            g_logits_pre = g_logits * t["sig_eg"]
            de_gate = (g_logits * t["logits_pre"] * t["sig_eg"]
                       * (1.0 - t["sig_eg"]))
        else:
            g_logits_pre = g_logits
            de_gate = None

        g_prod = _dot(g_logits_pre.astype(md), S_m.T)
        g_prod = g_prod + g_eij * t["e_val"]
        g_e_val = g_eij * t["prod"]
        if has_gate:
            g_v_base = g_v_msg * t["sig_g"]
            g_gate_e = g_v_msg * t["v_base"] * t["sig_g"] \
                * (1.0 - t["sig_g"])
        else:
            g_v_base = g_v_msg
            g_gate_e = None

        g_q_e = g_prod * t["k_e"] * t["scale"]
        g_k_e = g_prod * t["q_e"] * t["scale"]

        dq = _dot_t(t["sd_m"], g_q_e.astype(md), _prec(S_m, S_m))
        kv_grads = [g_k_e, g_v_base]
        if has_gate:
            kv_grads.append(g_gate_e)
        dkvg = _dot_t(t["ss_m"],
                      jnp.concatenate(kv_grads, axis=1).astype(md),
                      _prec(S_m, S_m))
        dqkvg = jnp.concatenate([dq, dkvg], axis=1)       # [NT, 3+g·hid]

        de_parts = [g_e_val + g_v_base, g_logits_pre]
        if has_gate:
            de_parts.append(de_gate)
        de_all = jnp.concatenate(de_parts, axis=1)        # [TE, w_e] f32

        # ---- projection backward ----
        w_qkvg = refs["w_qkvg"][:]
        # dqkvg was STORED bf16 by v4 before the XLA dx matmul — the
        # bf16 single-pass here matches that status quo bit-for-bit
        refs["dx"][nn_] = jax.lax.dot(
            dqkvg.astype(md), w_qkvg.astype(md).T,
            preferred_element_type=_F32).astype(refs["dx"].dtype)
        refs["gw_qkvg"][:din, :] += jax.lax.dot_general(
            x_t, dqkvg.astype(md), _DN_ROWS,
            preferred_element_type=_F32, precision=_prec(x_t, x_t))
        refs["gw_qkvg"][din:, :] += jnp.sum(dqkvg, axis=0, keepdims=True)

        w_eall = refs["w_eall"][:]
        refs["de"][en] = _dot_mixed(
            de_all, w_eall.T, md).astype(refs["de"].dtype)
        # dW_eall = eᵀ @ de_all with de_all f32: split2 keeps the f32
        # de_all fidelity v4 had (it stored de_all f32 for XLA)
        if md == jnp.bfloat16:
            hi = de_all.astype(jnp.bfloat16)
            lo = (de_all - hi.astype(_F32)).astype(jnp.bfloat16)
            gw_e = (jax.lax.dot_general(e_t, hi, _DN_ROWS,
                                        preferred_element_type=_F32)
                    + jax.lax.dot_general(e_t, lo, _DN_ROWS,
                                          preferred_element_type=_F32))
        else:
            gw_e = jax.lax.dot_general(
                e_t.astype(_F32), de_all, _DN_ROWS,
                preferred_element_type=_F32,
                precision=jax.lax.Precision.HIGHEST)
        refs["gw_eall"][:de, :] += gw_e
        refs["gw_eall"][de:, :] += jnp.sum(de_all, axis=0, keepdims=True)


def _weight_block(shape):
    return pl.BlockSpec(shape, lambda t: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _proj_collect(cfg, x, e, wq, bq, we, be, wo, bo, woe, boe, bits,
                  src, dst):
    (heads, dh, te, aggs, has_gate, has_edge, drop_rate, g_tiles,
     din, de, nt) = cfg
    hidden = heads * dh
    w_e = hidden + heads * (1 + has_gate)
    names = ["x", "e", "w_qkvg", "b_qkvg", "w_eall", "b_eall",
             "w_o", "b_o", "w_oe", "b_oe"]
    arrays = [x, e, wq, bq.reshape(1, -1), we, be.reshape(1, -1),
              wo, bo.reshape(1, -1), woe, boe.reshape(1, -1)]
    specs = [_node_block(cfg, din), _edge_block(cfg, de),
             _weight_block((din, hidden * (3 + has_gate))),
             _weight_block((1, hidden * (3 + has_gate))),
             _weight_block((de, w_e)), _weight_block((1, w_e)),
             _weight_block((hidden * len(aggs), din)),
             _weight_block((1, din)),
             _weight_block((hidden, de)), _weight_block((1, de))]
    if drop_rate > 0.0:
        names.append("bits")
        arrays.append(bits)
        specs.append(_edge_block(cfg, heads))
    names += ["src", "dst", "s_head"]
    arrays += [src.reshape(-1, 1), dst.reshape(-1, 1),
               jnp.asarray(_head_indicator(heads, dh))]
    specs += [_edge_block(cfg, 1), _edge_block(cfg, 1),
              pl.BlockSpec((hidden, heads), lambda t: (0, 0),
                           memory_space=pltpu.VMEM)]
    return names, arrays, specs


def _run_proj_fwd(cfg, x, e, wq, bq, we, be, wo, bo, woe, boe, bits,
                  src, dst, save_soft):
    (heads, dh, te, aggs, has_gate, has_edge, drop_rate, g_tiles,
     din, de, nt) = cfg
    hidden = heads * dh
    npad, ep = x.shape[0], src.shape[0]
    n_tiles = npad // nt

    names, arrays, in_specs = _proj_collect(cfg, x, e, wq, bq, we, be,
                                            wo, bo, woe, boe, bits, src,
                                            dst)
    out_shapes = [jax.ShapeDtypeStruct((npad, din), x.dtype),
                  jax.ShapeDtypeStruct((ep, de), x.dtype)]
    out_specs = [_node_block(cfg, din), _edge_block(cfg, de)]
    out_names = ["attn_out", "e_attn"]
    if save_soft:
        out_shapes.append(jax.ShapeDtypeStruct((ep, heads), _F32))
        out_specs.append(_edge_block(cfg, heads))
        out_names.append("p_out")
        out_shapes.append(jax.ShapeDtypeStruct((npad, heads + 1), _F32))
        out_specs.append(_node_block(cfg, heads + 1))
        out_names.append("den_deg_out")

    def body(*refs):
        _proj_fwd_body(cfg, dict(zip(names + out_names, refs)))

    res = pl.pallas_call(
        body,
        grid=(n_tiles // g_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=_cost(cfg, npad, ep, 9 + has_gate),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,),
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_should_interpret(),
    )(*arrays)
    extras = res[-2:] if save_soft else (None, None)
    return res[0], res[1], extras


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _proj_core(cfg, x, e, wq, bq, we, be, wo, bo, woe, boe, bits, src,
               dst):
    """Projection-fused forward: (attn_out [Np, Din], e_attn [Ep, De]).
    ``cfg`` is a 12-tuple: (heads, dh, te, aggs, has_gate, has_edge,
    drop_rate, g_fwd, g_bwd, din, de, nt)."""
    c = cfg[:7] + (cfg[7], cfg[9], cfg[10], cfg[11])
    attn_out, e_attn, _ = _run_proj_fwd(c, x, e, wq, bq, we, be, wo, bo,
                                        woe, boe, bits, src, dst,
                                        save_soft=False)
    return attn_out, e_attn


def _proj_core_fwd(cfg, x, e, wq, bq, we, be, wo, bo, woe, boe, bits,
                   src, dst):
    c = cfg[:7] + (cfg[7], cfg[9], cfg[10], cfg[11])
    attn_out, e_attn, (p_saved, den_deg) = _run_proj_fwd(
        c, x, e, wq, bq, we, be, wo, bo, woe, boe, bits, src, dst,
        save_soft=True)
    return (attn_out, e_attn), (x, e, wq, bq, we, be, wo, bo, woe, boe,
                                bits, src, dst, p_saved, den_deg)


def _proj_core_bwd(cfg, residuals, cotangents):
    c = cfg[:7] + (cfg[8], cfg[9], cfg[10], cfg[11])
    (heads, dh, te, aggs, has_gate, has_edge, drop_rate, g_tiles,
     din, de, nt) = c
    hidden = heads * dh
    (x, e, wq, bq, we, be, wo, bo, woe, boe, bits, src, dst, p_saved,
     den_deg) = residuals
    g_attn_out, g_e_attn = cotangents
    npad, ep = x.shape[0], src.shape[0]
    n_tiles = npad // nt
    w_e = hidden + heads * (1 + has_gate)

    names, arrays, in_specs = _proj_collect(c, x, e, wq, bq, we, be, wo,
                                            bo, woe, boe, bits, src, dst)
    names += ["p_saved", "den_deg", "g_attn_out", "g_e_attn"]
    arrays += [p_saved, den_deg, g_attn_out.astype(x.dtype),
               g_e_attn.astype(x.dtype)]
    in_specs += [_edge_block(c, heads), _node_block(c, heads + 1),
                 _node_block(c, din), _edge_block(c, de)]

    out_shapes = [
        jax.ShapeDtypeStruct((npad, din), x.dtype),          # dx
        jax.ShapeDtypeStruct((ep, de), _F32),                # de (f32)
        jax.ShapeDtypeStruct((din + 1, hidden * (3 + has_gate)), _F32),
        jax.ShapeDtypeStruct((de + 1, w_e), _F32),
        jax.ShapeDtypeStruct((hidden * len(aggs) + 1, din), _F32),
        jax.ShapeDtypeStruct((hidden + 1, de), _F32),
    ]
    out_specs = [
        _node_block(c, din), _edge_block(c, de),
        _weight_block((din + 1, hidden * (3 + has_gate))),
        _weight_block((de + 1, w_e)),
        _weight_block((hidden * len(aggs) + 1, din)),
        _weight_block((hidden + 1, de)),
    ]
    out_names = ["dx", "de", "gw_qkvg", "gw_eall", "gw_o", "gw_oe"]

    def body(*refs):
        _proj_bwd_body(c, dict(zip(names + out_names, refs)))

    res = pl.pallas_call(
        body,
        grid=(n_tiles // g_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=_cost(c, npad, ep, 16 + 2 * has_gate),
        compiler_params=pltpu.CompilerParams(
            # weight-grad accumulators with constant index maps need the
            # sequential (arbitrary) grid — no PARALLEL here
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_should_interpret(),
    )(*arrays)
    dx, de_g, gwq, gwe, gwo, gwoe = res
    return (dx, de_g,
            gwq[:din].astype(wq.dtype), gwq[din].astype(bq.dtype),
            gwe[:de].astype(we.dtype), gwe[de].astype(be.dtype),
            gwo[:hidden * len(aggs)].astype(wo.dtype),
            gwo[hidden * len(aggs)].astype(bo.dtype),
            gwoe[:hidden].astype(woe.dtype),
            gwoe[hidden].astype(boe.dtype),
            jnp.zeros_like(bits), jnp.zeros_like(src),
            jnp.zeros_like(dst))


_proj_core.defvjp(_proj_core_fwd, _proj_core_bwd)


def gt_attention_tile_proj(
    x: jnp.ndarray,              # [Np, Din] residual node stream
    e: jnp.ndarray,              # [Ep, De] residual edge stream
    w_qkvg: jnp.ndarray,         # [Din, (3+gate)·hidden] (norm folded)
    b_qkvg: jnp.ndarray,         # [(3+gate)·hidden] f32
    w_eall: jnp.ndarray,         # [De, hidden+(1+gate)·H] (norm folded
                                 #  into the WE_value columns)
    b_eall: jnp.ndarray,
    w_o: jnp.ndarray,            # [A·hidden, Din], rows ALREADY permuted
                                 #  to the kernel's [a][h][d] layout
    b_o: jnp.ndarray,
    w_oe: jnp.ndarray,           # [hidden, De]
    b_oe: jnp.ndarray,
    edge_src: jnp.ndarray,
    edge_dst: jnp.ndarray,
    num_heads: int,
    hidden_dim: int,
    tile_edges: int,
    has_gate: bool = False,
    aggregators: Sequence[str] = ("sum",),
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    tiles_per_step: Optional[int] = None,
    tile_nodes: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """v5 projection-fused attention block (see the v5 banner above).
    Returns (attn_out [Np, Din] — WO output, pre-dropout/residual;
    e_attn [Ep, De] — WOe output, pre-dropout/residual)."""
    npad, din = x.shape
    ep, de = e.shape
    nt = int(tile_nodes) if tile_nodes else TILE_NODES
    if npad % nt != 0 or ep % tile_edges != 0 \
            or npad // nt != ep // tile_edges:
        raise ValueError(
            f"batch is not tile-packed for tile_edges={tile_edges} / "
            f"tile_nodes={nt}: Np={npad}, Ep={ep}")
    aggs = tuple("sum" if a == "add" else a for a in aggregators)
    unsupported = [a for a in aggs if a not in ("sum", "mean")]
    if unsupported:
        raise NotImplementedError(
            f"gt_attention_tile_proj supports sum/mean aggregators, got "
            f"{unsupported}")

    heads = num_heads
    dh = hidden_dim // heads
    tiles_per_step = _resolve_tiles_g(tiles_per_step, nt)
    g_fwd = _pick_tiles_per_step(npad // nt, int(tiles_per_step))
    g_bwd = _pick_tiles_per_step(npad // nt,
                                 max(1, int(tiles_per_step) // 2))

    rate = float(dropout_rate)
    if rate > 0.0 and dropout_rng is not None:
        bits = jax.random.bits(dropout_rng, (ep, heads), jnp.uint32)
    else:
        rate = 0.0
        bits = jnp.zeros((1,), jnp.uint32)

    cfg = (heads, dh, int(tile_edges), aggs, bool(has_gate), True,
           rate, g_fwd, g_bwd, din, de, nt)
    return _proj_core(
        cfg, x, e, w_qkvg, b_qkvg.astype(_F32),
        w_eall, b_eall.astype(_F32), w_o, b_o.astype(_F32),
        w_oe, b_oe.astype(_F32), bits,
        edge_src.astype(jnp.int32), edge_dst.astype(jnp.int32))


def gt_attention_tile_merged(
    qkvg: jnp.ndarray,           # [Np, (3+gate)·hidden], [q|k|v|gate]
    edge_src: jnp.ndarray,       # [Ep] int32, tile-packed layout
    edge_dst: jnp.ndarray,       # [Ep] int32, tile-packed layout
    num_heads: int,
    hidden_dim: int,
    tile_edges: int,
    e_all: Optional[jnp.ndarray] = None,  # [Ep, hidden+(1+gate)·H],
                                          # [e_val|e_bias|e_gate]
    has_gate: bool = False,
    aggregators: Sequence[str] = ("sum",),
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    tiles_per_step: Optional[int] = None,
    tile_nodes: Optional[int] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Merged-operand tile attention (the production entry point; see
    module docstring). Returns (node_out [Np, hidden*A] in
    AGGREGATOR-MAJOR [a][h][d] layout, eij [Ep, hidden] or None) —
    callers needing the reference [h][a][d] layout permute the consumer
    weight's rows with :func:`gt_pyg_tpu.ops.attention.interleave_perm`.
    """
    npad = qkvg.shape[0]
    ep = edge_src.shape[0]
    nt = int(tile_nodes) if tile_nodes else TILE_NODES
    if npad % nt != 0 or ep % tile_edges != 0 \
            or npad // nt != ep // tile_edges:
        raise ValueError(
            f"batch is not tile-packed for tile_edges={tile_edges} / "
            f"tile_nodes={nt}: Np={npad}, Ep={ep}")
    aggs = tuple("sum" if a == "add" else a for a in aggregators)
    unsupported = [a for a in aggs if a not in ("sum", "mean")]
    if unsupported:
        raise NotImplementedError(
            f"gt_attention_tile supports sum/mean aggregators, got "
            f"{unsupported}")
    if qkvg.shape[1] % (3 + int(has_gate)) != 0 \
            or qkvg.shape[1] // (3 + int(has_gate)) != hidden_dim:
        raise ValueError(
            f"qkvg width {qkvg.shape[1]} does not match hidden_dim="
            f"{hidden_dim} with gate={has_gate}")

    heads = num_heads
    dh = hidden_dim // heads
    has_edge = e_all is not None
    tiles_per_step = _resolve_tiles_g(tiles_per_step, nt)
    g_fwd = _pick_tiles_per_step(npad // nt, int(tiles_per_step))
    g_bwd = _pick_tiles_per_step(npad // nt,
                                 max(1, int(tiles_per_step) // 2))

    rate = float(dropout_rate)
    if rate > 0.0 and dropout_rng is not None:
        bits = jax.random.bits(dropout_rng, (ep, heads), jnp.uint32)
    else:
        rate = 0.0
        bits = jnp.zeros((1,), jnp.uint32)

    cfg = (heads, dh, int(tile_edges), aggs, bool(has_gate),
           bool(has_edge), rate, g_fwd, g_bwd, nt)
    dummy = jnp.zeros((1,), qkvg.dtype)
    out, eij = _tile_core(
        cfg, qkvg, e_all if has_edge else dummy, bits,
        edge_src.astype(jnp.int32), edge_dst.astype(jnp.int32))
    return out, (eij if has_edge else None)


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
    tiles_per_step: Optional[int] = None,
    raw_layout: bool = False,
    tile_nodes: Optional[int] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Separate-operand wrapper over :func:`gt_attention_tile_merged`
    (same contract as the lax path; requires a tile-packed batch).
    Returns (node_out [Np, hidden*A] in reference [h][a][d] layout
    unless ``raw_layout``, eij [Ep, hidden] or None)."""
    from ..attention import interleave_cols

    npad, hidden = q.shape
    has_gate = gate_n is not None
    has_edge = e_val is not None

    parts = [q, k, v]
    if has_gate:
        parts.append(gate_n)
    qkvg = jnp.concatenate(parts, axis=1)

    e_all = None
    if has_edge:
        heads = num_heads
        ep = e_val.shape[0]
        eb = (e_bias if e_bias is not None
              else jnp.zeros((ep, heads), e_val.dtype))
        eparts = [e_val, eb.astype(e_val.dtype)]
        if has_gate:
            eg = (e_gate_logits if e_gate_logits is not None
                  else jnp.zeros((ep, heads), e_val.dtype))
            eparts.append(eg.astype(e_val.dtype))
        e_all = jnp.concatenate(eparts, axis=1)

    out, eij = gt_attention_tile_merged(
        qkvg, edge_src, edge_dst, num_heads, hidden, tile_edges,
        e_all=e_all, has_gate=has_gate, aggregators=aggregators,
        dropout_rate=dropout_rate, dropout_rng=dropout_rng,
        tiles_per_step=tiles_per_step, tile_nodes=tile_nodes)

    aggs = tuple("sum" if a == "add" else a for a in aggregators)
    if len(aggs) > 1 and not raw_layout:
        out = interleave_cols(out, num_heads, hidden // num_heads,
                              len(aggs))
    return out, eij
