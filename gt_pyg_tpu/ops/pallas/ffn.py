"""Fused pre-norm FFN block kernel (fwd + custom VJP).

Fuses GTConv's FFN tail — ``MLP(Din→H→H→Dout)`` with per-block
activation+dropout, the post-MLP dropout, and the residual add
(reference ``gt_pyg/nn/gt_conv.py:317-321,338-341`` and ``mlp.py:160-175``)
— into one Pallas kernel per direction over row blocks.

Why: at the flagship batch each FFN runs as 3 XLA matmul fusions that
round-trip [R,512] activations (and their saved copies for autodiff)
through HBM — profiled at ~2.5 ms/layer of the v5e train step. Here the
whole chain stays in VMEM per row block; the backward recomputes the
two hidden activations from the block inputs (FLOPs are free at these
shapes — the step is bandwidth-bound) and accumulates weight gradients
in VMEM across the sequential grid.

Dropout masks are generated OUTSIDE the kernel as u8 bytes (one byte
per element, the same quantized-keep scheme as
:class:`gt_pyg_tpu.nn.dropout.Dropout`) and passed in: byte traffic is
~3% of the activation traffic, the backward reuses the identical mask
arrays (no regeneration-consistency hazard), and the kernel stays fully
testable in CPU interpret mode (``pltpu.prng_*`` has no CPU lowering).

Weight gradients are accumulated in f32 VMEM blocks with a constant
index map over the (sequential) grid — the standard Pallas reduction
pattern; dL/db rides the same accumulators as an extra row.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _should_interpret() -> bool:
    import os

    if os.environ.get("GT_TPU_FORCE_INTERPRET", "0") == "1":
        return True
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


def _erf_poly(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7).

    Mosaic has no erf/erfc lowering (only exp/tanh/logistic), so the
    exact-GELU path uses this polynomial — below bf16 resolution, and
    ~1e-7 off the libm erf in f32.
    """
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.where(x < 0, -y, y)


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf_poly(x * 0.7071067811865476))


def _gelu_tanh(x):
    """tanh-approximate GELU. Mosaic lowers tanh natively, while the
    exact erf polynomial costs exp + divide + ~10 mults per element —
    measured ~0.8 ms/layer of the flagship step across the fwd+bwd FFN
    kernels (tools/ffn_ab.py: gelu 2.145 vs relu 1.356 ms at the node
    shape). |tanh-gelu - exact| <= ~1e-3 absolute — far below bf16's
    ~0.4% resolution — so the bf16 compute path uses this; f32 stays
    exact for golden parity."""
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _resolve_act(act: str):
    low = (act or "").lower()
    if low == "gelu":
        return _gelu_exact
    if low == "gelu_tanh":
        return _gelu_tanh
    from ...nn.act import resolve_activation

    return resolve_activation(act)


def _get_mask(cfg, refs, draw, row_sl, abs_block, shape):
    """Boolean keep-mask for one dropout draw of one row block.

    bytes mode: loads the precomputed u8 mask rows (compare in i32 —
    Mosaic has no i8 vector cmpi lowering on v5e; interpret mode accepts
    it, hardware compile fails).

    kernel mode (GT_TPU_FFN_PRNG, TPU only): seeds the core's hardware
    PRNG from (key words, draw, absolute block id) and generates the
    bits in VMEM — mask placement is a pure function of the absolute row
    block, so the backward regenerates the identical mask as long as it
    runs the same row blocking (fused_ffn pins fwd rb == bwd rb in this
    mode). Removes the XLA rng-bit-generator pass (~1.1 ms/step) and
    ~2 GB/step of u8 mask HBM traffic on the flagship batch."""
    thresh = cfg[4] if draw < 2 else cfg[5]
    if cfg[10]:                       # kprng
        # This libtpu's Mosaic lowers tpu.prng_set_seed_32 with AT MOST
        # two operands ("Setting seed with more than 2 values is not
        # supported" — hit on v5e, round 4), so the (key, draw, block)
        # tuple is folded into two i32 words: the caller pre-mixes the
        # 4 key words into seeds[0,:2] (fused_ffn), and draw/abs_block
        # enter here through odd-constant multiplies (injective mod
        # 2^32) crossed over both words. Mask placement stays a pure
        # function of (key, draw, absolute row block), which is what
        # the fwd/bwd mask-consistency contract needs.
        seed = refs["seeds"]
        blk = abs_block.astype(jnp.int32) if hasattr(abs_block, "astype") \
            else jnp.int32(abs_block)
        m0 = ((seed[0, 0] + jnp.int32(draw) * jnp.int32(-1640531527))
              ^ (blk * jnp.int32(461845907)))       # 0x9E3779B9, 0x1B873593
        m1 = ((seed[0, 1] ^ (blk * jnp.int32(-862048943)))
              + jnp.int32(draw + 1) * jnp.int32(-1028477387))
        #                                           # 0xCC9E2D51, 0xC2B2AE35
        pltpu.prng_seed(m0, m1)
        bits = pltpu.prng_random_bits(shape)
        return (bits.astype(jnp.int32) & 255) < thresh
    name = {0: "m0", 1: "m1", 2: "m3"}[draw]
    return refs[name][row_sl].astype(jnp.int32) < thresh


def _mul_mask(x, mask, thresh):
    """x * mask / keep_q in the input's dtype-family."""
    keep_q = thresh / 256.0
    return jnp.where(mask, x * (1.0 / keep_q), 0.0)


def _act16():
    """Run the activation (and its jvp) on bf16 vectors: the VPU
    processes 2x the lanes per cycle, and the activation output feeds a
    bf16 matmul operand anyway, so the only extra rounding is inside the
    transcendental — measured as the FFN kernels' second-largest cost
    tier after the matmuls. Opt-out knob (GT_TPU_FFN_ACT16=0) for A/B;
    f32 compute (golden parity) never takes this path."""
    import os

    return os.environ.get("GT_TPU_FFN_ACT16", "1") == "1"


def _act_apply(act_fn, z, md):
    if md == jnp.bfloat16 and _act16():
        return act_fn(z.astype(jnp.bfloat16)).astype(_F32)
    return act_fn(z)


# cfg: (din, h, dout, act, thresh, out_thresh, training, rb, g_rows,
#       same_x, kprng) — same_x=True means the residual stream IS the
#       kernel input (norm folded into W0 by the caller): one row-block
#       input instead of two, halving the forward's activation reads;
#       kprng=True generates dropout masks with the in-core hardware
#       PRNG instead of loading precomputed bytes (see _get_mask).
def _fwd_body(cfg, refs):
    (din, h, dout, act, thresh, out_thresh, training, rb, g_rows,
     same_x, kprng) = cfg
    act_fn = _resolve_act(act)
    xn_ref = refs["xn"]
    xres_ref = xn_ref if same_x else refs["xres"]
    out_ref = refs["out"]

    w0, w1, w2 = refs["w0"][:], refs["w1"][:], refs["w2"][:]
    b0 = refs["b0"][:].astype(_F32)
    b1 = refs["b1"][:].astype(_F32)
    b2 = refs["b2"][:].astype(_F32)

    for g in range(g_rows):
        sl = pl.ds(g * rb, rb)
        ab = pl.program_id(0) * g_rows + g
        xn = xn_ref[sl]
        md = xn.dtype
        z0 = jax.lax.dot(xn, w0, preferred_element_type=_F32) + b0
        h0 = _act_apply(act_fn, z0, md)
        if training:
            h0 = _mul_mask(h0, _get_mask(cfg, refs, 0, sl, ab, (rb, h)),
                           thresh)
        h0 = h0.astype(xn.dtype)
        z1 = jax.lax.dot(h0, w1, preferred_element_type=_F32) + b1
        h1 = _act_apply(act_fn, z1, md)
        if training:
            h1 = _mul_mask(h1, _get_mask(cfg, refs, 1, sl, ab, (rb, h)),
                           thresh)
        h1 = h1.astype(xn.dtype)
        y = jax.lax.dot(h1, w2, preferred_element_type=_F32) + b2
        if training:
            y = _mul_mask(y, _get_mask(cfg, refs, 2, sl, ab, (rb, dout)),
                          out_thresh)
        out_ref[sl] = (xres_ref[sl].astype(_F32)
                       + y).astype(out_ref.dtype)


def _bwd_body(cfg, refs):
    (din, h, dout, act, thresh, out_thresh, training, rb, g_rows,
     same_x, kprng) = cfg
    act_fn = _resolve_act(act)
    xn_ref = refs["xn"]
    g_out_ref = refs["g_out"]
    gxn_ref = refs["gxn"]
    gw0_ref, gw1_ref, gw2_ref = refs["gw0"], refs["gw1"], refs["gw2"]

    w0, w1, w2 = refs["w0"][:], refs["w1"][:], refs["w2"][:]
    b0 = refs["b0"][:].astype(_F32)
    b1 = refs["b1"][:].astype(_F32)
    b2 = refs["b2"][:].astype(_F32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gw0_ref[:] = jnp.zeros_like(gw0_ref)
        gw1_ref[:] = jnp.zeros_like(gw1_ref)
        gw2_ref[:] = jnp.zeros_like(gw2_ref)

    for g in range(g_rows):
        sl = pl.ds(g * rb, rb)
        ab = pl.program_id(0) * g_rows + g
        xn = xn_ref[sl]
        md = xn.dtype
        if training:
            # one generation/load per draw, reused at both mask sites
            mb0 = _get_mask(cfg, refs, 0, sl, ab, (rb, h))
            mb1 = _get_mask(cfg, refs, 1, sl, ab, (rb, h))
            mb3 = _get_mask(cfg, refs, 2, sl, ab, (rb, dout))
        # ---- recompute forward chain (keeps pre-act z for act')
        z0 = jax.lax.dot(xn, w0, preferred_element_type=_F32) + b0

        def act_bwd(z, g_after):
            """act'(z) ⊙ g_after via jvp (exact for erf-gelu etc.);
            bf16 under act16 — consistent with the recompute."""
            if md == jnp.bfloat16 and _act16():
                _, t = jax.jvp(act_fn, (z.astype(jnp.bfloat16),),
                               (g_after.astype(jnp.bfloat16),))
                return t.astype(_F32)
            _, t = jax.jvp(act_fn, (z,), (g_after,))
            return t

        h0 = _act_apply(act_fn, z0, md)
        if training:
            h0 = _mul_mask(h0, mb0, thresh)
        h0 = h0.astype(md)
        z1 = jax.lax.dot(h0, w1, preferred_element_type=_F32) + b1
        h1 = _act_apply(act_fn, z1, md)
        if training:
            h1 = _mul_mask(h1, mb1, thresh)
        h1 = h1.astype(md)

        # ---- reverse
        g_y = g_out_ref[sl].astype(_F32)
        if training:
            g_y = _mul_mask(g_y, mb3, out_thresh)
        g_y = g_y.astype(md)
        # dW2 rows: [H, Dout] = h1ᵀ g_y ; bias rides as an extra row via
        # the ones column trick is unnecessary — accumulate separately
        gw2_ref[:h, :] += jax.lax.dot_general(
            h1, g_y, (((0,), (0,)), ((), ())),
            preferred_element_type=_F32)
        gw2_ref[h:, :] += jnp.sum(g_y.astype(_F32), axis=0,
                                  keepdims=True)
        g_h1 = jax.lax.dot_general(
            g_y, w2, (((1,), (1,)), ((), ())),
            preferred_element_type=_F32)
        if training:
            g_h1 = _mul_mask(g_h1, mb1, thresh)
        g_z1 = act_bwd(z1, g_h1).astype(md)
        gw1_ref[:h, :] += jax.lax.dot_general(
            h0, g_z1, (((0,), (0,)), ((), ())),
            preferred_element_type=_F32)
        gw1_ref[h:, :] += jnp.sum(g_z1.astype(_F32), axis=0,
                                  keepdims=True)
        g_h0 = jax.lax.dot_general(
            g_z1, w1, (((1,), (1,)), ((), ())),
            preferred_element_type=_F32)
        if training:
            g_h0 = _mul_mask(g_h0, mb0, thresh)
        g_z0 = act_bwd(z0, g_h0).astype(md)
        gw0_ref[:din, :] += jax.lax.dot_general(
            xn, g_z0, (((0,), (0,)), ((), ())),
            preferred_element_type=_F32)
        gw0_ref[din:, :] += jnp.sum(g_z0.astype(_F32), axis=0,
                                    keepdims=True)
        gxn_ref[sl] = jax.lax.dot_general(
            g_z0, w0, (((1,), (1,)), ((), ())),
            preferred_element_type=_F32).astype(gxn_ref.dtype)


def _row_block(cfg, width, dtype_ignored=None):
    rb, g_rows = cfg[7], cfg[8]
    return pl.BlockSpec((g_rows * rb, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _full_block(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _collect(cfg, xn, xres, w0, b0, w1, b1, w2, b2, m0, m1, m3, seeds):
    din, h, dout = cfg[0], cfg[1], cfg[2]
    training, same_x, kprng = cfg[6], cfg[9], cfg[10]
    names = ["xn"] + ([] if same_x else ["xres"]) + [
        "w0", "b0", "w1", "b1", "w2", "b2"]
    arrays = [xn] + ([] if same_x else [xres]) + [
        w0, b0.reshape(1, -1), w1, b1.reshape(1, -1),
        w2, b2.reshape(1, -1)]
    specs = [_row_block(cfg, din)] \
        + ([] if same_x else [_row_block(cfg, dout)]) + [
        _full_block((din, h)), _full_block((1, h)),
        _full_block((h, h)), _full_block((1, h)),
        _full_block((h, dout)), _full_block((1, dout))]
    if training and kprng:
        names.append("seeds")
        arrays.append(seeds)
        specs.append(pl.BlockSpec((1, 2), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM))
    elif training:
        names += ["m0", "m1", "m3"]
        arrays += [m0, m1, m3]
        specs += [_row_block(cfg, h), _row_block(cfg, h),
                  _row_block(cfg, dout)]
    return names, arrays, specs


def _pick_rows(n_rows: int, want: int, rb: int) -> int:
    g = max(1, min(want, n_rows // rb))
    while (n_rows // rb) % g:
        g -= 1
    return g


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ffn_core(cfg, xn, xres, w0, b0, w1, b1, w2, b2, m0, m1, m3, seeds):
    (din, h, dout, act, thresh, out_thresh, training, rb, g_rows,
     same_x, kprng) = cfg
    R = xn.shape[0]
    names, arrays, in_specs = _collect(cfg, xn, xres, w0, b0, w1, b1,
                                       w2, b2, m0, m1, m3, seeds)
    names = names + ["out"]

    def body(*refs):
        _fwd_body(cfg, dict(zip(names, refs)))

    out = pl.pallas_call(
        body,
        grid=(R // (rb * g_rows),),
        in_specs=in_specs,
        out_specs=_row_block(cfg, dout),
        out_shape=jax.ShapeDtypeStruct(
            (R, dout), xn.dtype if same_x else xres.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * (din * h + h * h + h * dout),
            bytes_accessed=R * (din + 2 * dout) * 2,
            transcendentals=R * 2 * h),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_should_interpret(),
    )(*arrays)
    return out


def _ffn_fwd(cfg, xn, xres, w0, b0, w1, b1, w2, b2, m0, m1, m3, seeds):
    out = _ffn_core(cfg, xn, xres, w0, b0, w1, b1, w2, b2, m0, m1, m3,
                    seeds)
    return out, (xn, xres, w0, b0, w1, b1, w2, b2, m0, m1, m3, seeds)


def _ffn_bwd(cfg, res, g_out):
    (din, h, dout, act, thresh, out_thresh, training, rb, g_rows,
     same_x, kprng) = cfg
    xn, xres, w0, b0, w1, b1, w2, b2, m0, m1, m3, seeds = res
    R = xn.shape[0]
    if not kprng:
        # The backward keeps ~3x the forward's f32 intermediates live
        # per row block (recompute + grads); halve the row block to stay
        # inside scoped VMEM on v5e. (kprng mode pins fwd rb == bwd rb
        # instead — mask placement is a function of the row BLOCK, so
        # both directions must run the same blocking.)
        rb = max(16, rb // 2)
        while rb >= 16 and R % rb:
            rb //= 2
        g_rows = _pick_rows(R, g_rows, rb)
    cfg = (din, h, dout, act, thresh, out_thresh, training, rb, g_rows,
           same_x, kprng)
    # xres is not needed by the backward (g_xres = g_out): pass a dummy
    # row-block input of the right shape to reuse _collect
    names, arrays, in_specs = _collect(cfg, xn, g_out, w0, b0, w1, b1,
                                       w2, b2, m0, m1, m3, seeds)
    if same_x:
        # no xres slot was emitted; the backward needs g_out separately
        pass
    names = names + ["g_out"]
    arrays.append(g_out)
    in_specs.append(_row_block(cfg, dout))

    out_shapes = [
        jax.ShapeDtypeStruct((R, din), xn.dtype),            # g_xn
        jax.ShapeDtypeStruct((din + 1, h), _F32),            # gW0 | gb0
        jax.ShapeDtypeStruct((h + 1, h), _F32),              # gW1 | gb1
        jax.ShapeDtypeStruct((h + 1, dout), _F32),           # gW2 | gb2
    ]
    out_specs = [
        _row_block(cfg, din),
        _full_block((din + 1, h)),
        _full_block((h + 1, h)),
        _full_block((h + 1, dout)),
    ]
    names = names + ["gxn", "gw0", "gw1", "gw2"]

    def body(*refs):
        _bwd_body(cfg, dict(zip(names, refs)))

    res_out = pl.pallas_call(
        body,
        grid=(R // (rb * g_rows),),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=6 * R * (din * h + h * h + h * dout),
            bytes_accessed=R * (2 * din + 2 * dout) * 2,
            transcendentals=R * 4 * h),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_should_interpret(),
    )(*arrays)
    g_xn, gw0, gw1, gw2 = res_out
    if same_x:
        # the residual stream IS xn: fold d(residual)=g_out into g_xn
        # and hand the dummy xres slot a zero cotangent
        g_xn = (g_xn.astype(_F32) + g_out.astype(_F32)).astype(g_xn.dtype)
        g_xres = jnp.zeros_like(xres)
    else:
        g_xres = g_out
    return (g_xn, g_xres,
            gw0[:din].astype(w0.dtype), gw0[din].astype(b0.dtype),
            gw1[:h].astype(w1.dtype), gw1[h].astype(b1.dtype),
            gw2[:h].astype(w2.dtype), gw2[h].astype(b2.dtype),
            jnp.zeros_like(m0), jnp.zeros_like(m1), jnp.zeros_like(m3),
            jnp.zeros_like(seeds))


_ffn_core.defvjp(_ffn_fwd, _ffn_bwd)


def fused_ffn(
    xn: jnp.ndarray,             # [R, Din] normalized input
    xres: Optional[jnp.ndarray],  # [R, Dout] residual; None => xn IS the
                                  # residual (norm folded into w0/b0)
    w0: jnp.ndarray, b0: jnp.ndarray,       # [Din, H], [H]
    w1: jnp.ndarray, b1: jnp.ndarray,       # [H, H], [H]
    w2: jnp.ndarray, b2: jnp.ndarray,       # [H, Dout], [Dout]
    act: str = "gelu",
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    rows_per_block: int = 512,
    blocks_per_step: int = 2,
) -> jnp.ndarray:
    """out = xres + drop(W2·drop(act(W1·drop(act(W0·xn))))).

    Weights are cast to ``xn.dtype`` outside the kernel (XLA fuses the
    casts); weight/bias gradients accumulate in f32. Dropout masks are
    u8 bytes generated here (3 draws from ``dropout_rng``) with the
    keep probability quantized to 1/256 exactly like
    :class:`gt_pyg_tpu.nn.dropout.Dropout`.
    """
    import os

    rows_per_block = int(os.environ.get("GT_TPU_FFN_RB", rows_per_block))
    blocks_per_step = int(os.environ.get("GT_TPU_FFN_G", blocks_per_step))
    R, din = xn.shape
    h = w0.shape[1]
    dout = w2.shape[1]
    same_x = xres is None
    if same_x and din != dout:
        raise ValueError(
            f"xres=None (norm-folded residual) needs Din == Dout, got "
            f"{din} != {dout}")
    training = dropout_rate > 0.0 and dropout_rng is not None
    thresh = max(1, min(255, int(round((1.0 - dropout_rate) * 256.0))))
    if (act or "").lower() == "gelu" and xn.dtype == jnp.bfloat16 \
            and os.environ.get("GT_TPU_GELU", "tanh").lower() == "tanh":
        act = "gelu_tanh"   # see _gelu_tanh: bf16-exactness-free speedup

    # kprng: generate dropout masks with the in-core hardware PRNG (TPU
    # only — no CPU/interpret lowering). Placement is a function of the
    # absolute row block, so fwd and bwd must share one blocking: the
    # forward runs at the backward's (halved) row block.
    prng_mode = os.environ.get("GT_TPU_FFN_PRNG", "auto").lower()
    kprng = training and (prng_mode == "kernel"
                          or (prng_mode == "auto"
                              and not _should_interpret()))

    rb = rows_per_block
    if kprng:
        rb = max(16, rb // 2)
    while rb >= 16 and R % rb:
        rb //= 2
    if R % rb or rb < 16:
        raise ValueError(
            f"rows {R} not divisible by a bf16-tileable block "
            f"(<= {rows_per_block}); pad rows to a multiple of 16")
    g_rows = _pick_rows(R, blocks_per_step, rb)
    cfg = (din, h, dout, act, thresh, thresh, training, rb, g_rows,
           same_x, kprng)

    cdtype = xn.dtype
    w0c, w1c, w2c = (w.astype(cdtype) for w in (w0, w1, w2))
    zu = jnp.zeros((1,), jnp.uint8)
    m0 = m1 = m3 = zu
    seeds = jnp.zeros((1, 2), jnp.int32)
    if training and kprng:
        try:
            kd = jax.random.key_data(dropout_rng).reshape(-1)
        except Exception:       # raw uint32 key array (old-style)
            kd = jnp.asarray(dropout_rng).reshape(-1)
        kd = jnp.pad(kd.astype(jnp.uint32), (0, max(0, 4 - kd.shape[0])))
        # pre-mix the 4 key words down to the 2 the hardware seed op
        # accepts (see _get_mask); odd multipliers keep the fold
        # injective in each word pair
        s0 = kd[0] ^ (kd[2] * jnp.uint32(0x9E3779B9))
        s1 = kd[1] ^ (kd[3] * jnp.uint32(0x85EBCA6B))
        seeds = jnp.stack([s0, s1]).astype(jnp.int32).reshape(1, 2)
    elif training:
        k0, k1, k2 = jax.random.split(dropout_rng, 3)
        m0 = jax.random.bits(k0, (R, h), dtype=jnp.uint8)
        m1 = jax.random.bits(k1, (R, h), dtype=jnp.uint8)
        m3 = jax.random.bits(k2, (R, dout), dtype=jnp.uint8)
    xres_in = (jnp.zeros((1,), cdtype) if same_x
               else xres.astype(cdtype))
    return _ffn_core(cfg, xn, xres_in, w0c,
                     b0.astype(_F32), w1c, b1.astype(_F32), w2c,
                     b2.astype(_F32), m0, m1, m3, seeds)
