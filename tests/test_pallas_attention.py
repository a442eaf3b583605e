"""Pallas fused attention kernel vs the lax reference path (interpret
mode on CPU — the kernel-vs-lax test pattern from SURVEY.md §4).

The op contract is 2-D: node/value tensors are [rows, hidden] and heads
are handled via indicator matmuls (TPU lane-padding avoidance)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from gt_pyg_tpu.ops.attention import _gt_attention_lax, gt_attention
from gt_pyg_tpu.ops.pallas.gt_attention import gt_attention_pallas

HEADS = 4
DH = 16
HIDDEN = HEADS * DH


def make_inputs(seed=0, npad=256, ep=600, pad_edges=50):
    rng = np.random.default_rng(seed)
    real = ep - pad_edges
    dst = np.sort(rng.integers(0, npad, size=real)).astype(np.int32)
    dst = np.concatenate([dst, np.full(pad_edges, npad, np.int32)])
    src = np.concatenate([rng.integers(0, npad, size=real),
                          np.full(pad_edges, npad)]).astype(np.int32)
    return dict(
        q=jnp.asarray(rng.standard_normal((npad, HIDDEN)), jnp.float32),
        k=jnp.asarray(rng.standard_normal((npad, HIDDEN)), jnp.float32),
        v=jnp.asarray(rng.standard_normal((npad, HIDDEN)), jnp.float32),
        gate_n=jnp.asarray(rng.standard_normal((npad, HIDDEN)),
                           jnp.float32),
        e_bias=jnp.asarray(rng.standard_normal((ep, HEADS)), jnp.float32),
        e_gate_logits=jnp.asarray(rng.standard_normal((ep, HEADS)),
                                  jnp.float32),
        e_val=jnp.asarray(rng.standard_normal((ep, HIDDEN)), jnp.float32),
        edge_src=jnp.asarray(src), edge_dst=jnp.asarray(dst),
    )


def run_both(inp, aggregators=("sum",), **kw):
    lax_out = _gt_attention_lax(
        inp["q"], inp["k"], inp["v"], inp["edge_src"], inp["edge_dst"],
        HEADS, inp["e_bias"], inp["e_val"], inp["gate_n"],
        inp["e_gate_logits"], aggregators, 0.0, None, 16)
    with pltpu.force_tpu_interpret_mode():
        pl_out = gt_attention_pallas(
            inp["q"], inp["k"], inp["v"], inp["edge_src"], inp["edge_dst"],
            HEADS, inp["e_bias"], inp["e_val"], inp["gate_n"],
            inp["e_gate_logits"], aggregators, 0.0, None, **kw)
    return lax_out, pl_out


class TestForwardParity:
    @pytest.mark.parametrize("aggs", [("sum",), ("sum", "mean")])
    def test_matches_lax(self, aggs):
        inp = make_inputs()
        (o1, e1), (o2, e2) = run_both(inp, aggs)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e2),
                                   rtol=1e-5, atol=1e-5)

    def test_unaligned_sizes(self):
        inp = make_inputs(npad=200, ep=96, pad_edges=10)
        (o1, _), (o2, _) = run_both(inp)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-5, atol=1e-5)

    def test_exotic_aggregator_falls_back(self):
        inp = make_inputs()
        with pltpu.force_tpu_interpret_mode():
            o, _ = gt_attention_pallas(
                inp["q"], inp["k"], inp["v"], inp["edge_src"],
                inp["edge_dst"], HEADS, inp["e_bias"], inp["e_val"], None,
                None, ("sum", "std"), 0.0, None)
        o_ref, _ = _gt_attention_lax(
            inp["q"], inp["k"], inp["v"], inp["edge_src"], inp["edge_dst"],
            HEADS, inp["e_bias"], inp["e_val"], None, None, ("sum", "std"),
            0.0, None, 16)
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                                   rtol=1e-5, atol=1e-5)


class TestGradientParity:
    def test_grads_match_lax(self):
        inp = make_inputs()

        def loss(impl):
            def f(q, k, v, ev):
                if impl == "pallas":
                    with pltpu.force_tpu_interpret_mode():
                        o, e = gt_attention_pallas(
                            q, k, v, inp["edge_src"], inp["edge_dst"],
                            HEADS, inp["e_bias"], ev, inp["gate_n"],
                            inp["e_gate_logits"], ("sum", "mean"), 0.0,
                            None)
                else:
                    o, e = _gt_attention_lax(
                        q, k, v, inp["edge_src"], inp["edge_dst"], HEADS,
                        inp["e_bias"], ev, inp["gate_n"],
                        inp["e_gate_logits"], ("sum", "mean"), 0.0, None,
                        16)
                return jnp.sum(o ** 2) + jnp.sum(e ** 2)

            return jax.grad(f, argnums=(0, 1, 2, 3))(
                inp["q"], inp["k"], inp["v"], inp["e_val"])

        for a, b in zip(loss("pallas"), loss("lax")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestDispatch:
    def test_impl_dispatch(self):
        inp = make_inputs()
        with pltpu.force_tpu_interpret_mode():
            o_pl, _ = gt_attention(
                inp["q"], inp["k"], inp["v"], inp["edge_src"],
                inp["edge_dst"], HEADS, e_bias=inp["e_bias"],
                e_val=inp["e_val"], aggregators=("sum",), impl="pallas")
        o_lax, _ = gt_attention(
            inp["q"], inp["k"], inp["v"], inp["edge_src"], inp["edge_dst"],
            HEADS, e_bias=inp["e_bias"], e_val=inp["e_val"],
            aggregators=("sum",), impl="lax")
        np.testing.assert_allclose(np.asarray(o_pl), np.asarray(o_lax),
                                   rtol=1e-5, atol=1e-5)


class TestReferenceLayout:
    def test_interleaved_aggregator_layout(self):
        """Multi-aggregator output must follow the reference's [h][a][d]
        flatten (PyG MultiAggregation on [N, H, Dh] then view)."""
        inp = make_inputs()
        out, _ = _gt_attention_lax(
            inp["q"], inp["k"], inp["v"], inp["edge_src"], inp["edge_dst"],
            HEADS, inp["e_bias"], inp["e_val"], None, None,
            ("sum", "mean"), 0.0, None, 16)
        out_sum, _ = _gt_attention_lax(
            inp["q"], inp["k"], inp["v"], inp["edge_src"], inp["edge_dst"],
            HEADS, inp["e_bias"], inp["e_val"], None, None, ("sum",),
            0.0, None, 16)
        # head h's sum block sits at [h*2*DH : h*2*DH + DH]
        for h in range(HEADS):
            np.testing.assert_allclose(
                np.asarray(out[:, h * 2 * DH: h * 2 * DH + DH]),
                np.asarray(out_sum[:, h * DH:(h + 1) * DH]),
                rtol=1e-5, atol=1e-6)
