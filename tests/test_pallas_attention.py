"""Pallas fused attention kernel vs the lax reference path (interpret
mode on CPU — the kernel-vs-lax test pattern from SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from gt_pyg_tpu.ops.attention import _gt_attention_lax, gt_attention
from gt_pyg_tpu.ops.pallas.gt_attention import gt_attention_pallas


def make_inputs(seed=0, npad=256, ep=600, heads=4, dh=16, pad_edges=50):
    rng = np.random.default_rng(seed)
    real = ep - pad_edges
    dst = np.sort(rng.integers(0, npad, size=real)).astype(np.int32)
    dst = np.concatenate([dst, np.full(pad_edges, npad, np.int32)])
    src = np.concatenate([rng.integers(0, npad, size=real),
                          np.full(pad_edges, npad)]).astype(np.int32)
    return dict(
        q=jnp.asarray(rng.standard_normal((npad, heads, dh)), jnp.float32),
        k=jnp.asarray(rng.standard_normal((npad, heads, dh)), jnp.float32),
        v=jnp.asarray(rng.standard_normal((npad, heads, dh)), jnp.float32),
        gate_n=jnp.asarray(rng.standard_normal((npad, heads, dh)),
                           jnp.float32),
        e_bias=jnp.asarray(rng.standard_normal((ep, heads)), jnp.float32),
        e_gate_logits=jnp.asarray(rng.standard_normal((ep, heads)),
                                  jnp.float32),
        e_val=jnp.asarray(rng.standard_normal((ep, heads, dh)), jnp.float32),
        edge_src=jnp.asarray(src), edge_dst=jnp.asarray(dst),
    )


def run_both(inp, aggregators=("sum",), **kw):
    lax_out = _gt_attention_lax(
        inp["q"], inp["k"], inp["v"], inp["edge_src"], inp["edge_dst"],
        inp["e_bias"], inp["e_val"], inp["gate_n"], inp["e_gate_logits"],
        aggregators, 0.0, None, 16)
    with pltpu.force_tpu_interpret_mode():
        pl_out = gt_attention_pallas(
            inp["q"], inp["k"], inp["v"], inp["edge_src"], inp["edge_dst"],
            inp["e_bias"], inp["e_val"], inp["gate_n"],
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
        # npad not a multiple of the node tile; edges shorter than a chunk
        inp = make_inputs(npad=200, ep=96, pad_edges=10)
        (o1, _), (o2, _) = run_both(inp)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-5, atol=1e-5)

    def test_isolated_nodes_zero(self):
        inp = make_inputs()
        # nodes beyond the max dst never receive edges -> zero output
        (_, _), (o2, _) = run_both(inp)
        top = np.asarray(o2[-1])
        max_dst = int(np.asarray(inp["edge_dst"]).max())
        if max_dst < o2.shape[0] - 1:
            np.testing.assert_allclose(top, 0.0, atol=1e-6)

    def test_exotic_aggregator_falls_back(self):
        inp = make_inputs()
        with pltpu.force_tpu_interpret_mode():
            o, _ = gt_attention_pallas(
                inp["q"], inp["k"], inp["v"], inp["edge_src"],
                inp["edge_dst"], inp["e_bias"], inp["e_val"], None, None,
                ("sum", "std"), 0.0, None)
        o_ref, _ = _gt_attention_lax(
            inp["q"], inp["k"], inp["v"], inp["edge_src"], inp["edge_dst"],
            inp["e_bias"], inp["e_val"], None, None, ("sum", "std"),
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
                            inp["e_bias"], ev, inp["gate_n"],
                            inp["e_gate_logits"], ("sum", "mean"), 0.0,
                            None)
                else:
                    o, e = _gt_attention_lax(
                        q, k, v, inp["edge_src"], inp["edge_dst"],
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
                inp["edge_dst"], e_bias=inp["e_bias"], e_val=inp["e_val"],
                aggregators=("sum",), impl="pallas")
        o_lax, _ = gt_attention(
            inp["q"], inp["k"], inp["v"], inp["edge_src"], inp["edge_dst"],
            e_bias=inp["e_bias"], e_val=inp["e_val"],
            aggregators=("sum",), impl="lax")
        np.testing.assert_allclose(np.asarray(o_pl), np.asarray(o_lax),
                                   rtol=1e-5, atol=1e-5)
