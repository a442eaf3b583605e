"""MXU segment-moments pooling kernel (ops/pallas/pool.py) vs the XLA
scatter path: forward moments, multi_aggregate equivalence, gradients,
vmap, and the exactness gate.

The kernel replaces the readout pooling scatter-adds (reference
``gt_pyg/nn/model.py:158`` MultiAggregation over the graph index) with
one one-hot dot per row block — it must reproduce the f32 scatter
moments up to summation order for bf16-representable inputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gt_pyg_tpu.ops.pallas.pool import pool_moments
from gt_pyg_tpu.ops.segment import (_use_pool_matmul, multi_aggregate,
                                    segment_sum)


def _data(n=300, s=17, d=64, seed=0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, d)) * 2.0, dtype)
    # unsorted ids with a trash tail and two empty segments (3, s-2)
    ids = rng.integers(0, s, size=n)
    ids[ids == 3] = 4
    ids[ids == s - 2] = s - 1
    ids[-5:] = -1          # out-of-range rows must contribute nothing
    return x, jnp.asarray(ids, jnp.int32)


class TestForward:
    @pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
    def test_moments_match_scatter(self, dtype):
        x, ids = _data(dtype=jnp.bfloat16)
        x = x.astype(dtype)     # f32 case: exactly bf16-representable
        s = 17
        got_s, got_ss, got_c = pool_moments(x, ids, s, interpret=True)
        valid = np.asarray(ids) >= 0
        xf = np.asarray(x, np.float64)[valid]
        idv = np.asarray(ids)[valid]
        ref_s = np.zeros((s, x.shape[1]))
        ref_ss = np.zeros((s, x.shape[1]))
        ref_c = np.zeros(s)
        for i, g in enumerate(idv):
            ref_s[g] += xf[i]
            ref_ss[g] += xf[i] * xf[i]
            ref_c[g] += 1
        np.testing.assert_allclose(np.asarray(got_s), ref_s,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_ss), ref_ss,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got_c), ref_c)

    def test_empty_segments_zero(self):
        x, ids = _data()
        got_s, got_ss, got_c = pool_moments(x, ids, 17, interpret=True)
        for empty in (3, 15):
            assert float(got_c[empty]) == 0.0
            np.testing.assert_array_equal(np.asarray(got_s[empty]), 0.0)
            np.testing.assert_array_equal(np.asarray(got_ss[empty]), 0.0)

    def test_row_padding_boundary(self):
        """N not a multiple of the kernel row block: the padded tail
        must contribute nothing."""
        x, ids = _data(n=333)
        got_s, _, got_c = pool_moments(x, ids, 17, interpret=True)
        ref = segment_sum(x.astype(jnp.float32), jnp.maximum(ids, 0) *
                          (ids >= 0) + 17 * (ids < 0), 18)[:17]
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        assert float(got_c.sum()) == float((np.asarray(ids) >= 0).sum())


class TestMultiAggregate:
    def _both(self, x, ids, s, aggrs, monkeypatch, lowp_exact=True):
        monkeypatch.setenv("GT_TPU_POOL", "off")
        ref = multi_aggregate(x, ids, s, aggrs, sorted_ids=False)
        monkeypatch.setenv("GT_TPU_POOL", "matmul")
        got = multi_aggregate(x, ids, s, aggrs, sorted_ids=False,
                              lowp_exact=lowp_exact)
        return np.asarray(ref, np.float64), np.asarray(got, np.float64)

    def test_flagship_aggregators(self, monkeypatch):
        """sum/mean/max/std — the production pooling config — must agree
        between the scatter path and the moments kernel."""
        x, ids = _data()
        ids = jnp.maximum(ids, 0)       # in-range ids (model layout)
        # promoted-by-mask f32, the flagship case
        xp = x.astype(jnp.float32)
        ref, got = self._both(xp, ids, 17, ("sum", "mean", "max", "std"),
                              monkeypatch)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_var_small_against_large_mean(self, monkeypatch):
        """var = E[x²]−E[x]² with |x|≈10 and tiny spread — the hi+lo
        split of x² must not lose the cancellation (a single-pass bf16
        x² would)."""
        rng = np.random.default_rng(1)
        base = jnp.asarray(rng.normal(size=(1, 32)) * 10.0, jnp.bfloat16)
        noise = jnp.asarray(rng.normal(size=(64, 32)) * 0.05, jnp.bfloat16)
        x = (base.astype(jnp.float32) + noise.astype(jnp.float32)) \
            .astype(jnp.bfloat16).astype(jnp.float32)
        ids = jnp.asarray(rng.integers(0, 4, size=64), jnp.int32)
        ref, got = self._both(x, ids, 4, ("var",), monkeypatch)
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-6)

    def test_gate_respects_lowp_exact(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 16)),
                        jnp.float32)
        assert not _use_pool_matmul(x, 8, lowp_exact=False)

    def test_gate_vmem_cap(self, monkeypatch):
        """Auto mode must refuse segment counts whose kernel residency
        ([s_pad, 3d] f32 accumulator + [1024, s_pad] one-hot) exceeds
        the VMEM cap — e.g. the lax attention fallback's per-node
        softmax denominators (num_segments ≈ padded node count), which
        would fail Mosaic compilation. Forced matmul mode stays
        unconditional (tests pin it on CPU interpret)."""
        monkeypatch.setenv("GT_TPU_POOL", "auto")
        x = jnp.zeros((16, 128), jnp.bfloat16)
        assert not _use_pool_matmul(x, 40960, lowp_exact=False)
        monkeypatch.setenv("GT_TPU_POOL", "matmul")
        assert _use_pool_matmul(x, 40960, lowp_exact=False)

    def test_huge_segment_count_scatter_fallback(self, monkeypatch):
        """multi_aggregate with a lax-fallback-sized num_segments must
        run (scatter path) rather than attempt the kernel."""
        monkeypatch.setenv("GT_TPU_POOL", "auto")
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(64, 8)), jnp.bfloat16)
        ids = jnp.asarray(np.sort(rng.integers(0, 40960, size=64)),
                          jnp.int32)
        out = multi_aggregate(x, ids, 40960, ("sum", "mean"),
                              sorted_ids=True)
        assert out.shape == (40960, 16)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_gradients_match(self, monkeypatch):
        x, ids = _data(n=128, s=9, d=32)
        ids = jnp.maximum(ids, 0)
        xp = x.astype(jnp.float32)
        w = jnp.asarray(np.random.default_rng(2).normal(size=(9, 32 * 3)),
                        jnp.float32)

        def loss(mode, xv):
            monkeypatch.setenv("GT_TPU_POOL", mode)
            out = multi_aggregate(xv, ids, 9, ("sum", "mean", "std"),
                                  sorted_ids=False, lowp_exact=True)
            return jnp.sum(out * w)

        g_ref = jax.grad(lambda v: loss("off", v))(xp)
        g_got = jax.grad(lambda v: loss("matmul", v))(xp)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4)

    def test_vmap(self, monkeypatch):
        monkeypatch.setenv("GT_TPU_POOL", "matmul")
        x, ids = _data(n=96, s=7, d=16)
        ids = jnp.maximum(ids, 0)
        xs = jnp.stack([x, x * 2.0, -x]).astype(jnp.float32)

        def one(xv):
            return multi_aggregate(xv, ids, 7, ("sum", "std"),
                                   sorted_ids=False, lowp_exact=True)

        got = jax.vmap(one)(xs)
        for k in range(3):
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(one(xs[k])),
                                       rtol=1e-5, atol=1e-5)


class TestModelLevel:
    def test_model_forward_matches_scatter_pooling(self, monkeypatch):
        """Full GraphTransformerNet forward (bf16): pooled readout with
        the moments kernel vs the scatter path."""
        from gt_pyg_tpu.data import get_tensor_data, pad_graph_batch
        from gt_pyg_tpu.nn import GraphTransformerNet

        ds = get_tensor_data(["CCO", "c1ccccc1", "CCNC", "CC(=O)O"],
                             [[1.0], [2.0], [0.5], [1.5]], progress=False)
        batch = pad_graph_batch(ds, node_multiple=64, edge_multiple=128)
        model = GraphTransformerNet(
            node_dim_in=140, edge_dim_in=39, hidden_dim=32,
            num_gt_layers=2, num_heads=4, dropout=0.0, norm="bn",
            gate=True, aggregators=("sum", "mean", "max", "std"),
            dtype=jnp.bfloat16)
        monkeypatch.setenv("GT_TPU_POOL", "off")
        v = model.init({"params": jax.random.PRNGKey(0)}, batch,
                       deterministic=True)
        ref, _ = model.apply(v, batch, deterministic=True)
        monkeypatch.setenv("GT_TPU_POOL", "matmul")
        got, _ = model.apply(v, batch, deterministic=True)
        # the pooled moments agree to summation order (~1e-6); the bf16
        # readout MLPs can flip one bf16 ulp (2^-8 relative) downstream,
        # so the bound is one-ulp-level, not exact
        np.testing.assert_allclose(np.asarray(got, np.float64),
                                   np.asarray(ref, np.float64),
                                   rtol=1e-2, atol=1e-2)
