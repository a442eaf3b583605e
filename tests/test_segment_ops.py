"""Segment-op correctness vs naive numpy references (the kernel-vs-lax
reference test pattern from SURVEY.md §4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gt_pyg_tpu.ops import segment as S


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    ids = np.sort(rng.integers(0, 6, size=40)).astype(np.int32)
    x = rng.standard_normal((40, 3)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(ids), 8  # 2 empty segments


def naive(x, ids, num_segments, fn, empty=0.0):
    """Empty segments: PyG yields 0 for most reduce aggregations but
    sqrt(1e-5) for std (computed from zeroed var)."""
    x, ids = np.asarray(x), np.asarray(ids)
    out = np.full((num_segments,) + x.shape[1:], empty, dtype=np.float64)
    for s in range(num_segments):
        rows = x[ids == s]
        if len(rows):
            out[s] = fn(rows)
    return out


class TestAggregators:
    @pytest.mark.parametrize("name,ref", [
        ("sum", lambda r: r.sum(0)),
        ("mean", lambda r: r.mean(0)),
        ("max", lambda r: r.max(0)),
        ("min", lambda r: r.min(0)),
        ("mul", lambda r: r.prod(0)),
        ("var", lambda r: r.var(0)),
        pytest.param("std", lambda r: np.sqrt(r.var(0) + 1e-5), id="std"),
        ("median", lambda r: np.sort(r, axis=0)[(len(r) - 1) // 2]),
    ])
    def test_matches_naive(self, data, name, ref):
        x, ids, ns = data
        got = S.multi_aggregate(x, ids, ns, (name,), max_per_segment=40)
        empty = np.sqrt(1e-5) if name == "std" else 0.0
        want = naive(x, ids, ns, ref, empty=empty)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                                   atol=1e-5)

    def test_concat_multi(self, data):
        x, ids, ns = data
        got = S.multi_aggregate(x, ids, ns, ("sum", "mean", "max", "std"))
        assert got.shape == (ns, 12)

    def test_softmax_aggr(self, data):
        x, ids, ns = data
        got = np.asarray(S.multi_aggregate(x, ids, ns, ("softmax",)))
        xn, idn = np.asarray(x), np.asarray(ids)
        for s in range(ns):
            rows = xn[idn == s]
            if len(rows) == 0:
                continue
            ex = np.exp(rows - rows.max(0))
            a = ex / (ex.sum(0) + 1e-16)
            np.testing.assert_allclose(got[s], (a * rows).sum(0), rtol=1e-4,
                                       atol=1e-5)


class TestSegmentSoftmax:
    def test_sums_to_one(self, data):
        x, ids, ns = data
        alpha = np.asarray(S.segment_softmax(x, ids, ns))
        idn = np.asarray(ids)
        for s in np.unique(idn):
            np.testing.assert_allclose(alpha[idn == s].sum(0), 1.0, rtol=1e-5)

    def test_stability_large_logits(self, data):
        _, ids, ns = data
        big = jnp.full((40, 2), 1e4)
        alpha = np.asarray(S.segment_softmax(big, ids, ns))
        assert np.all(np.isfinite(alpha))

    def test_unsorted_ids_match_sorted(self, data):
        """multi_aggregate's scatter-free rowptr counts require sorted
        ids; the unsorted fallback (counting scatter) must agree."""
        x, ids, ns = data
        rng = np.random.default_rng(3)
        perm = rng.permutation(x.shape[0])
        got = S.multi_aggregate(x[perm], jnp.asarray(np.asarray(ids)[perm]),
                                ns, ("sum", "mean", "max", "std"),
                                sorted_ids=False)
        want = S.multi_aggregate(x, ids, ns, ("sum", "mean", "max", "std"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_shared_moment_grads_match_naive(self, data):
        """Grads of the memoized sum/mean/var/std path vs a direct
        per-aggregator formulation (counts are non-differentiable)."""
        import jax

        x, ids, ns = data
        idn = np.asarray(ids)
        cnt = np.maximum(np.bincount(idn, minlength=ns), 1.0)
        cnt = jnp.asarray(cnt.astype(np.float32))[:, None]

        def f_fast(x):
            out = S.multi_aggregate(x, ids, ns,
                                    ("sum", "mean", "var", "std"))
            return jnp.sum(out ** 2)

        def f_direct(x):
            s = jax.ops.segment_sum(x, ids, num_segments=ns)
            mean = s / cnt
            m2 = jax.ops.segment_sum(x * x, ids, num_segments=ns) / cnt
            var = m2 - mean * mean
            std = jnp.sqrt(jax.nn.relu(var) + 1e-5)
            return jnp.sum(jnp.concatenate([s, mean, var, std], -1) ** 2)

        np.testing.assert_allclose(np.asarray(jax.grad(f_fast)(x)),
                                   np.asarray(jax.grad(f_direct)(x)),
                                   rtol=1e-4, atol=1e-5)

    def test_trash_segment_isolated(self):
        """Padding edges pointing at the trash segment must not affect real
        segments."""
        ids = jnp.asarray(np.array([0, 0, 1, 3, 3], dtype=np.int32))
        x = jnp.asarray(np.array([[1.0], [2.0], [3.0], [99.0], [99.0]],
                                 dtype=np.float32))
        out = np.asarray(S.multi_aggregate(x, ids, 4, ("sum",)))
        np.testing.assert_allclose(out[:3, 0], [3.0, 3.0, 0.0])


class TestSortedGather:
    def test_gather_grads_match_plain(self):
        import jax

        from gt_pyg_tpu.ops.gather import gather_by_dst, gather_by_src

        rng = np.random.default_rng(0)
        n, e = 33, 70
        x = jnp.asarray(rng.standard_normal((n + 1, 4)).astype(np.float32))
        dst = jnp.asarray(np.sort(rng.integers(0, n, size=e)).astype(np.int32))
        src = jnp.asarray(rng.integers(0, n, size=e).astype(np.int32))
        perm = jnp.asarray(np.argsort(np.asarray(src),
                                      kind="stable").astype(np.int32))

        def f_sorted(x):
            return jnp.sum(gather_by_dst(x, dst) ** 2) + \
                jnp.sum(gather_by_src(x, src, perm) ** 3)

        def f_plain(x):
            return jnp.sum(x[dst] ** 2) + jnp.sum(x[src] ** 3)

        np.testing.assert_allclose(
            np.asarray(jax.grad(f_sorted)(x)),
            np.asarray(jax.grad(f_plain)(x)), rtol=1e-5, atol=1e-5)
