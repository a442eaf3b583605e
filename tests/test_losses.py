"""Composite-loss tests: exact parity vs an independent torch
implementation of the notebook math (train_logd.ipynb cell 7) for the
deterministic terms, behavioral checks for the sampled Kendall term."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gt_pyg_tpu.train.losses import (
    masked_weighted_rae_loss,
    masked_weighted_huber_loss,
    masked_weighted_corr_loss,
    masked_weighted_kendall_rank_loss,
    masked_r2_style_loss,
    custom_loss,
    mae_loss,
    compute_task_scales,
)


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    B, T = 64, 3
    y = rng.standard_normal((B, T)).astype(np.float32)
    pred = (y + 0.3 * rng.standard_normal((B, T))).astype(np.float32)
    mask = (rng.random((B, T)) > 0.2).astype(np.float32)
    y[mask == 0] = np.nan  # some missing labels are NaN in y too
    scale = np.array([0.5, 1.0, 2.0], np.float32)
    return (jnp.asarray(pred), jnp.asarray(y), jnp.asarray(mask),
            jnp.asarray(scale))


def _torch_ref(pred, y, mask, scale):
    """Independent torch implementation of the deterministic loss terms,
    written from the documented math."""
    import torch

    p = torch.tensor(np.asarray(pred))
    yt = torch.tensor(np.asarray(y))
    m = torch.tensor(np.asarray(mask))
    ts = torch.tensor(np.asarray(scale))
    eps = 1e-8

    valid = (m > 0) & torch.isfinite(yt) & torch.isfinite(p)
    w = valid.float()
    diff = torch.where(valid, p - yt, torch.zeros_like(p))

    # RAE
    abs_err = diff.abs() / (ts + eps)
    sum_w = w.sum(0)
    rae_t = (abs_err * w).sum(0) / sum_w.clamp_min(eps)
    rae = rae_t[sum_w > 0].mean()

    # Huber (delta=.5, scaled)
    d = diff / (ts + eps)
    delta = 0.5
    ad = d.abs()
    quad = torch.minimum(ad, torch.tensor(delta))
    hub = 0.5 * quad ** 2 + delta * (ad - quad)
    hub_t = (hub * w).sum(0) / sum_w.clamp_min(eps)
    huber = hub_t[sum_w > 0].mean()

    # Pearson corr loss
    sw = sum_w.clamp_min(eps)
    pv = torch.where(valid, p, torch.zeros_like(p))
    yv = torch.where(valid, yt, torch.zeros_like(yt))
    mp = (w * pv).sum(0) / sw
    my = (w * yv).sum(0) / sw
    pc = torch.where(valid, pv - mp, torch.zeros_like(p))
    yc = torch.where(valid, yv - my, torch.zeros_like(p))
    cov = (w * pc * yc).sum(0)
    corr = cov / (torch.sqrt((w * pc * pc).sum(0) + eps)
                  * torch.sqrt((w * yc * yc).sum(0) + eps) + eps)
    corr_l = (1 - corr)[sum_w > 0].mean()

    # R2-style
    cnt = valid.float().sum(0)
    mean_y = yv.sum(0) / (cnt + eps)
    ycent = torch.where(valid, yt - mean_y, torch.zeros_like(yt))
    sse = ((pv - yv) ** 2).sum(0)
    var = (ycent ** 2).sum(0)
    good = (cnt > 1) & (var > eps)
    r2 = (sse / (var + eps))[good].mean()

    return (float(rae), float(huber), float(corr_l), float(r2))


class TestDeterministicTerms:
    def test_rae_matches_torch(self, data):
        pytest.importorskip("torch")
        pred, y, mask, scale = data
        want = _torch_ref(pred, y, mask, scale)[0]
        got = float(masked_weighted_rae_loss(pred, y, mask, scale))
        assert got == pytest.approx(want, rel=1e-5)

    def test_huber_matches_torch(self, data):
        pytest.importorskip("torch")
        pred, y, mask, scale = data
        want = _torch_ref(pred, y, mask, scale)[1]
        got = float(masked_weighted_huber_loss(pred, y, mask, delta=0.5,
                                               task_scale=scale))
        assert got == pytest.approx(want, rel=1e-5)

    def test_corr_matches_torch(self, data):
        pytest.importorskip("torch")
        pred, y, mask, scale = data
        want = _torch_ref(pred, y, mask, scale)[2]
        got = float(masked_weighted_corr_loss(pred, y, mask))
        assert got == pytest.approx(want, rel=1e-4)

    def test_r2_matches_torch(self, data):
        pytest.importorskip("torch")
        pred, y, mask, scale = data
        want = _torch_ref(pred, y, mask, scale)[3]
        got = float(masked_r2_style_loss(pred, y, mask))
        assert got == pytest.approx(want, rel=1e-4)


class TestMaskSemantics:
    def test_all_masked_returns_zero(self):
        pred = jnp.ones((8, 2))
        y = jnp.ones((8, 2))
        mask = jnp.zeros((8, 2))
        assert float(masked_weighted_rae_loss(pred, y, mask,
                                              jnp.ones(2))) == 0.0
        assert float(masked_weighted_corr_loss(pred, y, mask)) == 0.0
        assert float(masked_r2_style_loss(pred, y, mask)) == 0.0

    def test_nan_labels_ignored(self):
        y = jnp.asarray([[1.0], [jnp.nan], [3.0], [jnp.nan]])
        pred = jnp.asarray([[1.5], [99.0], [2.5], [99.0]])
        mask = jnp.ones((4, 1))
        got = float(mae_loss(pred, y, mask))
        assert got == pytest.approx(0.5)

    def test_task_without_data_excluded(self):
        y = jnp.asarray([[1.0, jnp.nan], [2.0, jnp.nan]])
        pred = jnp.asarray([[1.0, 5.0], [2.0, 5.0]])
        mask = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])
        got = float(masked_weighted_huber_loss(pred, y, mask, delta=1.0))
        assert got == pytest.approx(0.0)


class TestKendall:
    def test_ordering_direction(self):
        rng = np.random.default_rng(1)
        y = jnp.asarray(rng.standard_normal((64, 1)).astype(np.float32))
        mask = jnp.ones((64, 1))
        good = float(masked_weighted_kendall_rank_loss(
            y * 2.0, y, mask, rng=jax.random.PRNGKey(0)))
        bad = float(masked_weighted_kendall_rank_loss(
            -y, y, mask, rng=jax.random.PRNGKey(0)))
        assert good < bad

    def test_too_few_valid_is_zero(self):
        y = jnp.asarray([[1.0], [jnp.nan]])
        pred = jnp.asarray([[1.0], [2.0]])
        mask = jnp.asarray([[1.0], [0.0]])
        got = float(masked_weighted_kendall_rank_loss(
            pred, y, mask, rng=jax.random.PRNGKey(0)))
        assert got == 0.0

    def test_jit_compatible(self):
        f = jax.jit(lambda p, y, m, r: masked_weighted_kendall_rank_loss(
            p, y, m, rng=r))
        rng = np.random.default_rng(2)
        p = jnp.asarray(rng.standard_normal((32, 2)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((32, 2)).astype(np.float32))
        assert np.isfinite(float(f(p, y, jnp.ones((32, 2)),
                                   jax.random.PRNGKey(0))))


class TestKendallSamplingEquivalence:
    """DESIGN.md §9 deviation audit: the fixed-shape pair sampler (probe
    with replacement + top-k by |Δy|) vs the reference's randperm over
    all C(n,2) pairs + top-k (train_logd.ipynb cell 7). Measured means
    agree to ~0.01% on this configuration (50 seeds); the test pins
    equivalence at a 1.5% relative bound, far above Monte-Carlo noise
    (~0.9% at 3σ for 30 seeds)."""

    def test_means_match_reference_sampler(self):
        from gt_pyg_tpu.train.losses import _valid_and_weights

        rng = np.random.default_rng(0)
        B, tau, seeds = 400, 2.0, 30
        y = rng.standard_normal((B, 1)).astype(np.float32)
        pred = (0.6 * y
                + 0.8 * rng.standard_normal((B, 1))).astype(np.float32)
        mask = np.ones((B, 1), np.float32)
        yj, pj, mj = map(jnp.asarray, (y, pred, mask))
        _, w = _valid_and_weights(pj, yj, mj)
        w = np.asarray(w)[:, 0]
        ii, jj_ = np.triu_indices(B, k=1)

        def ref_loss(seed):
            r = np.random.default_rng(seed)
            choose = r.permutation(len(ii))[:8192]
            a, b = ii[choose], jj_[choose]
            top = np.argsort(-np.abs(y[a, 0] - y[b, 0]),
                             kind="stable")[:512]
            a, b = a[top], b[top]
            s = np.sign(y[a, 0] - y[b, 0])
            nt = s != 0
            wp = np.where(nt, 0.5 * (w[a] + w[b]), 0.0)
            lp = np.where(nt, np.logaddexp(
                0.0, -s * (pred[a, 0] - pred[b, 0]) / tau), 0.0)
            return float(lp @ wp / max(wp.sum(), 1e-8))

        ref = np.array([ref_loss(s) for s in range(seeds)])
        ours = np.array([
            float(masked_weighted_kendall_rank_loss(
                pj, yj, mj, rng=jax.random.PRNGKey(s), tau_temp=tau))
            for s in range(seeds)])
        rel = abs(ref.mean() - ours.mean()) / ref.mean()
        assert rel < 0.015, (ref.mean(), ours.mean(), rel)

    def test_sparse_task_probe_count(self):
        """On a task with valid-fraction f, the reference probes 8192
        valid pairs; the 'valid' sampler matches that, while the legacy
        'uniform' sampler only yields ~f²·8192 — verify the new sampler
        selects a full top-k candidate set on a sparse task."""
        rng = np.random.default_rng(3)
        B, f = 512, 0.1
        y = rng.standard_normal((B, 1)).astype(np.float32)
        pred = (0.5 * y
                + rng.standard_normal((B, 1))).astype(np.float32)
        mask = (rng.random((B, 1)) < f).astype(np.float32)
        yj, pj, mj = map(jnp.asarray, (y, pred, mask))

        def mean_loss(sampler):
            return np.mean([
                float(masked_weighted_kendall_rank_loss(
                    pj, yj, mj, rng=jax.random.PRNGKey(s), tau_temp=2.0,
                    pair_sampler=sampler))
                for s in range(20)])

        # exact all-pairs-top-k value on the valid subset (n~51 =>
        # C(n,2)~1275 pairs; top-512 by |dy|, the reference's selection)
        idx = np.where(mask[:, 0] > 0)[0]
        ii, jj_ = np.triu_indices(len(idx), k=1)
        a, b = idx[ii], idx[jj_]
        top = np.argsort(-np.abs(y[a, 0] - y[b, 0]), kind="stable")[:512]
        a, b = a[top], b[top]
        s = np.sign(y[a, 0] - y[b, 0])
        nt = s != 0
        lp = np.where(nt, np.logaddexp(
            0.0, -s * (pred[a, 0] - pred[b, 0]) / 2.0), 0.0)
        from gt_pyg_tpu.train.losses import _valid_and_weights
        _, w = _valid_and_weights(pj, yj, mj)
        w = np.asarray(w)[:, 0]
        wp = np.where(nt, 0.5 * (w[a] + w[b]), 0.0)
        exact = float(lp @ wp / max(wp.sum(), 1e-8))

        got_valid = mean_loss("valid")
        got_uniform = mean_loss("uniform")
        # the valid sampler's estimate must sit at least as close to the
        # exact top-k objective as the legacy uniform sampler's
        assert abs(got_valid - exact) <= abs(got_uniform - exact) + 1e-3, (
            exact, got_valid, got_uniform)
        assert abs(got_valid - exact) / exact < 0.05, (exact, got_valid)


class TestComposite:
    def test_default_weights_combine(self, data):
        pred, y, mask, scale = data
        total = float(custom_loss(pred, y, mask, w_rae=1.0, w_huber=0.25,
                                  w_corr=0.25, w_tau=0.0, w_r2=0.1,
                                  huber_delta=0.5, task_scale=scale))
        parts = (
            1.0 * float(masked_weighted_rae_loss(pred, y, mask, scale))
            + 0.25 * float(masked_weighted_huber_loss(
                pred, y, mask, delta=0.5, task_scale=scale))
            + 0.25 * float(masked_weighted_corr_loss(pred, y, mask))
            + 0.1 * float(masked_r2_style_loss(pred, y, mask)))
        assert total == pytest.approx(parts, rel=1e-5)

    def test_grad_finite(self, data):
        pred, y, mask, scale = data

        def f(p):
            return custom_loss(p, y, mask, task_scale=scale,
                               rng=jax.random.PRNGKey(0))

        g = jax.grad(f)(pred)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestTaskScales:
    def test_mad(self):
        y = np.array([[1.0], [2.0], [3.0], [4.0], [100.0]])
        m = np.ones((5, 1))
        s = compute_task_scales(y, m)
        assert s[0] == pytest.approx(1.0)  # MAD of [1,2,3,4,100] = 1

    def test_few_samples_default_one(self):
        y = np.array([[1.0], [2.0]])
        m = np.ones((2, 1))
        assert compute_task_scales(y, m)[0] == 1.0


class TestMultitaskNaNSafety:
    """Sparse multi-task labels (NaN for missing) must never poison the
    composite loss or its gradient — regression for the kendall-pair
    NaN*0 bug that zeroed a 9-endpoint training run."""

    def test_sparse_multitask_finite(self):
        rng = np.random.default_rng(0)
        B, T = 64, 9
        y = rng.standard_normal((B, T)).astype(np.float32)
        mask = (rng.random((B, T)) > 0.6).astype(np.float32)
        y[mask == 0] = np.nan
        y[:, 4] = np.nan
        mask[:, 4] = 0
        pred = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))

        def f(p):
            return custom_loss(p, jnp.asarray(y), jnp.asarray(mask),
                               task_scale=jnp.ones(T),
                               rng=jax.random.PRNGKey(0))

        assert np.isfinite(float(f(pred)))
        assert bool(jnp.all(jnp.isfinite(jax.grad(f)(pred))))


class TestTaskWeights:
    """Per-endpoint loss weighting (the round-6 multitask-interference
    lever): all-ones weights must reproduce the uniform task mean
    exactly; non-uniform weights must tilt every composite term toward
    the upweighted task; tasks without data contribute no weight."""

    def _setup(self):
        rng = np.random.default_rng(7)
        B, T = 64, 9
        y = rng.standard_normal((B, T)).astype(np.float32)
        mask = (rng.random((B, T)) > 0.4).astype(np.float32)
        y[mask == 0] = np.nan
        pred = (np.nan_to_num(y) + 0.3
                * rng.standard_normal((B, T))).astype(np.float32)
        return (jnp.asarray(pred), jnp.asarray(y), jnp.asarray(mask),
                jnp.ones((T,), jnp.float32))

    def test_ones_equal_uniform(self):
        pred, y, mask, ts = self._setup()
        kw = dict(task_scale=ts, rng=jax.random.PRNGKey(3))
        base = custom_loss(pred, y, mask, **kw)
        ones = custom_loss(pred, y, mask, task_weight=jnp.ones(9), **kw)
        assert float(base) == pytest.approx(float(ones), rel=1e-6)

    def test_upweight_tilts_each_term(self):
        pred, y, mask, ts = self._setup()
        w = jnp.ones((9,)).at[0].set(5.0)
        for fn in (
            lambda tw: masked_weighted_rae_loss(
                pred, y, mask, ts, task_weight=tw),
            lambda tw: masked_weighted_huber_loss(
                pred, y, mask, task_scale=ts, task_weight=tw),
            lambda tw: masked_weighted_corr_loss(
                pred, y, mask, task_weight=tw),
            lambda tw: masked_r2_style_loss(pred, y, mask, task_weight=tw),
            lambda tw: masked_weighted_kendall_rank_loss(
                pred, y, mask, rng=jax.random.PRNGKey(0), task_weight=tw),
        ):
            lu, lw = float(fn(None)), float(fn(w))
            # weighted mean moves toward task 0's per-task loss; it must
            # differ from uniform (task 0 is not exactly at the mean)
            assert np.isfinite(lw) and lu != pytest.approx(lw, abs=1e-9)

    def test_weighted_mean_closed_form(self):
        """Weighted RAE == sum(w_t * rae_t) / sum(w_t) over tasks with
        data (computed per-task via one-hot weight probes)."""
        pred, y, mask, ts = self._setup()
        per_task = []
        for t in range(9):
            onehot = jnp.zeros((9,)).at[t].set(1.0)
            per_task.append(float(masked_weighted_rae_loss(
                pred, y, mask, ts, task_weight=onehot)))
        w = np.arange(1, 10, dtype=np.float32)
        expect = float((w * np.array(per_task)).sum() / w.sum())
        got = float(masked_weighted_rae_loss(
            pred, y, mask, ts, task_weight=jnp.asarray(w)))
        assert got == pytest.approx(expect, rel=1e-5)

    def test_empty_task_gets_no_weight(self):
        pred, y, mask, ts = self._setup()
        y = y.at[:, 2].set(jnp.nan)
        mask = mask.at[:, 2].set(0.0)
        # giant weight on the empty task must be inert
        w = jnp.ones((9,)).at[2].set(1e6)
        lu = float(masked_weighted_rae_loss(pred, y, mask, ts))
        lw = float(masked_weighted_rae_loss(pred, y, mask, ts,
                                            task_weight=w))
        assert np.isfinite(lw)
        base_w = float(masked_weighted_rae_loss(
            pred, y, mask, ts, task_weight=jnp.ones(9)))
        assert lw == pytest.approx(base_w, rel=1e-6)
        assert lu == pytest.approx(base_w, rel=1e-6)

    def test_trainer_config_plumbing(self):
        """TrainConfig.task_weights reaches the composite loss."""
        from gt_pyg_tpu.train.trainer import TrainConfig, Trainer

        pred, y, mask, ts = self._setup()
        cfg_u = TrainConfig(endpoints=tuple("t%d" % i for i in range(9)))
        cfg_w = TrainConfig(endpoints=tuple("t%d" % i for i in range(9)),
                            task_weights=(3.0,) + (1.0,) * 8)
        t_u = Trainer.__new__(Trainer)
        t_u.cfg = cfg_u
        t_w = Trainer.__new__(Trainer)
        t_w.cfg = cfg_w
        lu = float(t_u._loss(pred, y, mask, ts, jax.random.PRNGKey(0)))
        lw = float(t_w._loss(pred, y, mask, ts, jax.random.PRNGKey(0)))
        assert np.isfinite(lu) and np.isfinite(lw) and lu != lw
