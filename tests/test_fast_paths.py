"""bf16 fast paths: MXU BatchNorm moments and u8 dropout.

The bf16 training configuration uses two bandwidth optimizations that
must stay numerically faithful to the f32 reference semantics:

* ``MaskedBatchNorm`` computes s1/s2 via MXU contractions with f32
  accumulation when the input is bf16 (norm.py) — statistics must match
  the f32 elementwise path on the same (bf16-rounded) inputs;
* ``nn/dropout.Dropout`` draws u8 random bits for bf16 inputs with the
  keep probability quantized to 1/256 — the empirical keep rate and the
  inverted-scale expectation must match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gt_pyg_tpu.nn.dropout import Dropout
from gt_pyg_tpu.nn.norm import MaskedBatchNorm


class TestFastBatchNorm:
    @pytest.mark.parametrize("with_mask", [False, True])
    def test_bf16_stats_match_f32_path(self, with_mask):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((512, 64)).astype(np.float32) * 3 + 1.5
        xb = jnp.asarray(x, jnp.bfloat16)
        mask = (jnp.arange(512) < 400) if with_mask else None

        bn16 = MaskedBatchNorm(num_features=64, dtype=jnp.bfloat16)
        bn32 = MaskedBatchNorm(num_features=64, dtype=jnp.float32)
        v16 = bn16.init(jax.random.PRNGKey(0), xb, mask,
                        use_running_average=False)
        # same bf16-rounded inputs through the f32 elementwise path
        xf = xb.astype(jnp.float32)
        v32 = bn32.init(jax.random.PRNGKey(0), xf, mask,
                        use_running_average=False)

        y16, s16 = bn16.apply(v16, xb, mask, use_running_average=False,
                              mutable=["batch_stats"])
        y32, s32 = bn32.apply(v32, xf, mask, use_running_average=False,
                              mutable=["batch_stats"])

        np.testing.assert_allclose(
            np.asarray(s16["batch_stats"]["mean"]),
            np.asarray(s32["batch_stats"]["mean"]), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(s16["batch_stats"]["var"]),
            np.asarray(s32["batch_stats"]["var"]), rtol=1e-4, atol=1e-4)
        # normalized output agrees to bf16 resolution
        np.testing.assert_allclose(
            np.asarray(y16, dtype=np.float32), np.asarray(y32),
            rtol=2e-2, atol=2e-2)

    def test_bf16_padding_invariance(self):
        """Growing the padded region must not change masked stats."""
        rng = np.random.default_rng(1)
        x = rng.standard_normal((100, 32)).astype(np.float32)
        bn = MaskedBatchNorm(num_features=32, dtype=jnp.bfloat16)
        for pad in (128, 256):
            xp = np.zeros((pad, 32), np.float32)
            xp[:100] = x
            xb = jnp.asarray(xp, jnp.bfloat16)
            mask = jnp.arange(pad) < 100
            v = bn.init(jax.random.PRNGKey(0), xb, mask,
                        use_running_average=False)
            _, s = bn.apply(v, xb, mask, use_running_average=False,
                            mutable=["batch_stats"])
            if pad == 128:
                ref = np.asarray(s["batch_stats"]["mean"])
            else:
                np.testing.assert_allclose(
                    np.asarray(s["batch_stats"]["mean"]), ref,
                    rtol=1e-5, atol=1e-6)


class TestFastDropout:
    def test_f32_matches_flax_semantics(self):
        x = jnp.ones((1000, 16), jnp.float32)
        d = Dropout(rate=0.3)
        y = d.apply({}, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(0)})
        vals = np.unique(np.asarray(y))
        assert len(vals) == 2 and vals[0] == 0.0
        np.testing.assert_allclose(vals[1], 1 / 0.7, rtol=1e-6)

    def test_bf16_keep_rate_and_expectation(self):
        x = jnp.ones((4096, 64), jnp.bfloat16)
        d = Dropout(rate=0.3)
        y = np.asarray(d.apply(
            {}, x, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)}), dtype=np.float32)
        keep_frac = (y != 0).mean()
        # quantized keep prob is round(0.7*256)/256 = 179/256
        assert abs(keep_frac - 179 / 256) < 0.01
        # inverted scaling keeps the expectation at 1 (scale rounds to
        # bf16, keep_frac fluctuates — generous tolerance)
        assert abs(y.mean() - 1.0) < 0.02

    def test_deterministic_passthrough_and_zero_rate(self):
        x = jnp.asarray(np.random.default_rng(2).standard_normal((8, 4)),
                        jnp.bfloat16)
        assert (np.asarray(Dropout(rate=0.5).apply(
            {}, x, deterministic=True)) == np.asarray(x)).all()
        assert (np.asarray(Dropout(rate=0.0).apply(
            {}, x, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(0)})) ==
            np.asarray(x)).all()

    def test_rate_one_zeroes(self):
        x = jnp.ones((8, 4), jnp.bfloat16)
        y = Dropout(rate=1.0).apply(
            {}, x, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(0)})
        assert (np.asarray(y) == 0).all()
