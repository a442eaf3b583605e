"""Dropout with a cheap random-bit path for bf16 activations.

flax's ``nn.Dropout`` draws one u32 random word per element (via
``jax.random.bernoulli`` → uniform f32), so a single FFN-hidden mask on
the flagship batch is 2×u32[131072,256] ≈ 268 MB of generated+read
random bits per application — profiled as a first-order cost of the
train step on v5e (the role of torch's ``nn.Dropout`` at reference
``gt_pyg/nn/gt_conv.py:131-141``/``mlp.py:84``).

``Dropout`` below keeps flax semantics but, for bf16 inputs, draws
**one u8 per element** (4× less RNG traffic) and thresholds at
``round(keep·256)`` — the keep probability is quantized to 1/256
(≤0.2% off nominal; the inverted-scale uses the *quantized* probability
so E[dropout(x)] == x exactly). f32 inputs keep the exact
``bernoulli`` path (golden-parity tests run in f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class Dropout(nn.Module):
    """Drop-in replacement for ``nn.Dropout`` (rng collection
    "dropout"; inverted scaling)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        if x.dtype == jnp.bfloat16:
            thresh = max(1, min(255, int(round(keep * 256.0))))
            bits = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
            scale = jnp.asarray(256.0 / thresh, x.dtype)
            return jnp.where(bits < jnp.uint8(thresh), x * scale,
                             jnp.zeros((), x.dtype))
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros((), x.dtype))
