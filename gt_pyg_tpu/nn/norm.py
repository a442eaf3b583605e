"""Normalization layers for padded graph batches.

The reference uses ``nn.BatchNorm1d`` / ``nn.LayerNorm`` over node/edge/
graph rows (``gt_conv.py:116-147``, ``model.py:129-134,163-168``). On TPU
the batch dimension contains padding rows, so BatchNorm must compute
moments over the *mask* — and, under data parallelism, optionally reduce
them across replicas (``axis_name``).

Semantics match torch for checkpoint-import parity: momentum 0.1 (new
stats weighted 0.1), eps 1e-5, biased variance for normalization,
unbiased variance for the running estimate.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over rows with an optional row mask and cross-replica
    reduction. State lives in the ``batch_stats`` collection."""

    num_features: int
    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = True,
                 return_affine: bool = False):
        """Normalize ``x`` (rows masked by ``mask`` for the moments).

        With ``return_affine=True``, returns the per-feature affine pair
        ``(a, b)`` (f32) such that ``norm(x) == x * a + b`` instead of
        the normalized tensor — running-stats updates still happen. The
        caller can then FOLD the normalization into a following matmul
        (``x @ (a[:, None] * W) + (b @ W + bias)``), eliminating the
        elementwise normalize pass over HBM entirely (BatchNorm is
        affine in x once the batch moments are known; this is exact up
        to float rounding)."""
        scale = self.param("scale", nn.initializers.ones, (self.num_features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.num_features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.num_features,), jnp.float32))

        # bf16 fast path: moments ride the MXU (s1 = 1ᵀx, s2 = diag(xᵀx),
        # both with f32 accumulation — the bf16 products are exact in f32,
        # so this matches the f32 elementwise path on bf16 inputs up to
        # accumulation order) and the normalize is a bf16 broadcast-FMA.
        # The f32 path materializes an f32 copy of x (and x·x) per norm —
        # profiled at ~1 ms per [131k,128] edge tensor on v5e; with 18
        # norms per step it dominated the non-kernel time.
        fast = x.dtype == jnp.bfloat16
        xf = x if fast else x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is None:
                cnt = jnp.asarray(x.shape[0], jnp.float32)
                xm = xf
            else:
                cnt = mask.astype(jnp.float32).sum()
                xm = jnp.where(mask[:, None], xf,
                               jnp.zeros((), xf.dtype))
            if fast:
                ones = jnp.ones((1, xm.shape[0]), jnp.bfloat16)
                s1 = jax.lax.dot(ones, xm,
                                 preferred_element_type=jnp.float32)[0]
                gram = jax.lax.dot_general(
                    xm, xm, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s2 = jnp.diagonal(gram)
            else:
                s1 = xm.sum(axis=0)
                s2 = (xm * xm).sum(axis=0)
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s1 / cnt
            var = jnp.maximum(s2 / cnt - mean * mean, 0.0)  # biased
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)

        a = jax.lax.rsqrt(var + self.eps) * scale      # f32 [F]
        b = bias - mean * a
        if return_affine:
            return a, b
        # The FMA itself is always f32: with a large pre-norm mean the
        # shift ``b`` is large and a bf16 ``x*a + b`` leaves an absolute
        # error of ~|b|/256 on an O(1) normalized output — measured to
        # destabilize bf16 training (loss climbs within ~30 epochs).
        # XLA fuses upcast-FMA-downcast into one bf16-in/bf16-out pass,
        # so this costs no extra HBM traffic over the bf16 FMA.
        y = xf.astype(jnp.float32) * a + b
        return y.astype(self.dtype)


class LayerNorm(nn.Module):
    """Per-row LayerNorm (torch-compatible: eps 1e-5, affine)."""

    num_features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = True):
        scale = self.param("scale", nn.initializers.ones, (self.num_features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,),
                          jnp.float32)
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = jnp.maximum((xf * xf).mean(axis=-1, keepdims=True) - mean * mean,
                          0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype)


_BN_NAMES = ("bn", "batchnorm", "batch_norm")
_LN_NAMES = ("ln", "layernorm", "layer_norm")


def make_norm(norm: str, num_features: int, axis_name: Optional[str] = None,
              dtype=jnp.float32, name: Optional[str] = None):
    """Resolve a norm spec string to a module (reference vocabulary at
    gt_conv.py:116-147)."""
    low = norm.lower()
    if low in _BN_NAMES:
        return MaskedBatchNorm(num_features=num_features, axis_name=axis_name,
                               dtype=dtype, name=name)
    if low in _LN_NAMES:
        return LayerNorm(num_features=num_features, dtype=dtype, name=name)
    raise ValueError(f"Unknown norm type: {norm}")
