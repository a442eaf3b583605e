"""Param-compatible fused FFN module.

``FusedFFN`` declares the exact parameter tree of
``MLP(input_dim, output_dim, hidden_dims=H, num_hidden_layers=2)``
(paths ``block_0_linear`` / ``block_1_linear`` / ``output_linear`` with
the same shapes and initializers — reference ``gt_pyg/nn/mlp.py:103-158``)
but executes the whole chain — including the caller-side output dropout
and residual add (``gt_pyg/nn/gt_conv.py:317-321``) — in the fused
Pallas kernel :func:`gt_pyg_tpu.ops.pallas.ffn.fused_ffn`.

Checkpoints are interchangeable between the fused and MLP paths; only
the dropout RNG stream differs (documented in docs/DESIGN.md §9).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .act import RELU_LIKE
from .init import kaiming_uniform, xavier_uniform


class _LinearParams(nn.Module):
    """Declares nn.Dense-compatible {kernel, bias} without computing.

    Param paths/shapes/initializers match ``nn.Dense(features,
    name=...)`` exactly, so checkpoints swap freely between this and a
    real Dense module."""

    in_features: int
    features: int
    kernel_init: object
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init,
                       (self.in_features, self.features), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.features,),
                        jnp.float32) if self.use_bias else None)
        return k, b


class FusedFFN(nn.Module):
    input_dim: int
    output_dim: int
    hidden_dim: int
    dropout: float = 0.0
    act: str = "gelu"

    @nn.compact
    def __call__(self, xn, xres, deterministic: bool = True,
                 affine=None):
        """``affine=(a, b)`` folds a pre-norm ``xn*a + b`` into W0/b0
        (``w0' = a[:,None]*w0``, ``b0' = b@w0 + b0``) and runs the
        kernel in same-input mode: ``xn`` must then be the RAW residual
        stream (``xres`` is ignored) — one HBM read instead of a
        normalize pass plus two reads."""
        from ..ops.pallas.ffn import fused_ffn

        act_lower = (self.act or "").lower()
        hidden_init = (kaiming_uniform(act_lower, None)
                       if act_lower in RELU_LIKE else xavier_uniform())
        w0, b0 = _LinearParams(self.input_dim, self.hidden_dim,
                               hidden_init, name="block_0_linear")()
        w1, b1 = _LinearParams(self.hidden_dim, self.hidden_dim,
                               hidden_init, name="block_1_linear")()
        w2, b2 = _LinearParams(self.hidden_dim, self.output_dim,
                               xavier_uniform(), name="output_linear")()
        rng = None
        if not deterministic and self.dropout > 0.0:
            rng = self.make_rng("dropout")
        if affine is not None:
            a, b = affine
            b0 = b0 + b @ w0
            w0 = w0 * a[:, None]
            xres = None
        return fused_ffn(xn, xres, w0, b0, w1, b1, w2, b2,
                         act=self.act, dropout_rate=self.dropout,
                         dropout_rng=rng)


def ffn_shapes_supported(rows: int) -> bool:
    """fused_ffn needs row counts divisible by a 16-row block."""
    return rows % 16 == 0
