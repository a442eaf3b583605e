"""Activation resolver (reference uses PyG's ``activation_resolver``,
``mlp.py:4,84``). torch's GELU default is the exact erf form, so ``gelu``
maps to ``approximate=False`` for activation parity."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_ACTS = {
    "relu": jax.nn.relu,
    "gelu": functools.partial(jax.nn.gelu, approximate=False),
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "celu": jax.nn.celu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    "leaky_relu": jax.nn.leaky_relu,
    "leakyrelu": jax.nn.leaky_relu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "identity": lambda x: x,
}

RELU_LIKE = {"relu", "leaky_relu", "leakyrelu", "prelu", "rrelu"}


def resolve_activation(act, act_kwargs=None):
    """Name → callable; None/''/'none'/'identity' → identity."""
    if act is None or str(act).lower() in {"", "none", "identity"}:
        return _ACTS["identity"]
    key = str(act).lower()
    if key not in _ACTS:
        raise ValueError(f"unknown activation: {act!r}")
    fn = _ACTS[key]
    if act_kwargs:
        if key in ("leaky_relu", "leakyrelu") and "negative_slope" in act_kwargs:
            return functools.partial(jax.nn.leaky_relu,
                                     negative_slope=act_kwargs["negative_slope"])
        return functools.partial(fn, **act_kwargs)
    return fn
