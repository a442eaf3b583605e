"""Numerics guards (SURVEY.md §5: XLA's deterministic dataflow needs no
race detection; NaN/Inf guards mirror the reference's NaN-loss skip)."""

from __future__ import annotations

import logging
from typing import List

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


def check_finite_tree(tree, name: str = "tree") -> List[str]:
    """Return paths of non-finite leaves (host-side; forces transfer)."""
    bad: List[str] = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = jnp.asarray(leaf)
        if arr.dtype.kind == "f" and not bool(jnp.all(jnp.isfinite(arr))):
            bad.append(f"{name}{jax.tree_util.keystr(path)}")
    if bad:
        logger.warning("non-finite values in %s: %s", name, bad[:5])
    return bad


def enable_nan_debugging() -> None:
    """Turn on jax NaN debugging (tests/debug only; disables some
    optimizations)."""
    jax.config.update("jax_debug_nans", True)
