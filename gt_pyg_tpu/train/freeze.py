"""Freeze/unfreeze machinery for transfer learning.

The reference mutates ``requires_grad`` per component and flips frozen
BatchNorms to eval mode (``gt_pyg/nn/model.py:348-450``). In the
functional JAX world the equivalent is a boolean *mask pytree* over the
params (True == frozen): the trainer zeroes masked gradients, and
``frozen_status`` reports per-component state for checkpoints.

Component vocabulary (model.py:355-362): "embeddings", "encoder",
"gt_layers", "gt_layer_{i}", "heads", "pooling", "all".
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import jax

COMPONENT_PREFIXES: Dict[str, List[str]] = {
    "embeddings": ["node_emb", "edge_emb"],
    "encoder": ["input_norm", "gt_layer_"],
    "gt_layers": ["gt_layer_"],
    "heads": ["readout_norm", "mu_mlp", "log_var_mlp"],
    "pooling": [],  # MultiAggregation has no params (reference parity)
}


def _prefixes_for(component: str, num_layers: int) -> List[str]:
    if component == "all":
        out: List[str] = []
        for v in COMPONENT_PREFIXES.values():
            out.extend(v)
        return out
    if component.startswith("gt_layer_"):
        idx = int(component.split("_")[-1])
        if idx < 0 or idx >= num_layers:
            raise ValueError(
                f"Invalid layer index: {idx}. Model has {num_layers} layers.")
        return [f"gt_layer_{idx}"]
    if component not in COMPONENT_PREFIXES:
        valid = sorted(list(COMPONENT_PREFIXES.keys())
                       + ["all", "gt_layer_{i}"])
        raise ValueError(f"Unknown component: '{component}'. Valid: {valid}")
    return COMPONENT_PREFIXES[component]


def _matches(path_head: str, prefixes: Sequence[str]) -> bool:
    for p in prefixes:
        if p.endswith("_"):
            if path_head.startswith(p):
                return True
        elif path_head == p:
            return True
    return False


def freeze_mask(
    params,
    components: Optional[Union[str, List[str]]] = None,
    exclude: Optional[Union[str, List[str]]] = None,
    num_layers: Optional[int] = None,
):
    """Boolean mask pytree (True == frozen) over ``params``.

    Mirrors ``GraphTransformerNet.freeze(components, exclude)``
    semantics.
    """
    if components is None:
        components = ["all"]
    elif isinstance(components, str):
        components = [components]
    if exclude is None:
        exclude = []
    elif isinstance(exclude, str):
        exclude = [exclude]

    if num_layers is None:
        num_layers = sum(1 for k in params if str(k).startswith("gt_layer_"))

    freeze_pref: List[str] = []
    for comp in components:
        freeze_pref.extend(_prefixes_for(comp, num_layers))
    excl_pref: List[str] = []
    for comp in exclude:
        excl_pref.extend(_prefixes_for(comp, num_layers))

    def mark(top_key: str) -> bool:
        return (_matches(top_key, freeze_pref)
                and not _matches(top_key, excl_pref))

    return {
        k: jax.tree_util.tree_map(lambda _: mark(str(k)), v)
        for k, v in params.items()
    }


def frozen_status(mask) -> Dict[str, Optional[bool]]:
    """Per-component frozen summary (True = fully frozen, False = any
    trainable, None = no params) — reference ``get_frozen_status``
    (model.py:452-469)."""
    num_layers = sum(1 for k in mask if str(k).startswith("gt_layer_"))
    status: Dict[str, Optional[bool]] = {}
    for name in ["embeddings", "encoder", "gt_layers", "heads", "pooling"]:
        prefixes = _prefixes_for(name, num_layers)
        leaves: List[bool] = []
        for k, v in mask.items():
            if _matches(str(k), prefixes):
                leaves.extend(bool(x) for x in jax.tree_util.tree_leaves(v))
        status[name] = None if not leaves else all(leaves)
    return status


def combine_masks(a, b):
    """Union of two freeze masks."""
    return jax.tree_util.tree_map(lambda x, y: bool(x) or bool(y), a, b)
