"""Import torch checkpoints (reference / golem backbones) into JAX pytrees.

BASELINE config 5 requires ingesting the golem-style pretrained ``.pt``
backbone. The reference's state-dict key space (``gt_pyg/nn/model.py``,
``gt_conv.py``, ``mlp.py``) maps onto this framework's flax trees as:

* ``gt_layers.{i}.X``            → ``gt_layer_{i}/X``
* Linear ``weight`` [out, in]    → ``kernel`` [in, out] (transposed)
* norm ``weight``/``bias``       → ``scale``/``bias`` (params)
* norm ``running_mean``/``var``  → batch_stats ``mean``/``var``
* MLP ``blocks.{j}.0``           → ``block_{j}_linear``
* MLP ``blocks.{j}.1`` (LayerNorm when norm=True) → ``block_{j}_norm``
* MLP ``output_layer``           → ``output_linear``
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NORM_NAMES = {"input_norm", "readout_norm", "norm0e", "norm1e",
               "norm1", "norm2"}


def _set(tree: Dict, path, value) -> None:
    cur = tree
    for k in path[:-1]:
        cur = cur.setdefault(k, {})
    cur[path[-1]] = value


def _map_key(key: str) -> Optional[Tuple[str, Tuple[str, ...], bool]]:
    """torch state-dict key → (collection, flax path, transpose)."""
    parts = key.split(".")
    # gt_layers.{i}.rest -> gt_layer_{i}.rest
    if parts[0] == "gt_layers":
        parts = [f"gt_layer_{parts[1]}"] + parts[2:]

    # MLP internals: <mlp>.blocks.{j}.{k}.<leaf> / <mlp>.output_layer.<leaf>
    out: list[str] = []
    i = 0
    is_norm_leafhost = False
    while i < len(parts):
        p = parts[i]
        if p == "blocks" and i + 2 < len(parts):
            j, k = parts[i + 1], parts[i + 2]
            if k == "0":
                out.append(f"block_{j}_linear")
            elif k == "1":
                out.append(f"block_{j}_norm")
                is_norm_leafhost = True
            else:  # activation / dropout: no params
                return None
            i += 3
            continue
        if p == "output_layer":
            out.append("output_linear")
            i += 1
            continue
        out.append(p)
        i += 1

    leaf = out[-1]
    module = out[-2] if len(out) >= 2 else out[-1]
    is_norm = (module in _NORM_NAMES or is_norm_leafhost
               or module.endswith("_norm"))

    if leaf == "num_batches_tracked":
        return None
    if is_norm:
        if leaf == "weight":
            return "params", tuple(out[:-1] + ["scale"]), False
        if leaf == "bias":
            return "params", tuple(out[:-1] + ["bias"]), False
        if leaf == "running_mean":
            return "batch_stats", tuple(out[:-1] + ["mean"]), False
        if leaf == "running_var":
            return "batch_stats", tuple(out[:-1] + ["var"]), False
        return None
    if leaf == "weight":
        return "params", tuple(out[:-1] + ["kernel"]), True
    if leaf == "bias":
        return "params", tuple(out[:-1] + ["bias"]), False
    logger.warning("unmapped torch key: %s", key)
    return None


def convert_torch_state_dict(
    state_dict: Dict[str, Any],
) -> Dict[str, Dict[str, Any]]:
    """torch ``model_state_dict`` → {"params": ..., "batch_stats": ...}."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    for key, tensor in state_dict.items():
        mapped = _map_key(key)
        if mapped is None:
            continue
        coll, path, transpose = mapped
        arr = np.asarray(tensor.detach().cpu().numpy()
                         if hasattr(tensor, "detach") else tensor,
                         dtype=np.float32)
        if transpose and arr.ndim == 2:
            arr = arr.T
        _set(params if coll == "params" else batch_stats, path, arr)
    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(
    path,
    filter_heads: bool = False,
) -> Dict[str, Any]:
    """Load a reference-format torch ``.pt`` checkpoint.

    Returns a dict with ``model_state_dict`` converted to flax trees plus
    the original metadata (config, versions). With ``filter_heads=True``
    the μ/log-σ² heads are dropped (fine-tune head reinit,
    train_logd_finetune.ipynb cell 6).

    .. warning:: Only load ``.pt`` files you trust. The safe
       ``weights_only=True`` loader is tried first, but reference-format
       checkpoints carry non-tensor metadata that forces a fallback to
       full unpickling, which can execute arbitrary code from the file.
    """
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        logger.warning(
            "weights_only load of %s failed (non-tensor metadata in the "
            "checkpoint); falling back to full unpickling — only load "
            "files you trust", path)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state_dict", ckpt)
    converted = convert_torch_state_dict(state)
    if filter_heads:
        for coll in converted:
            converted[coll] = {
                k: v for k, v in converted[coll].items()
                if k not in ("mu_mlp", "log_var_mlp")
            }
    out = {k: v for k, v in ckpt.items() if k != "model_state_dict"}
    out["model_state_dict"] = converted
    return out


def merge_pretrained(init_state: Dict[str, Any],
                     pretrained: Dict[str, Any],
                     strict: bool = False) -> Dict[str, Any]:
    """Overlay pretrained subtrees onto a freshly-initialized state
    (missing keys keep their init values — torch ``strict=False``)."""

    def overlay(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                if strict:
                    raise KeyError(f"unexpected key {path}{k}")
                logger.warning("skipping unexpected pretrained key %s%s",
                               path, k)
                continue
            if isinstance(v, dict) and isinstance(dst[k], dict):
                out[k] = overlay(dst[k], v, f"{path}{k}.")
            else:
                tgt = np.asarray(dst[k])
                arr = np.asarray(v)
                if tgt.shape != arr.shape:
                    raise ValueError(
                        f"shape mismatch at {path}{k}: "
                        f"{tgt.shape} vs {arr.shape}")
                out[k] = arr.astype(tgt.dtype)
        return out

    return {
        coll: overlay(init_state.get(coll, {}), pretrained.get(coll, {}))
        for coll in set(init_state) | set(pretrained)
    }
