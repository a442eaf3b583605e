"""Versioned checkpointing over JAX pytrees.

Schema-equivalent to the reference's torch checkpoints
(``gt_pyg/nn/checkpoint.py:16-166``): version field, framework-version
provenance, created_at (UTC ISO), model config, optional optimizer state /
epoch / global_step / best_metric / extra (with frozen_status), plus
warn/error/ignore version policies and metadata-only reads.

File format (``.ckpt``): ``b"GTPT" | u32 header_len | JSON header |
msgpack body``. The header carries all metadata; the body carries the
array pytrees (flax msgpack). ``get_checkpoint_info`` reads only the
header — the moral equivalent of the reference's mmap'd metadata read.
"""

from __future__ import annotations

import json
import logging
import struct
from datetime import datetime, timezone
from pathlib import Path
from typing import Any, Dict, Optional, Union

import numpy as np

from .._version import __version__

logger = logging.getLogger(__name__)

CHECKPOINT_VERSION = 1
_MAGIC = b"GTPT"


def _to_numpy_tree(tree):
    import jax

    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(
    path: Union[str, Path],
    model_state: Dict[str, Any],            # {"params":..., "batch_stats":...}
    config: Optional[Dict[str, Any]] = None,
    optimizer_state: Optional[Any] = None,
    epoch: Optional[int] = None,
    global_step: Optional[int] = None,
    best_metric: Optional[float] = None,
    extra: Optional[Dict[str, Any]] = None,
    require_version: bool = True,
) -> Path:
    """Write a checkpoint. Refuses to save without version provenance
    unless ``require_version=False`` (reference checkpoint.py:45-52)."""
    from flax import serialization

    if not __version__ or __version__ == "0+unknown":
        msg = ("gt_pyg_tpu version is unknown; refusing to save checkpoint "
               "without source provenance.")
        if require_version:
            raise RuntimeError(msg)
        logger.warning(msg)

    path = Path(path)
    if path.suffix != ".ckpt":
        path = path.with_suffix(".ckpt")
    path.parent.mkdir(parents=True, exist_ok=True)

    header: Dict[str, Any] = {
        "checkpoint_version": CHECKPOINT_VERSION,
        "gt_pyg_tpu_version": __version__,
        "created_at": datetime.now(timezone.utc).isoformat(),
    }
    if config is not None:
        header["model_config"] = config
    if epoch is not None:
        header["epoch"] = int(epoch)
    if global_step is not None:
        header["global_step"] = int(global_step)
    if best_metric is not None:
        header["best_metric"] = float(best_metric)
    if extra is not None:
        header["extra"] = extra

    body: Dict[str, Any] = {"model_state_dict": _to_numpy_tree(model_state)}
    if optimizer_state is not None:
        # optax states are (named)tuples — convert to a pure dict tree so
        # msgpack can serialize them; restore with
        # flax.serialization.from_state_dict(tx.init(params), loaded)
        body["optimizer_state_dict"] = _to_numpy_tree(
            serialization.to_state_dict(optimizer_state))
    header["body_keys"] = sorted(body.keys())

    payload = serialization.msgpack_serialize(body)
    hdr = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(hdr)))
        f.write(hdr)
        f.write(payload)
    return path


def _read_header(path: Path) -> Dict[str, Any]:
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"{path} is not a gt_pyg_tpu checkpoint "
                             f"(bad magic {magic!r})")
        (hlen,) = struct.unpack("<I", f.read(4))
        return json.loads(f.read(hlen))


def _version_check(header: Dict[str, Any], path, policy: str) -> None:
    if policy not in ("warn", "error", "ignore"):
        raise ValueError(
            f"version_check must be 'warn', 'error', or 'ignore', "
            f"got {policy!r}")
    if policy == "ignore":
        return
    saved = header.get("gt_pyg_tpu_version")
    if saved is None:
        msg = (f"Checkpoint '{path}' has no gt_pyg_tpu_version field; it may "
               f"have been created with an older version of gt_pyg_tpu.")
    elif saved != __version__:
        msg = (f"Checkpoint '{path}' was saved with gt_pyg_tpu {saved}, but "
               f"the current version is {__version__}. Model architecture "
               f"may have changed between versions — weights may be "
               f"incompatible.")
    else:
        return
    if policy == "error":
        raise RuntimeError(msg)
    logger.warning(msg)


def load_checkpoint(
    path: Union[str, Path],
    version_check: str = "warn",
) -> Dict[str, Any]:
    """Load a checkpoint dict: header metadata + ``model_state_dict`` (+
    ``optimizer_state_dict`` when present)."""
    from flax import serialization

    path = Path(path)
    header = _read_header(path)
    _version_check(header, path, version_check)

    with open(path, "rb") as f:
        f.seek(4)
        (hlen,) = struct.unpack("<I", f.read(4))
        f.seek(8 + hlen)
        body = serialization.msgpack_restore(f.read())

    out = dict(header)
    out.pop("body_keys", None)
    out.update(body)
    return out


def get_checkpoint_info(path: Union[str, Path]) -> Dict[str, Any]:
    """Metadata without array payloads (header-only read)."""
    header = _read_header(Path(path))
    info = {k: header[k] for k in
            ["checkpoint_version", "gt_pyg_tpu_version", "created_at",
             "model_config", "epoch", "global_step", "best_metric", "extra"]
            if k in header}
    extra = header.get("extra")
    if isinstance(extra, dict) and "frozen_status" in extra:
        info["frozen_status"] = extra["frozen_status"]
    return info


# ---- model-level conveniences (reference model.py:481-590) ----

def save_model_checkpoint(model, state: Dict[str, Any],
                          path: Union[str, Path],
                          optimizer_state=None, epoch=None,
                          global_step=None, best_metric=None,
                          extra: Optional[Dict[str, Any]] = None,
                          frozen_status: Optional[Dict[str, Any]] = None,
                          require_version: bool = True) -> Path:
    merged_extra = {"frozen_status": frozen_status or {}}
    if extra:
        merged_extra.update(extra)
    return save_checkpoint(
        path,
        model_state={"params": state["params"],
                     "batch_stats": state.get("batch_stats", {})},
        config=model.get_config(),
        optimizer_state=optimizer_state,
        epoch=epoch, global_step=global_step, best_metric=best_metric,
        extra=merged_extra, require_version=require_version)


def load_model_checkpoint(path: Union[str, Path], version_check="warn",
                          **model_overrides):
    """Rebuild (model, state, checkpoint) from a checkpoint's stored
    config (reference ``GraphTransformerNet.load_checkpoint``)."""
    from ..nn import GraphTransformerNet

    ckpt = load_checkpoint(path, version_check=version_check)
    model = GraphTransformerNet.from_config(ckpt["model_config"],
                                            **model_overrides)
    return model, ckpt["model_state_dict"], ckpt


def load_weights(path: Union[str, Path], current_config=None,
                 version_check="warn", filter_heads: bool = False):
    """Load a state dict for an existing model; with ``filter_heads=True``
    drops ``mu_mlp``/``log_var_mlp`` entries (the fine-tune head-reinit
    path, train_logd_finetune.ipynb cell 6)."""
    ckpt = load_checkpoint(path, version_check=version_check)
    if current_config is not None and "model_config" in ckpt:
        if ckpt["model_config"] != current_config:
            logger.warning(
                "Architecture mismatch between checkpoint and model. "
                "Saved: %s, Current: %s", ckpt["model_config"],
                current_config)
    state = ckpt["model_state_dict"]
    if filter_heads:
        state = {
            coll: {k: v for k, v in tree.items()
                   if k not in ("mu_mlp", "log_var_mlp")}
            for coll, tree in state.items()
        }
    return state, ckpt
