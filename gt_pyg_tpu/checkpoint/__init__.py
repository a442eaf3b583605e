"""Versioned checkpoint subsystem (+ torch .pt backbone import)."""

from .checkpoint import (  # noqa: F401
    CHECKPOINT_VERSION,
    save_checkpoint,
    load_checkpoint,
    get_checkpoint_info,
    save_model_checkpoint,
    load_model_checkpoint,
    load_weights,
)
from .torch_import import (  # noqa: F401
    convert_torch_state_dict,
    load_torch_checkpoint,
    merge_pretrained,
)
