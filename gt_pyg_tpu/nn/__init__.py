"""Neural modules (flax.linen): MLP, GTConv, GraphTransformerNet.

Public surface mirrors the reference's ``gt_pyg/nn/__init__.py:1-13``.
"""

from .mlp import MLP  # noqa: F401
from .gt_conv import GTConv  # noqa: F401
from .model import GraphTransformerNet, num_parameters, CONFIG_KEYS  # noqa: F401
from .norm import MaskedBatchNorm, LayerNorm, make_norm  # noqa: F401
from .utils import (  # noqa: F401
    VALID_AGGREGATORS,
    validate_aggregators,
    validate_dropout,
    validate_num_gt_layers,
)
