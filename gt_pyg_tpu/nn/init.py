"""Parameter initializers matching the reference's torch init scheme
(``gt_pyg/nn/mlp.py:103-158``, ``gt_conv.py:179-264``).

Note: flax Dense kernels are [in, out] (transpose of torch's [out, in]);
Xavier is symmetric in fan-in/fan-out so ``glorot_uniform`` matches.
Kaiming-uniform with fan_in maps to ``variance_scaling`` on the kernel's
fan_in axis, with torch's ReLU/leaky-ReLU gain.
"""

from __future__ import annotations

import math

from flax import linen as nn


def xavier_uniform():
    return nn.initializers.glorot_uniform()


def kaiming_uniform(act: str = "relu", act_kwargs=None):
    """torch.nn.init.kaiming_uniform_(fan_in) equivalent."""
    if act in ("leaky_relu", "leakyrelu"):
        neg = float((act_kwargs or {}).get("negative_slope", 0.01))
        gain = math.sqrt(2.0 / (1.0 + neg ** 2))
    else:
        gain = math.sqrt(2.0)
    # torch: bound = gain * sqrt(3 / fan_in); variance_scaling uniform:
    # bound = sqrt(3 * scale / fan_in) -> scale = gain^2
    return nn.initializers.variance_scaling(gain * gain, "fan_in", "uniform")
