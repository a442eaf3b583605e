"""Generic MLP module.

Behavioral spec from the reference (``gt_pyg/nn/mlp.py:8-175``): per-block
Linear(+LayerNorm)(+act)(+Dropout), residual around blocks whose in/out
dims match, bare output Linear; Kaiming-uniform init for ReLU-like
activations, Xavier-uniform otherwise, zero biases.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from .act import resolve_activation, RELU_LIKE
from .dropout import Dropout
from .init import xavier_uniform, kaiming_uniform


class MLP(nn.Module):
    input_dim: int
    output_dim: int
    hidden_dims: Union[int, Sequence[int]]
    num_hidden_layers: int = 1
    dropout: float = 0.0
    act: Optional[str] = "gelu"
    act_kwargs: Optional[Dict[str, Any]] = None
    norm: bool = False
    residual: bool = False
    dtype: jnp.dtype = jnp.float32

    def _dims(self) -> List[int]:
        if self.num_hidden_layers < 0:
            raise ValueError(
                f"num_hidden_layers must be >= 0, got {self.num_hidden_layers}")
        hd = self.hidden_dims
        if isinstance(hd, int):
            hd = [hd] * max(self.num_hidden_layers, 0)
        else:
            hd = list(hd)
        if self.num_hidden_layers > 0 and len(hd) != self.num_hidden_layers:
            raise ValueError(
                f"hidden_dims length ({len(hd)}) must equal "
                f"num_hidden_layers ({self.num_hidden_layers})")
        return hd

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        hidden = self._dims()
        act_lower = (self.act or "").lower()
        hidden_init = (kaiming_uniform(act_lower, self.act_kwargs)
                       if act_lower in RELU_LIKE else xavier_uniform())
        act_fn = resolve_activation(self.act, self.act_kwargs)

        dims = [self.input_dim] + hidden
        for i, (i_dim, o_dim) in enumerate(zip(dims[:-1], dims[1:])):
            h = nn.Dense(o_dim, kernel_init=hidden_init,
                         bias_init=nn.initializers.zeros,
                         dtype=self.dtype, name=f"block_{i}_linear")(x)
            if self.norm:
                h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"block_{i}_norm")(h)
            h = act_fn(h)
            if self.dropout > 0.0:
                h = Dropout(rate=self.dropout, name=f"block_{i}_dropout")(
                    h, deterministic=deterministic)
            x = x + h if (self.residual and i_dim == o_dim) else h

        return nn.Dense(self.output_dim, kernel_init=xavier_uniform(),
                        bias_init=nn.initializers.zeros, dtype=self.dtype,
                        name="output_linear")(x)
