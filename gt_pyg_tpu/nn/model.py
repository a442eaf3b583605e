"""GraphTransformerNet — embeddings, GTConv stack, pooled variational
Gaussian readout.

Behavioral spec: reference ``gt_pyg/nn/model.py:17-345``:

* node embedding Linear(no bias) → input norm → input dropout (:301-305);
* edge embedding Linear(no bias) shares ``hidden_dim`` (:313);
* ``num_gt_layers`` GTConv blocks threading (h, e) (:318-319);
* multi-aggregator global pooling over the graph index (:322-323);
* readout norm → latent → head dropout → μ / log σ² MLP heads;
* log_var clamped to [-10, 10]; training-and-not-``zero_var`` samples
  ``pred = μ + exp(0.5·log_var)·ε`` via the reparameterization trick
  (:334-341) with the ``reparam`` RNG stream.

The forward consumes a :class:`~gt_pyg_tpu.data.graph.GraphBatch` (padded
fixed shapes); outputs are sliced to the padded graph count ``Bp`` with
padding rows zero-masked via the trash-segment convention.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..data.graph import GraphBatch
from ..ops.segment import multi_aggregate
from .gt_conv import GTConv
from .dropout import Dropout
from .init import xavier_uniform
from .mlp import MLP
from .norm import make_norm
from .utils import (
    validate_aggregators,
    validate_dropout,
    validate_num_gt_layers,
)

CONFIG_KEYS = (
    "node_dim_in", "edge_dim_in", "hidden_dim", "norm", "gate", "qkv_bias",
    "num_gt_layers", "num_heads", "gt_aggregators", "aggregators", "act",
    "dropout", "num_tasks", "num_head_layers", "head_norm", "head_residual",
    "head_dropout",
)


class GraphTransformerNet(nn.Module):
    node_dim_in: int
    edge_dim_in: Optional[int] = None
    hidden_dim: int = 128
    norm: str = "ln"
    gate: bool = False
    qkv_bias: bool = False
    num_gt_layers: int = 4
    num_heads: int = 8
    gt_aggregators: Sequence[str] = ("sum",)
    aggregators: Sequence[str] = ("sum",)
    act: str = "gelu"
    dropout: float = 0.1
    num_tasks: int = 1
    num_head_layers: int = 1
    head_norm: bool = False
    head_residual: bool = False
    head_dropout: Optional[float] = None
    # TPU-specific knobs (not part of the reference config surface)
    attn_impl: str = "lax"
    ffn_impl: str = "auto"
    norm_fold: str = "auto"
    max_in_degree: int = 16
    max_nodes_per_graph: int = 128
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    def _validate(self):
        validate_dropout("dropout", self.dropout)
        validate_dropout("head_dropout", self.resolved_head_dropout)
        validate_num_gt_layers(self.num_gt_layers)
        validate_aggregators("gt_aggregators", list(self.gt_aggregators))
        validate_aggregators("aggregators", list(self.aggregators))
        if self.num_tasks <= 0:
            raise ValueError("num_tasks must be >= 1")

    @property
    def resolved_head_dropout(self) -> float:
        return self.head_dropout if self.head_dropout is not None else self.dropout

    def get_config(self) -> Dict[str, Any]:
        """Reference-shaped config dict (model.py:85-103,472-474)."""
        return {
            "node_dim_in": self.node_dim_in,
            "edge_dim_in": self.edge_dim_in,
            "hidden_dim": self.hidden_dim,
            "norm": self.norm,
            "gate": self.gate,
            "qkv_bias": self.qkv_bias,
            "num_gt_layers": self.num_gt_layers,
            "num_heads": self.num_heads,
            "gt_aggregators": list(self.gt_aggregators),
            "aggregators": list(self.aggregators),
            "act": self.act,
            "dropout": self.dropout,
            "num_tasks": self.num_tasks,
            "num_head_layers": self.num_head_layers,
            "head_norm": self.head_norm,
            "head_residual": self.head_residual,
            "head_dropout": self.head_dropout,
        }

    @classmethod
    def from_config(cls, config: Dict[str, Any], **overrides) -> "GraphTransformerNet":
        cfg = dict(config)
        cfg.update(overrides)
        for key in ("gt_aggregators", "aggregators"):
            if cfg.get(key) is not None:
                cfg[key] = tuple(cfg[key])
        return cls(**cfg)

    @nn.compact
    def __call__(
        self,
        batch: GraphBatch,
        zero_var: bool = False,
        return_latent: bool = False,
        deterministic: bool = True,
        frozen_norms: Sequence[str] = (),
    ):
        """``frozen_norms``: static top-level module names whose
        BatchNorms must normalize with RUNNING stats even in training —
        the reference flips frozen components' BatchNorms to eval mode
        (``model.py:374-385``), so a frozen backbone normalizes with its
        pretrained statistics during fine-tuning. Valid entries:
        ``input_norm``, ``gt_layer_{i}``, ``readout_norm`` (the Trainer
        derives them from ``frozen_bstats_mask``)."""
        self._validate()
        use_ra = deterministic
        frozen_norms = tuple(frozen_norms)
        dense = lambda feats, name, use_bias=True: nn.Dense(
            feats, use_bias=use_bias, kernel_init=xavier_uniform(),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name=name)

        x = batch.node_x.astype(self.dtype)
        node_mask = batch.node_mask
        edge_mask = batch.edge_mask

        h = dense(self.hidden_dim, "node_emb", use_bias=False)(x)
        h = make_norm(self.norm, self.hidden_dim, self.bn_axis_name,
                      self.dtype, name="input_norm")(
            h, node_mask, use_ra or "input_norm" in frozen_norms)
        h = Dropout(rate=self.dropout, name="input_dropout")(
            h, deterministic=deterministic)
        # keep padding rows identically zero through the stack
        h = h * node_mask[:, None]

        if self.edge_dim_in is not None:
            e = dense(self.hidden_dim, "edge_emb", use_bias=False)(
                batch.edge_attr.astype(self.dtype))
            e = e * edge_mask[:, None]
        else:
            e = None

        for li in range(self.num_gt_layers):
            h, e = GTConv(
                node_in_dim=self.hidden_dim,
                hidden_dim=self.hidden_dim,
                edge_in_dim=(self.hidden_dim if self.edge_dim_in is not None
                             else None),
                num_heads=self.num_heads,
                act=self.act,
                dropout=self.dropout,
                norm=self.norm,
                gate=self.gate,
                qkv_bias=self.qkv_bias,
                aggregators=tuple(self.gt_aggregators),
                attn_impl=self.attn_impl,
                ffn_impl=self.ffn_impl,
                norm_fold=self.norm_fold,
                max_in_degree=self.max_in_degree,
                bn_axis_name=self.bn_axis_name,
                dtype=self.dtype,
                name=f"gt_layer_{li}",
            )(h, batch.edge_src, batch.edge_dst, e,
              node_mask=node_mask, edge_mask=edge_mask,
              edge_perm_src=getattr(batch, "edge_perm_src", None),
              deterministic=deterministic,
              tile_edges=getattr(batch, "tile_edges", None),
              bn_frozen=f"gt_layer_{li}" in frozen_norms,
              tile_nodes=getattr(batch, "tile_nodes", None))
            h = h * node_mask[:, None]
            if e is not None:
                e = e * edge_mask[:, None]

        # global pooling: nodes are consecutive per graph; padding nodes
        # carry graph id Bp (trash slot). In the tile-packed layout FFD
        # reorders graphs across tiles, so node_graph is NOT monotonic —
        # sorted_ids must be False there (it gates multi_aggregate's
        # scatter-free rowptr counts, which require truly sorted ids).
        bp = batch.y.shape[0]
        # Under bf16 compute, round the pooled stream to the compute
        # dtype (the residual adds promote h to true f32), then keep it
        # stored f32 so the scatter path still accumulates in f32 —
        # this makes the values exactly bf16-representable, which is
        # the exactness contract of the MXU pooling-moments kernel
        # (ops/pallas/pool.py); rounding here is one more bf16 rounding
        # of an already-bf16 compute stream. The rounding is applied
        # ONLY when the kernel will actually engage for this call
        # (same gate multi_aggregate evaluates), so scatter-path eval
        # numerics of pre-existing bf16 checkpoints are untouched when
        # the kernel is off/unavailable.
        from ..ops.segment import USE_ELL, _use_pool_matmul

        sorted_ids = batch.tile_edges is None
        ell_engages = (USE_ELL and self.max_nodes_per_graph is not None
                       and sorted_ids)
        h_pool = h
        lowp = self.dtype == jnp.bfloat16
        if (lowp and h.dtype != jnp.bfloat16 and not ell_engages
                and _use_pool_matmul(h, bp + 1, True)):
            h_pool = h.astype(jnp.bfloat16).astype(h.dtype)
        else:
            lowp = h.dtype == jnp.bfloat16
        g = multi_aggregate(h_pool, batch.node_graph, bp + 1,
                            tuple(self.aggregators),
                            sorted_ids=sorted_ids,
                            max_per_segment=self.max_nodes_per_graph,
                            lowp_exact=lowp)[:bp]

        head_in_dim = len(self.aggregators) * self.hidden_dim
        latent = make_norm(self.norm, head_in_dim, self.bn_axis_name,
                           self.dtype, name="readout_norm")(
            g, batch.graph_mask,
            use_ra or "readout_norm" in frozen_norms)
        g = Dropout(rate=self.resolved_head_dropout,
                       name="readout_dropout")(latent,
                                               deterministic=deterministic)

        head_kwargs = dict(
            input_dim=head_in_dim, output_dim=self.num_tasks,
            hidden_dims=self.hidden_dim,
            num_hidden_layers=self.num_head_layers,
            dropout=self.resolved_head_dropout, act=self.act,
            norm=self.head_norm, residual=self.head_residual,
            dtype=self.dtype,
        )
        mu = MLP(**head_kwargs, name="mu_mlp")(g, deterministic=deterministic)
        log_var = MLP(**head_kwargs, name="log_var_mlp")(
            g, deterministic=deterministic)

        log_var = jnp.clip(log_var, -10.0, 10.0)
        std = jnp.exp(0.5 * log_var)

        if not deterministic and not zero_var:
            import jax

            eps = jax.random.normal(self.make_rng("reparam"), std.shape,
                                    dtype=std.dtype)
            pred = mu + std * eps
        else:
            pred = mu

        if return_latent:
            return pred, log_var, latent
        return pred, log_var


def num_parameters(params) -> int:
    """Trainable parameter count of a params pytree."""
    import jax

    return sum(p.size for p in jax.tree_util.tree_leaves(params))
