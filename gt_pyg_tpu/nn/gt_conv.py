"""GTConv — multi-head edge-featured graph-attention block.

Behavioral spec: reference ``gt_pyg/nn/gt_conv.py:17-393`` (see SURVEY.md
§3.2 for the math invariants this module must reproduce):

* pre-norm residual attention + FFN blocks on nodes;
* edge features contribute an additive per-head logit bias (from the RAW
  per-layer edge state, gt_conv.py:367) and a value term (from the
  norm0e-normalized state, :300-301) — the raw/normed asymmetry matters;
* edge value is added to V_src BEFORE the sigmoid value gate (:369-376);
* optional per-head logit gate from the raw edge state (:384-387);
* softmax over incoming edges of each destination node, attention dropout
  on alpha (:390-391);
* edge state update from the pre-softmax QK product ⊙ E_val, its own
  output projection, residual and FFN — no softmax on this path
  (:323-341).

The hot message-passing core is :func:`gt_pyg_tpu.ops.attention.
gt_attention` (lax or fused Pallas).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import gt_attention, wo_row_perm
from .dropout import Dropout
from .ffn import FusedFFN, _LinearParams
from .init import xavier_uniform
from .mlp import MLP
from .norm import _BN_NAMES, make_norm
from .utils import validate_aggregators, validate_dropout


class GTConv(nn.Module):
    node_in_dim: int
    hidden_dim: int
    edge_in_dim: Optional[int] = None
    num_heads: int = 8
    gate: bool = False
    qkv_bias: bool = False
    dropout: float = 0.1
    norm: str = "ln"
    act: str = "gelu"
    aggregators: Sequence[str] = ("sum",)
    attn_impl: str = "lax"
    ffn_impl: str = "auto"      # "auto" | "fused" | "xla"
    norm_fold: str = "auto"     # "auto" | "on" | "off"
    max_in_degree: int = 16
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    def _use_fused_ffn(self, rows: int) -> bool:
        """Fused Pallas FFN: bf16 compute only (the f32 path is the
        bit-faithful golden-parity reference) and kernel-tileable rows."""
        from .ffn import ffn_shapes_supported

        if self.ffn_impl == "xla":
            return False
        if self.ffn_impl == "fused":
            return ffn_shapes_supported(rows)
        return self.dtype == jnp.bfloat16 and ffn_shapes_supported(rows)

    def _fold_norms(self) -> bool:
        """Fold BatchNorm affines into the following projections
        (``(x*a+b) @ W == x @ (a·W) + b@W`` — exact up to rounding),
        removing every per-layer elementwise normalize pass over HBM.
        BatchNorm only (LayerNorm's scale is per-row); 'auto' folds
        under bf16 compute, keeping the f32 path bit-faithful to the
        golden-parity reference."""
        if self.norm_fold == "off":
            return False
        if self.norm.lower() not in _BN_NAMES:
            return False
        if self.norm_fold == "on":
            return True
        return self.dtype == jnp.bfloat16

    def _merged_proj(self, x, in_features, specs, merged=False,
                     out_dtype=None):
        """Several Dense-equivalent projections of one input as a single
        matmul (XLA keeps separate [128,128] matmuls as separate HBM
        round-trips over x; merged they read x once and hit the MXU with
        a wider RHS). ``specs``: (name, features, use_bias, affine);
        a non-None affine ``(a, b)`` folds a pre-norm into that kernel.
        Param paths/shapes/inits are identical to the per-name
        ``nn.Dense`` modules they replace.

        With ``merged=True`` the concatenated output is returned
        UNSLICED — the tile kernel consumes it whole and slices
        per-tensor views in VMEM, so no slice fusions over HBM ever
        materialize."""
        w, bias = self._merged_params(in_features, specs)
        # f32 accumulate + f32 bias add, ONE cast at the end: under
        # folding, x@(a·W) and the folded bias b@W are both large and
        # cancel to an O(1) output — rounding the dot to bf16 before the
        # add leaves ~|b@W|/256 of absolute error on the result, which
        # destabilizes bf16 training. The MXU reads bf16 operands and
        # accumulates f32 either way; XLA fuses the add+cast.
        y = (jax.lax.dot(x.astype(self.dtype), w.astype(self.dtype),
                         preferred_element_type=jnp.float32)
             + bias).astype(out_dtype or self.dtype)
        if merged:
            return y
        outs, off = [], 0
        for _, feats, _, _ in specs:
            outs.append(y[:, off:off + feats])
            off += feats
        return outs

    def _merged_params(self, in_features, specs):
        """The merged (kernel, bias) of several Dense-equivalent
        projections (param paths identical to per-name nn.Dense), with
        optional pre-norm affines folded in. Used by :meth:`_merged_proj`
        and, on the v5 projection-fused path, passed straight into the
        tile kernel."""
        kernels, biases = [], []
        for name, feats, use_bias, affine in specs:
            kk, bb = _LinearParams(in_features, feats, xavier_uniform(),
                                   use_bias=use_bias, name=name)()
            bias = bb if bb is not None else jnp.zeros((feats,),
                                                       jnp.float32)
            if affine is not None:
                a, b = affine
                bias = bias + b @ kk
                kk = kk * a[:, None]
            kernels.append(kk)
            biases.append(bias)
        w = (jnp.concatenate(kernels, axis=1) if len(kernels) > 1
             else kernels[0])
        bias = (jnp.concatenate(biases) if len(biases) > 1 else biases[0])
        return w, bias

    def _validate(self):
        validate_dropout("dropout", self.dropout)
        validate_aggregators("aggregators", list(self.aggregators))
        if self.num_heads <= 0:
            raise ValueError(f"num_heads must be positive, got {self.num_heads}")
        if self.hidden_dim % self.num_heads != 0:
            raise ValueError(
                f"hidden_dim ({self.hidden_dim}) must be divisible by "
                f"num_heads ({self.num_heads})")
        if self.edge_in_dim is not None and self.edge_in_dim <= 0:
            raise ValueError(
                f"edge_in_dim must be positive or None, got {self.edge_in_dim}")

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                    # [Np, node_in_dim]
        edge_src: jnp.ndarray,             # [Ep]
        edge_dst: jnp.ndarray,             # [Ep] sorted
        edge_attr: Optional[jnp.ndarray] = None,  # [Ep, edge_in_dim]
        node_mask: Optional[jnp.ndarray] = None,
        edge_mask: Optional[jnp.ndarray] = None,
        edge_perm_src: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        tile_edges: Optional[int] = None,
        bn_frozen: bool = False,
        tile_nodes: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """``bn_frozen``: normalize with RUNNING stats even in training —
        the reference flips a frozen layer's BatchNorms to eval mode
        (``model.py:374-385``)."""
        self._validate()
        if self.edge_in_dim is not None and edge_attr is None:
            raise ValueError(
                "edge_in_dim was set, but 'edge_attr' is None in __call__(). "
                "Pass edge features or set edge_in_dim=None.")

        H, Dh = self.num_heads, self.hidden_dim // self.num_heads
        dense = lambda feats, name, use_bias=True: nn.Dense(
            feats, use_bias=use_bias, kernel_init=xavier_uniform(),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name=name)
        use_ra = deterministic or bn_frozen
        fold = self._fold_norms()

        x_res = x
        # all projections stay 2-D [rows, hidden] — per-head structure is
        # handled inside gt_attention via indicator matmuls (a [*, H, Dh]
        # layout with Dh=16 would pad to 128 lanes and 8x the HBM traffic).
        # Q/K/V(+gate) run as ONE merged matmul; under norm folding the
        # norm1 affine rides the merged kernel and the normalize pass
        # never materializes.
        norm1 = self.norm_fn("norm1", self.node_in_dim)
        if fold:
            affine1 = norm1(x_res, node_mask, use_ra, return_affine=True)
            qkv_in = x_res
        else:
            affine1 = None
            qkv_in = norm1(x_res, node_mask, use_ra)
        qkv_specs = [("WQ", self.hidden_dim, self.qkv_bias, affine1),
                     ("WK", self.hidden_dim, self.qkv_bias, affine1),
                     ("WV", self.hidden_dim, self.qkv_bias, affine1)]
        if self.gate:
            qkv_specs.append(("n_gate", self.hidden_dim, True, affine1))

        aggs = tuple(self.aggregators)
        # The production fast path: the tile kernel consumes the merged
        # projection outputs whole (qkvg [Np, (3+gate)·hidden], e_all
        # [Ep, hidden+(1+gate)·H]) — no HBM slice fusions — and its VJP
        # hands the merged-projection backward a single cotangent.
        use_tile = (self.attn_impl in ("tile", "auto")
                    and tile_edges is not None
                    and all(a in ("sum", "add", "mean") for a in aggs))

        attn_rng = None
        if not deterministic and self.dropout > 0.0:
            attn_rng = self.make_rng("dropout")

        norm0e = (self.norm_fn("norm0e", self.edge_in_dim)
                  if self.edge_in_dim is not None else None)
        e_specs_fold = None
        if self.edge_in_dim is not None and fold:
            # bias/gate read the RAW per-layer edge state
            # (gt_conv.py:367,386); E_val the norm0e'd state (:300-301).
            # Under folding all three share one matmul on the raw state
            # (the affine folds into WE_value's kernel only).
            affine0e = norm0e(edge_attr, edge_mask, use_ra,
                              return_affine=True)
            e_specs_fold = [("WE_value", self.hidden_dim, True, affine0e),
                            ("WE_logits", H, True, None)]
            if self.gate:
                e_specs_fold.append(("e_gate", H, True, None))

        # v5 projection-fused path: the folded Q/K/V/gate + edge
        # projections, the attention core, and WO/WOe all run inside ONE
        # kernel per direction over the residual streams — the XLA
        # projection matmul tier and the qkvg/e_all/out/eij HBM round
        # trips disappear (see the v5 banner in ops/pallas/gt_tile.py).
        # Round-4 hardware verdict (tools/sweep_r4.py on 1xv5e): the
        # fused kernel measured ~59 ms/step vs v4's 43 ms on the
        # flagship bench — the step is MXU-ISSUE-bound, and folding the
        # projection/WO matmuls into the already issue-bound attention
        # kernel serializes work XLA overlapped across its own tier —
        # so 'auto' resolves to the v4 split path; 'on' opts in.
        import os as _os

        proj_mode = _os.environ.get("GT_TPU_PROJ", "auto").lower()
        use_proj = (use_tile and fold and self.edge_in_dim is not None
                    and proj_mode == "on")

        eij = None
        e_attn_pre = None
        if use_proj:
            from ..ops.pallas.gt_tile import gt_attention_tile_proj

            w_qkvg, b_qkvg = self._merged_params(self.node_in_dim,
                                                 qkv_specs)
            w_eall, b_eall = self._merged_params(self.edge_in_dim,
                                                 e_specs_fold)
            wo_k, wo_b = _LinearParams(self.hidden_dim * len(aggs),
                                       self.node_in_dim, xavier_uniform(),
                                       name="WO")()
            if len(aggs) > 1:
                wo_k = wo_k[wo_row_perm(H, Dh, len(aggs))]
            woe_k, woe_b = _LinearParams(self.hidden_dim,
                                         self.edge_in_dim,
                                         xavier_uniform(), name="WOe")()
            attn_out, e_attn_pre = gt_attention_tile_proj(
                x_res, edge_attr, w_qkvg, b_qkvg, w_eall, b_eall,
                wo_k, wo_b, woe_k, woe_b, edge_src, edge_dst,
                H, self.hidden_dim, tile_edges, has_gate=self.gate,
                aggregators=aggs,
                dropout_rate=self.dropout if not deterministic else 0.0,
                dropout_rng=attn_rng, tile_nodes=tile_nodes)
        elif use_tile:
            from ..ops.pallas.gt_tile import gt_attention_tile_merged

            qkvg = self._merged_proj(qkv_in, self.node_in_dim, qkv_specs,
                                     merged=True)
            # e_all carries the WE_logits / e_gate columns in f32: the
            # pre-softmax logit bias comes from the RAW residual edge
            # stream, which training grows to O(1e4-1e5); bf16 storage
            # (0.4% relative) adds +-40-700 ABSOLUTE noise to logits
            # whose meaningful inter-edge differences are O(1-100),
            # randomizing the attention ordering (measured as part of
            # the round-3 bf16 accuracy gap).
            e_all = None
            if self.edge_in_dim is not None:
                if fold:
                    e_all = self._merged_proj(edge_attr, self.edge_in_dim,
                                              e_specs_fold, merged=True,
                                              out_dtype=jnp.float32)
                else:
                    edge_attr_norm = norm0e(edge_attr, edge_mask, use_ra)
                    (e_val,) = self._merged_proj(
                        edge_attr_norm, self.edge_in_dim,
                        [("WE_value", self.hidden_dim, True, None)])
                    raw_specs = [("WE_logits", H, True, None)]
                    if self.gate:
                        raw_specs.append(("e_gate", H, True, None))
                    e_all = self._merged_proj(edge_attr, self.edge_in_dim,
                                              raw_specs, merged=True,
                                              out_dtype=jnp.float32)
                    e_all = jnp.concatenate(
                        [e_val.astype(jnp.float32), e_all], axis=1)
            out, eij = gt_attention_tile_merged(
                qkvg, edge_src, edge_dst, H, self.hidden_dim, tile_edges,
                e_all=e_all, has_gate=self.gate, aggregators=aggs,
                dropout_rate=self.dropout if not deterministic else 0.0,
                dropout_rng=attn_rng, tile_nodes=tile_nodes,
            )                   # [Np, hidden * A], [a][h][d] layout
        else:
            proj = self._merged_proj(qkv_in, self.node_in_dim, qkv_specs)
            q, k, v = proj[0], proj[1], proj[2]
            gate_n = proj[3] if self.gate else None

            e_bias = e_val = e_gate_logits = None
            if self.edge_in_dim is not None:
                # WE_logits / e_gate outputs stay f32 — see the e_all
                # precision note on the tile path above
                if fold:
                    eproj = self._merged_proj(edge_attr, self.edge_in_dim,
                                              e_specs_fold,
                                              out_dtype=jnp.float32)
                    e_val, e_bias = eproj[0].astype(self.dtype), eproj[1]
                    e_gate_logits = eproj[2] if self.gate else None
                else:
                    edge_attr_norm = norm0e(edge_attr, edge_mask, use_ra)
                    (e_val,) = self._merged_proj(
                        edge_attr_norm, self.edge_in_dim,
                        [("WE_value", self.hidden_dim, True, None)])
                    raw_specs = [("WE_logits", H, True, None)]
                    if self.gate:
                        raw_specs.append(("e_gate", H, True, None))
                    rproj = self._merged_proj(edge_attr, self.edge_in_dim,
                                              raw_specs,
                                              out_dtype=jnp.float32)
                    e_bias = rproj[0]
                    e_gate_logits = rproj[1] if self.gate else None

            out, eij = gt_attention(
                q, k, v, edge_src, edge_dst, H,
                e_bias=e_bias, e_val=e_val, gate_n=gate_n,
                e_gate_logits=e_gate_logits,
                aggregators=aggs,
                dropout_rate=self.dropout if not deterministic else 0.0,
                dropout_rng=attn_rng,
                max_in_degree=self.max_in_degree,
                impl=self.attn_impl,
                edge_perm_src=edge_perm_src,
                tile_edges=tile_edges,
                raw_layout=True,
                tile_nodes=tile_nodes,
            )                   # [Np, hidden * A], [a][h][d] layout

        drop = lambda name: Dropout(rate=self.dropout, name=name)

        if not use_proj:
            # WO consumes the reference [h][a][d] layout; the kernels
            # emit aggregator-major [a][h][d], so permute WO's ROWS
            # instead of relayouting the activation every step
            # (checkpoint orientation is unchanged — torch imports and
            # the lax path share it).
            wo_k, wo_b = _LinearParams(self.hidden_dim * len(aggs),
                                       self.node_in_dim,
                                       xavier_uniform(), name="WO")()
            if len(aggs) > 1:
                wo_k = wo_k[wo_row_perm(H, Dh, len(aggs))]
            attn_out = (jax.lax.dot(out.astype(self.dtype),
                                    wo_k.astype(self.dtype),
                                    preferred_element_type=jnp.float32)
                        + wo_b).astype(self.dtype)
        attn_out = drop("dropout_attn_out")(attn_out, deterministic=deterministic)
        x1 = x_res + attn_out

        norm2 = self.norm_fn("norm2", self.node_in_dim)
        node_ffn_hidden = max(self.hidden_dim, 4 * self.node_in_dim)
        if self._use_fused_ffn(x1.shape[0]):
            ffn_mod = FusedFFN(input_dim=self.node_in_dim,
                               output_dim=self.node_in_dim,
                               hidden_dim=node_ffn_hidden,
                               dropout=self.dropout, act=self.act,
                               name="ffn")
            if fold:
                affine2 = norm2(x1, node_mask, use_ra, return_affine=True)
                x_out = ffn_mod(x1, None, deterministic=deterministic,
                                affine=affine2)
            else:
                x1_norm = norm2(x1, node_mask, use_ra)
                x_out = ffn_mod(x1_norm, x1, deterministic=deterministic)
        else:
            x1_norm = norm2(x1, node_mask, use_ra)
            ffn_out = MLP(input_dim=self.node_in_dim,
                          output_dim=self.node_in_dim,
                          hidden_dims=node_ffn_hidden, num_hidden_layers=2,
                          dropout=self.dropout, act=self.act,
                          dtype=self.dtype,
                          name="ffn")(x1_norm, deterministic=deterministic)
            ffn_out = drop("dropout_ffn_out")(ffn_out,
                                              deterministic=deterministic)
            x_out = x1 + ffn_out

        # zero padding rows at the layer boundary: trash-slot rows would
        # otherwise accumulate unbounded garbage through the residual+FFN
        # chain layer over layer (harmless to real rows' values, but once
        # a padding activation overflows, 0*inf = NaN leaks into WEIGHT
        # gradients, which sum over all rows — observed as training NaNs
        # at lr=1e-3 after ~40 steps on v5e)
        if node_mask is not None:
            x_out = x_out * node_mask[:, None].astype(x_out.dtype)

        if self.edge_in_dim is None or edge_attr is None:
            return x_out, edge_attr

        # ---- edge update path (pre-softmax QK ⊙ E_val, gt_conv.py:323-341)
        if use_proj:
            e_attn = e_attn_pre.astype(self.dtype)
        else:
            e_attn = dense(self.edge_in_dim, "WOe")(eij)
        e_attn = drop("dropout_e_attn")(e_attn, deterministic=deterministic)
        e1 = edge_attr + e_attn
        norm1e = self.norm_fn("norm1e", self.edge_in_dim)
        edge_ffn_hidden = max(self.hidden_dim, 2 * self.edge_in_dim)
        if self._use_fused_ffn(e1.shape[0]):
            ffn_e_mod = FusedFFN(input_dim=self.edge_in_dim,
                                 output_dim=self.edge_in_dim,
                                 hidden_dim=edge_ffn_hidden,
                                 dropout=self.dropout, act=self.act,
                                 name="ffn_e")
            if fold:
                affine1e = norm1e(e1, edge_mask, use_ra,
                                  return_affine=True)
                edge_out = ffn_e_mod(e1, None,
                                     deterministic=deterministic,
                                     affine=affine1e)
            else:
                e1_norm = norm1e(e1, edge_mask, use_ra)
                edge_out = ffn_e_mod(e1_norm, e1,
                                     deterministic=deterministic)
        else:
            e1_norm = norm1e(e1, edge_mask, use_ra)
            e_ffn = MLP(input_dim=self.edge_in_dim,
                        output_dim=self.edge_in_dim,
                        hidden_dims=edge_ffn_hidden, num_hidden_layers=2,
                        dropout=self.dropout, act=self.act, dtype=self.dtype,
                        name="ffn_e")(e1_norm, deterministic=deterministic)
            e_ffn = drop("dropout_e_ffn")(e_ffn, deterministic=deterministic)
            edge_out = e1 + e_ffn

        if edge_mask is not None:
            edge_out = edge_out * edge_mask[:, None].astype(edge_out.dtype)

        return x_out, edge_out

    def norm_fn(self, name: str, features: int):
        return make_norm(self.norm, features, axis_name=self.bn_axis_name,
                         dtype=self.dtype, name=name)
