"""Pure-torch shim for the four torch_geometric symbols the reference
library imports, so the UNMODIFIED reference source at /root/reference
can execute inside this test suite (VERDICT round-2 item 4: golden
parity must run the reference's actual code, not a re-implementation).

Covers exactly what ``/root/reference/gt_pyg/nn/{gt_conv,mlp,model}.py``
and ``gt_pyg/data/utils.py`` import:

* ``torch_geometric.nn.MessagePassing`` — gather/message/aggregate with
  the default ``flow="source_to_target"`` semantics GTConv relies on
  (``gt_conv.py:345-393``: ``_i`` = target = edge_index[1], ``_j`` =
  source = edge_index[0], ``index`` = target index, ``node_dim=0``).
* ``torch_geometric.utils.softmax`` — segment softmax with per-segment
  max subtraction and the 1e-16 denominator epsilon.
* ``torch_geometric.nn.aggr.MultiAggregation`` — mode="cat" over
  sum/add/mean/max/min/var/std (PyG formulas: biased var = E[x²]-E[x]²,
  std = sqrt(relu(var)+1e-5); empty segments produce zeros except std's
  sqrt(1e-5)).
* ``torch_geometric.nn.resolver.activation_resolver``.
* ``torch_geometric.data.Data`` / ``Batch`` — attribute bags (the
  reference only type-checks ``Batch`` and reads ``.batch``).

``install()`` registers the fake modules in ``sys.modules`` and returns
a loader for the reference package that skips ``gt_pyg/__init__.py``
(which needs RDKit).
"""

from __future__ import annotations

import inspect
import sys
import types

import torch
from torch import nn

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# segment primitives (scatter-based, matching PyG's reduce semantics)
# ---------------------------------------------------------------------------

def _expand_index(index: torch.Tensor, src: torch.Tensor) -> torch.Tensor:
    """Broadcast a [E] index to src's shape for scatter along dim 0."""
    view = (-1,) + (1,) * (src.dim() - 1)
    return index.view(view).expand_as(src)


def _scatter_sum(src, index, dim_size):
    out = torch.zeros((dim_size,) + src.shape[1:], dtype=src.dtype)
    out.index_add_(0, index, src)
    return out


def _scatter_mean(src, index, dim_size):
    s = _scatter_sum(src, index, dim_size)
    ones = torch.ones(src.shape[0], dtype=src.dtype)
    cnt = torch.zeros(dim_size, dtype=src.dtype)
    cnt.index_add_(0, index, ones)
    cnt = cnt.clamp(min=1).view((-1,) + (1,) * (src.dim() - 1))
    return s / cnt


def _scatter_max(src, index, dim_size):
    out = torch.full((dim_size,) + src.shape[1:], float("-inf"),
                     dtype=src.dtype)
    out.scatter_reduce_(0, _expand_index(index, src), src, reduce="amax",
                        include_self=True)
    return torch.where(torch.isinf(out), torch.zeros_like(out), out)


def _scatter_min(src, index, dim_size):
    return -_scatter_max(-src, index, dim_size)


def _scatter_var(src, index, dim_size):
    mean = _scatter_mean(src, index, dim_size)
    mean2 = _scatter_mean(src * src, index, dim_size)
    return mean2 - mean * mean


_REDUCERS = {
    "sum": _scatter_sum,
    "add": _scatter_sum,
    "mean": _scatter_mean,
    "max": _scatter_max,
    "min": _scatter_min,
    "var": _scatter_var,
    "std": lambda s, i, n: torch.sqrt(
        torch.relu(_scatter_var(s, i, n)) + 1e-5),
}


def pyg_softmax(src, index, ptr=None, num_nodes=None, dim=0):
    """torch_geometric.utils.softmax: per-segment stable softmax with a
    1e-16 denominator epsilon."""
    n = int(num_nodes) if num_nodes is not None else int(index.max()) + 1
    m = _scatter_max(src, index, n)
    out = (src - m[index]).exp()
    denom = _scatter_sum(out, index, n)
    return out / (denom[index] + 1e-16)


class MultiAggregation(nn.Module):
    """mode="cat" multi-aggregation over dim -2 (the node/edge axis)."""

    def __init__(self, aggrs, mode="cat"):
        super().__init__()
        if mode != "cat":
            raise NotImplementedError("shim supports mode='cat' only")
        self.aggrs = list(aggrs)

    def forward(self, x, index=None, ptr=None, dim_size=None, dim=-2):
        # GTConv aggregates [E, H, Dh] messages with dim=node_dim=0;
        # global pooling aggregates [N, F] with the default dim=-2,
        # which is also axis 0 for 2-D input. Both reduce along axis 0.
        axis = dim if dim >= 0 else x.dim() + dim
        if axis != 0:
            raise NotImplementedError(f"shim: aggregation dim={dim}")
        n = int(dim_size) if dim_size is not None else int(index.max()) + 1
        outs = [_REDUCERS[a](x, index, n) for a in self.aggrs]
        return torch.cat(outs, dim=-1)


class MessagePassing(nn.Module):
    """source_to_target message passing over COO edge_index, node_dim=0.

    ``propagate(edge_index, **kwargs)``: kwargs named ``X_i`` are
    gathered from node tensor ``X`` at edge_index[1] (targets), ``X_j``
    at edge_index[0] (sources); unsuffixed names pass through (edge
    level). ``message`` may also request ``index`` (the target index).
    Messages are reduced into [N, ...] by ``aggr`` ("add" or a
    MultiAggregation module, concatenated along the last axis).
    """

    def __init__(self, aggr="add", node_dim=0, flow="source_to_target"):
        super().__init__()
        if node_dim != 0 or flow != "source_to_target":
            raise NotImplementedError("shim: node_dim=0 source_to_target")
        self.aggr = aggr
        self.node_dim = node_dim
        self.flow = flow

    def propagate(self, edge_index, size=None, **kwargs):
        src, dst = edge_index[0], edge_index[1]
        sig = inspect.signature(self.message)
        msg_kwargs = {}
        n = None
        for name in sig.parameters:
            if name == "index":
                msg_kwargs["index"] = dst
            elif name.endswith("_i") or name.endswith("_j"):
                base = name[:-2]
                val = kwargs.get(base)
                if val is None:
                    msg_kwargs[name] = None
                    continue
                n = val.shape[0] if n is None else n
                idx = dst if name.endswith("_i") else src
                msg_kwargs[name] = val[idx]
            elif name in kwargs:
                msg_kwargs[name] = kwargs[name]
        out = self.message(**msg_kwargs)
        if size is not None and size[1] is not None:
            n = size[1]
        if n is None:
            n = int(dst.max()) + 1
        if isinstance(self.aggr, MultiAggregation):
            return self.aggr(out, dst, dim_size=n, dim=0)
        if self.aggr in ("add", "sum"):
            return _scatter_sum(out, dst, n)
        raise NotImplementedError(f"shim: aggr={self.aggr!r}")

    def message(self, x_j):  # pragma: no cover - overridden
        return x_j


def activation_resolver(act, **kwargs):
    table = {
        "relu": nn.ReLU,
        "gelu": nn.GELU,
        "elu": nn.ELU,
        "silu": nn.SiLU,
        "leaky_relu": nn.LeakyReLU,
        "tanh": nn.Tanh,
        "sigmoid": nn.Sigmoid,
    }
    name = str(act).lower()
    if name not in table:
        raise ValueError(f"shim activation_resolver: {act!r}")
    return table[name](**kwargs)


class Data:
    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)


class Batch(Data):
    pass


def install():
    """Register fake torch_geometric modules; idempotent."""
    tg = types.ModuleType("torch_geometric")
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_nn.MessagePassing = MessagePassing
    tg_utils = types.ModuleType("torch_geometric.utils")
    tg_utils.softmax = pyg_softmax
    tg_aggr = types.ModuleType("torch_geometric.nn.aggr")
    tg_aggr.MultiAggregation = MultiAggregation
    tg_nn.aggr = tg_aggr
    tg_resolver = types.ModuleType("torch_geometric.nn.resolver")
    tg_resolver.activation_resolver = activation_resolver
    tg_nn.resolver = tg_resolver
    tg_data = types.ModuleType("torch_geometric.data")
    tg_data.Data = Data
    tg_data.Batch = Batch
    tg.nn = tg_nn
    tg.utils = tg_utils
    tg.data = tg_data
    for name, mod in [("torch_geometric", tg),
                      ("torch_geometric.nn", tg_nn),
                      ("torch_geometric.utils", tg_utils),
                      ("torch_geometric.nn.aggr", tg_aggr),
                      ("torch_geometric.nn.resolver", tg_resolver),
                      ("torch_geometric.data", tg_data)]:
        sys.modules.setdefault(name, mod)


def load_reference_nn():
    """Import the reference's nn modules from /root/reference without
    executing ``gt_pyg/__init__.py`` (which imports RDKit).

    Returns the ``gt_pyg.nn.model`` module (GraphTransformerNet, and via
    its imports GTConv and MLP) loaded from the unmodified sources.
    """
    install()
    import importlib

    if "gt_pyg" not in sys.modules:
        pkg = types.ModuleType("gt_pyg")
        pkg.__path__ = [f"{REFERENCE_ROOT}/gt_pyg"]
        pkg.__version__ = "0+shim"
        sys.modules["gt_pyg"] = pkg
        sub = types.ModuleType("gt_pyg.nn")
        sub.__path__ = [f"{REFERENCE_ROOT}/gt_pyg/nn"]
        sys.modules["gt_pyg.nn"] = sub
    return importlib.import_module("gt_pyg.nn.model")
