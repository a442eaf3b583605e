"""gt_pyg_tpu — a TPU-native graph-transformer framework.

A from-scratch JAX/XLA/Pallas implementation of the graph transformer
model family of pgniewko/gt-pyg (Dwivedi & Bresson, arXiv:2012.09699),
specialized for molecular property prediction, with:

* an RDKit-free chemistry kernel (SMILES → graphs, Gasteiger charges,
  stereo, pharmacophores) in :mod:`gt_pyg_tpu.chem`;
* reference-equivalent 140/39-dim featurization in
  :mod:`gt_pyg_tpu.data`;
* fixed-shape padded graph batches, segment ops and fused Pallas
  attention kernels in :mod:`gt_pyg_tpu.ops`;
* GTConv / GraphTransformerNet with a variational Gaussian readout in
  :mod:`gt_pyg_tpu.nn`;
* composite masked multi-task training recipes in
  :mod:`gt_pyg_tpu.train`;
* pjit/shard_map data- and edge-parallelism in
  :mod:`gt_pyg_tpu.parallel`;
* versioned checkpointing (incl. torch ``.pt`` backbone import) in
  :mod:`gt_pyg_tpu.checkpoint`.

Public API parity: the reference exports
``{__version__, GraphTransformerNet, GTConv, MLP, get_tensor_data,
get_atom_feature_dim, get_bond_feature_dim}``
(``gt_pyg/nn/tests/test_public_api.py:10-18``); the same names are
re-exported here.
"""

from ._version import __version__  # noqa: F401

from .data import (  # noqa: F401
    get_tensor_data,
    get_atom_feature_dim,
    get_bond_feature_dim,
)

__all__ = [
    "__version__",
    "GraphTransformerNet",
    "GTConv",
    "MLP",
    "get_tensor_data",
    "get_atom_feature_dim",
    "get_bond_feature_dim",
]


def __getattr__(name):
    # lazy import of the nn layer so data-only use does not pull in jax
    if name in ("GraphTransformerNet", "GTConv", "MLP"):
        from . import nn

        return getattr(nn, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
