"""Featurization & data pipeline (SMILES → padded device batches).

Public surface mirrors the reference's ``gt_pyg/data/__init__.py:34-59``
plus the TPU-specific batching/pipeline layer.
"""

from .atom_features import (  # noqa: F401
    get_atom_features,
    get_atom_feature_dim,
    one_hot_encoding,
    encode_ring_stats,
    get_gasteiger_charge,
    get_pharmacophore_flags_for_mol,
    get_period,
    get_group,
)
from .bond_features import get_bond_features, get_bond_feature_dim  # noqa: F401
from .gnm import get_gnm_encodings  # noqa: F401
from .featurize import (  # noqa: F401
    get_tensor_data,
    canonicalize_smiles,
    standardize_smiles,
    get_ring_membership_stats,
    mol_to_graph_tensors,
)
from .graph import GraphData, GraphBatch, pad_graph_batch  # noqa: F401
from .loader import iter_batches, full_batch, stack_labels  # noqa: F401
from .pipeline import (  # noqa: F401
    get_tensor_data_parallel,
    prefetch_batches,
    PrefetchIterator,
)
