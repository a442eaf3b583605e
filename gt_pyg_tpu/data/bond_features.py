"""Bond featurization — 39-dim vectors, layout-identical to the reference.

Layout (``gt_pyg/data/bond_features.py:15-68``): 5 bond-type + 1 conjugated
+ 1 in-ring + 7 stereo + 25 ring stats = 39.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from ..chem.mol import Mol, Bond
from .atom_features import encode_ring_stats, one_hot_encoding

BOND_TYPE_CATEGORIES = ["SINGLE", "DOUBLE", "TRIPLE", "AROMATIC", "OTHER"]
BOND_STEREO_CATEGORIES = [
    "STEREOZ", "STEREOE", "STEREOANY", "STEREONONE",
    "STEREOCIS", "STEREOTRANS", "OTHER",
]


def get_bond_features(
    mol: Mol,
    bond: Bond,
    use_stereochemistry: bool = True,
    bond_ring_stats: Optional[Dict[int, Dict[str, Any]]] = None,
) -> np.ndarray:
    """39-dim bond feature vector (see module docstring)."""
    # aromatic bonds report AROMATIC regardless of kekulé assignment,
    # matching RDKit's GetBondType on sanitized molecules
    btype = "AROMATIC" if bond.is_aromatic else bond.order
    vec = one_hot_encoding(btype, BOND_TYPE_CATEGORIES)
    vec += [int(bond.is_conjugated)]
    vec += [int(mol.bond_in_ring(bond.idx))]

    if use_stereochemistry:
        vec += one_hot_encoding(bond.stereo, BOND_STEREO_CATEGORIES)

    stats = None
    if bond_ring_stats is not None:
        stats = bond_ring_stats.get(bond.idx)
    vec += encode_ring_stats(stats)

    return np.asarray(vec, dtype=np.float64)


def get_bond_feature_dim(use_stereochemistry: bool = True) -> int:
    """Dimensionality of the bond feature vector (39 with defaults)."""
    from ..chem import parse_smiles

    mol = parse_smiles("CC")
    return len(get_bond_features(mol, mol.bonds[0],
                                 use_stereochemistry=use_stereochemistry))
