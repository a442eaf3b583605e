"""Atom featurization — 140-dim vectors, layout-identical to the reference.

Layout (reference ``gt_pyg/data/atom_features.py:313-437``, derivation in
/root/repo/SURVEY.md §6): 43 atom-type + 6 degree + 8 charge + 7
hybridization + 1 in-ring + 1 aromatic + 1 atomic-number + 8 period + 19
group + 4 chiral tag + 3 CIP + 6 numH + 25 ring stats + 1 Gasteiger + 5
pharmacophore + 1 mass*0.01 + 1 GNM = 140.
"""

from __future__ import annotations

import logging
import math
from typing import Any, Dict, List, Optional, Union

import numpy as np

from ..chem.mol import Mol, Atom
from ..chem.periodic import get_group_number, get_period_number

logger = logging.getLogger(__name__)

RING_COUNT_CATEGORIES = [0, 1, 2, 3, "MoreThanThree"]
RING_SIZE_CATEGORIES = [3, 4, 5, 6, 7, 8, 9, 10, "MoreThanTen"]
PERIOD_CATEGORIES = [0, 1, 2, 3, 4, 5, 6, 7]
GROUP_CATEGORIES = list(range(19))  # 0 == undefined (lanthanides etc.)

PERMITTED_ATOMS = [
    "C", "N", "O", "S", "F", "Si", "P", "Cl", "Br", "Mg", "Na", "Ca", "Fe",
    "As", "Al", "I", "B", "V", "K", "Tl", "Yb", "Sb", "Sn", "Ag", "Pd",
    "Co", "Se", "Ti", "Zn", "Li", "Ge", "Cu", "Au", "Ni", "Cd", "In", "Mn",
    "Zr", "Cr", "Pt", "Hg", "Pb", "Unknown",
]

DEGREE_CATEGORIES = [0, 1, 2, 3, 4, "MoreThanFour"]
CHARGE_CATEGORIES = [-3, -2, -1, 0, 1, 2, 3, "Extreme"]
HYBRIDIZATION_CATEGORIES = ["S", "SP", "SP2", "SP3", "SP3D", "SP3D2", "OTHER"]
CHIRAL_CATEGORIES = [
    "CHI_UNSPECIFIED", "CHI_TETRAHEDRAL_CW", "CHI_TETRAHEDRAL_CCW", "CHI_OTHER",
]
CIP_CATEGORIES = ["R", "S", "UNKNOWN"]
NUM_H_CATEGORIES = [0, 1, 2, 3, 4, "MoreThanFour"]


def get_pharmacophore_flags_for_mol(mol: Mol) -> Dict[int, List[int]]:
    """Per-atom pharmacophore flags (reference
    ``get_pharmacophore_flags``, atom_features.py:184-233)."""
    from ..chem.patterns import get_pharmacophore_flags

    return get_pharmacophore_flags(mol)


def one_hot_encoding(x: Union[str, int, Any], permitted_list: List) -> List[int]:
    """One-hot over a vocabulary; unknown values map to the last (catch-all)
    slot, like the reference (atom_features.py:124-142)."""
    if x not in permitted_list:
        logger.debug("Unknown value %r mapped to catch-all %r", x, permitted_list[-1])
        x = permitted_list[-1]
    return [int(x == s) for s in permitted_list]


def encode_ring_stats(stats: Optional[Dict[str, Any]]) -> List[int]:
    """25-dim ring-stats block: count(5) + min size(9) + max size(9) +
    aromatic(1) + non-aromatic(1). Reference: atom_features.py:69-121."""
    if stats is None:
        return [0] * 25
    count = stats["count"]
    count_enc = one_hot_encoding(
        "MoreThanThree" if count > 3 else count, RING_COUNT_CATEGORIES)
    if stats["min_size"] is not None:
        mn = stats["min_size"]
        min_enc = one_hot_encoding(
            "MoreThanTen" if mn > 10 else mn, RING_SIZE_CATEGORIES)
    else:
        min_enc = [0] * 9
    if stats["max_size"] is not None:
        mx = stats["max_size"]
        max_enc = one_hot_encoding(
            "MoreThanTen" if mx > 10 else mx, RING_SIZE_CATEGORIES)
    else:
        max_enc = [0] * 9
    return (count_enc + min_enc + max_enc
            + [int(stats["has_aromatic"]), int(stats["has_non_aromatic"])])


def get_gasteiger_charge(atom: Atom, clip: float = 2.0) -> float:
    """Clipped, normalized PEOE charge in [-1, 1]; 0.0 when missing or
    non-finite (atom_features.py:145-181)."""
    charge = atom.props.get("_GasteigerCharge")
    if charge is None:
        logger.warning(
            "No Gasteiger charge for atom %s (idx %d); defaulting to 0.0",
            atom.symbol, atom.idx)
        return 0.0
    charge = float(charge)
    if math.isnan(charge) or math.isinf(charge):
        logger.warning(
            "Gasteiger charge is %s for atom %s (idx %d); defaulting to 0.0",
            "NaN" if math.isnan(charge) else "Inf", atom.symbol, atom.idx)
        return 0.0
    return float(np.clip(charge, -clip, clip) / clip)


def get_period(atomic_num: int) -> int:
    """Period (row). Same mapping as atom_features.py:236-271."""
    if atomic_num <= 0:
        logger.warning("Dummy/invalid atomic number %d mapped to period 0",
                       atomic_num)
        return 0
    return get_period_number(atomic_num)


def get_group(atomic_num: int) -> int:
    """Group (column), 0 for lanthanides/actinides (atom_features.py:274-310)."""
    return get_group_number(atomic_num)


def get_atom_features(
    mol: Mol,
    atom: Atom,
    use_stereochemistry: bool = True,
    hydrogens_implicit: bool = True,
    atom_ring_stats: Optional[Dict[int, Dict[str, Any]]] = None,
    pharmacophore_flags: Optional[Dict[int, List[int]]] = None,
    gnm_value: float = 0.0,
) -> np.ndarray:
    """140-dim atom feature vector (see module docstring for the layout)."""
    permitted = PERMITTED_ATOMS if hydrogens_implicit else ["H"] + PERMITTED_ATOMS

    vec: List[float] = []
    vec += one_hot_encoding(atom.symbol, permitted)
    vec += one_hot_encoding(mol.degree(atom.idx), DEGREE_CATEGORIES)
    vec += one_hot_encoding(atom.formal_charge, CHARGE_CATEGORIES)
    vec += one_hot_encoding(atom.hybridization, HYBRIDIZATION_CATEGORIES)
    vec += [int(mol.atom_in_ring(atom.idx))]
    vec += [int(atom.is_aromatic)]

    z = atom.atomic_num
    vec += [float(z)]
    vec += one_hot_encoding(get_period(z), PERIOD_CATEGORIES)
    vec += one_hot_encoding(get_group(z), GROUP_CATEGORIES)

    if use_stereochemistry:
        vec += one_hot_encoding(atom.chiral_tag, CHIRAL_CATEGORIES)
        cip = atom.props.get("_CIPCode", "Unknown").upper()
        vec += one_hot_encoding(cip, CIP_CATEGORIES)

    if hydrogens_implicit:
        nh = atom.total_num_hs
        vec += one_hot_encoding("MoreThanFour" if nh > 4 else nh, NUM_H_CATEGORIES)

    stats = None
    if atom_ring_stats is not None:
        stats = atom_ring_stats.get(atom.idx)
    vec += encode_ring_stats(stats)

    vec += [get_gasteiger_charge(atom)]

    flags = [0, 0, 0, 0, 0]
    if pharmacophore_flags is not None:
        flags = pharmacophore_flags.get(atom.idx, flags)
    vec += flags

    vec += [atom.mass * 0.01]
    vec += [gnm_value]

    return np.asarray(vec, dtype=np.float64)


def get_atom_feature_dim(
    use_stereochemistry: bool = True,
    hydrogens_implicit: bool = True,
) -> int:
    """Dimensionality of the atom feature vector (140 with defaults)."""
    from ..chem import parse_smiles
    from ..chem.gasteiger import compute_gasteiger_charges

    mol = parse_smiles("C")
    compute_gasteiger_charges(mol)
    return len(get_atom_features(
        mol, mol.atoms[0],
        use_stereochemistry=use_stereochemistry,
        hydrogens_implicit=hydrogens_implicit,
    ))
