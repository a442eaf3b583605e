"""SMILES → graph featurization pipeline.

Reproduces the reference's ``get_tensor_data`` stack
(``gt_pyg/data/utils.py:415-542``) on the RDKit-free chemistry kernel:
canonicalize → assign stereo → Gasteiger charges (skip compound when
non-finite) → pharmacophores/ring-stats/GNM → 140/39-dim features →
:class:`~gt_pyg_tpu.data.graph.GraphData`.
"""

from __future__ import annotations

import logging
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from ..chem import parse_smiles, Mol, SanitizeError, SmilesParseError
from ..chem.gasteiger import compute_gasteiger_charges
from ..chem.patterns import get_pharmacophore_flags
from ..chem.stereo import assign_stereochemistry
from .atom_features import get_atom_features
from .bond_features import get_bond_features, get_bond_feature_dim
from .gnm import get_gnm_encodings
from .graph import GraphData

logger = logging.getLogger(__name__)


def _check_chembl_pipeline() -> None:
    """Raise ImportError when chembl_structure_pipeline is unavailable
    (reference semantics, data/utils.py:28-36)."""
    try:
        import chembl_structure_pipeline  # noqa: F401
    except ImportError:
        raise ImportError(
            "chembl_structure_pipeline is required for SMILES standardization. "
            "Install it with: pip install chembl_structure_pipeline"
        )


def standardize_smiles(smiles: str) -> Optional[str]:
    """ChEMBL structure-pipeline standardization (optional dependency);
    returns None on failure (reference data/utils.py:39-74)."""
    _check_chembl_pipeline()
    from chembl_structure_pipeline import standardize_mol, get_parent_mol  # type: ignore
    from rdkit import Chem  # chembl pipeline implies rdkit

    try:
        mol = Chem.MolFromSmiles(smiles)
        if mol is None:
            return None
        std = standardize_mol(mol)
        if std is None:
            return None
        parent, _ = get_parent_mol(std)
        if parent is None:
            return None
        return Chem.MolToSmiles(parent, canonical=True)
    except Exception as e:  # pragma: no cover
        logger.warning("ChEMBL standardization failed for '%s': %s", smiles, e)
        return None


def _canonicalize_mol(
    smiles: str,
    keep_stereo: bool = True,
    keep_charges: bool = True,
    keep_largest_fragment: bool = True,
) -> Optional[Mol]:
    """Parse + clean a SMILES: remove explicit Hs (done by the parser),
    optionally strip stereo, keep the largest fragment, optionally
    neutralize charges. Reference: data/utils.py:77-143."""
    try:
        mol = parse_smiles(smiles)
    except (SmilesParseError, SanitizeError) as e:
        logger.warning("Failed to canonicalize SMILES '%s': %s", smiles, e)
        return None

    try:
        if not keep_stereo:
            for a in mol.atoms:
                a.chiral_tag = "CHI_UNSPECIFIED"
                a.props.pop("_CIPCode", None)
            for b in mol.bonds:
                b.stereo = "STEREONONE"
                b.direction = "NONE"

        if keep_largest_fragment:
            frags = mol.fragments()
            if len(frags) > 1:
                sizes = [
                    sum(1 for a in f if mol.atoms[a].atomic_num > 1)
                    for f in frags
                ]
                best = frags[int(np.argmax(sizes))]
                mol = mol.extract_fragment(best)
                mol.sanitize()

        if not keep_charges:
            for a in mol.atoms:
                chg = a.formal_charge
                if chg == 0:
                    continue
                # skip zwitterion partners bonded to opposite charge
                paired = any(
                    mol.atoms[nb].formal_charge * chg < 0
                    for nb in mol.neighbors(a.idx)
                )
                if paired:
                    continue
                if chg > 0 and a.total_num_hs == 0:
                    continue
                new_h = a.total_num_hs - chg
                if new_h < 0:
                    logger.warning(
                        "Charge neutralization would set negative H count "
                        "(%d) on atom %d; clamping to 0", new_h, a.idx)
                    new_h = 0
                a.formal_charge = 0
                a.num_explicit_hs = new_h
                a.num_implicit_hs = 0
                a.explicit_hs_set = True
        return mol
    except Exception as e:
        logger.warning("Failed to canonicalize SMILES '%s': %s", smiles, e)
        return None


def canonicalize_smiles(
    smiles: str,
    keep_stereo: bool = True,
    keep_charges: bool = True,
    keep_largest_fragment: bool = True,
) -> Optional[str]:
    """Canonical SMILES with fragment/stereo/charge handling
    (reference data/utils.py:146-182)."""
    from ..chem.smiles_writer import write_smiles

    mol = _canonicalize_mol(smiles, keep_stereo, keep_charges,
                            keep_largest_fragment)
    if mol is None:
        return None
    out = write_smiles(mol, isomeric=keep_stereo, canonical=True)
    return out or None


def get_ring_membership_stats(
    mol: Mol,
) -> Tuple[Dict[int, Dict[str, Any]], Dict[int, Dict[str, Any]]]:
    """Per-atom and per-bond SSSR ring stats
    (count / min_size / max_size / has_aromatic / has_non_aromatic).
    Reference: data/utils.py:185-264; a ring counts as aromatic when ALL of
    its bonds are aromatic."""
    atom_rings, bond_rings = mol.ring_info()

    def blank():
        return {"count": 0, "min_size": None, "max_size": None,
                "has_aromatic": False, "has_non_aromatic": False}

    atom_stats = {i: blank() for i in range(mol.num_atoms)}
    bond_stats = {i: blank() for i in range(mol.num_bonds)}

    for a_ring, b_ring in zip(atom_rings, bond_rings):
        size = len(a_ring)
        is_arom = all(mol.bonds[bi].is_aromatic for bi in b_ring)
        for keys, stats in ((a_ring, atom_stats), (b_ring, bond_stats)):
            for k in keys:
                st = stats[k]
                st["count"] += 1
                st["min_size"] = size if st["min_size"] is None else min(st["min_size"], size)
                st["max_size"] = size if st["max_size"] is None else max(st["max_size"], size)
                if is_arom:
                    st["has_aromatic"] = True
                else:
                    st["has_non_aromatic"] = True

    return atom_stats, bond_stats


def _summarize_invalid_gasteiger_charges(mol: Mol) -> Optional[str]:
    """Short description of atoms with non-finite charges, or None."""
    issues = []
    for a in mol.atoms:
        label = f"{a.idx}:{a.symbol}"
        q = a.props.get("_GasteigerCharge")
        if q is None:
            issues.append(f"{label}=missing")
        elif math.isnan(q):
            issues.append(f"{label}=NaN")
        elif math.isinf(q):
            issues.append(f"{label}=Inf")
    if not issues:
        return None
    preview = ", ".join(issues[:3])
    if len(issues) > 3:
        preview += ", ..."
    return f"invalid _GasteigerCharge values for {len(issues)} atom(s): {preview}"


def mol_to_graph_tensors(mol: Mol) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Mol → (x [N,140] f32, edge_index [2,E] i64, edge_attr [E,39] f32).

    Stereo + Gasteiger must already be assigned. COO edges cover both
    directions, ordered like ``np.nonzero(adjacency)`` (row-major), exactly
    as the reference builds them (data/utils.py:341-344).
    """
    n = mol.num_atoms
    pharm = get_pharmacophore_flags(mol)
    adjacency = mol.adjacency()

    try:
        gnm_diag = get_gnm_encodings(adjacency)
    except Exception:
        logger.warning("GNM computation failed for molecule with %d atoms; "
                       "using zeros", n)
        gnm_diag = np.zeros(n, dtype=float)

    atom_stats, bond_stats = get_ring_membership_stats(mol)

    x = np.stack([
        get_atom_features(
            mol, a,
            use_stereochemistry=True, hydrogens_implicit=True,
            atom_ring_stats=atom_stats,
            pharmacophore_flags=pharm,
            gnm_value=float(gnm_diag[a.idx]),
        )
        for a in mol.atoms
    ]) if n else np.zeros((0, 140))

    rows, cols = np.nonzero(adjacency)
    edge_index = np.stack([rows, cols]).astype(np.int64)

    if len(rows):
        edge_attr = np.stack([
            get_bond_features(mol, mol.get_bond(int(i), int(j)),
                              use_stereochemistry=True,
                              bond_ring_stats=bond_stats)
            for i, j in zip(rows, cols)
        ])
    else:
        edge_attr = np.empty((0, get_bond_feature_dim()), dtype=float)

    return (x.astype(np.float32), edge_index,
            edge_attr.astype(np.float32))


def _to_float_sequence(y_val) -> np.ndarray:
    """Single numeric → [1]; sequence → [T]; None/NaN entries preserved as
    NaN for masking (reference data/utils.py:366-385)."""
    if isinstance(y_val, (float, int, np.floating, np.integer)):
        return np.array([float(y_val)], dtype=np.float32)
    return np.array([np.nan if v is None else float(v) for v in y_val],
                    dtype=np.float32)


def get_tensor_data(
    x_smiles: List[str],
    y: Optional[List[Union[float, int, Sequence, np.ndarray]]] = None,
    standardize: bool = False,
    ids: Optional[List[Any]] = None,
    progress: bool = True,
) -> List[GraphData]:
    """Featurize SMILES into :class:`GraphData` with optional multi-task
    labels + masks. Compounds with invalid Gasteiger charges are skipped
    with a warning (reference semantics, data/utils.py:415-542)."""
    if standardize:
        _check_chembl_pipeline()
    has_labels = y is not None

    if has_labels and len(x_smiles) != len(y):
        raise ValueError(
            f"x_smiles and y must have the same length, "
            f"got {len(x_smiles)} and {len(y)}")
    if ids is not None and len(x_smiles) != len(ids):
        raise ValueError(
            f"x_smiles and ids must have the same length, "
            f"got {len(x_smiles)} and {len(ids)}")

    y_iter = y if has_labels else [None] * len(x_smiles)
    ids_iter = ids if ids is not None else [None] * len(x_smiles)

    iterator = enumerate(zip(x_smiles, y_iter, ids_iter))
    if progress:
        try:
            from tqdm.auto import tqdm

            iterator = tqdm(iterator, total=len(x_smiles),
                            desc="Processing data")
        except ImportError:
            pass

    out: List[GraphData] = []
    for row, (smiles, y_val, compound_id) in iterator:
        if compound_id is None:
            compound_id = row

        if standardize:
            std = standardize_smiles(smiles)
            if std is not None:
                smiles = std

        mol = _canonicalize_mol(smiles)
        if mol is None:
            raise ValueError(f"Failed to canonicalize SMILES: {smiles}")
        assign_stereochemistry(mol)

        try:
            compute_gasteiger_charges(mol)
        except Exception as e:
            logger.warning(
                "Skipping compound due to invalid Gasteiger charges: "
                "compound_id=%r row=%d smiles=%r reason=%s. "
                "Consider removing this compound from the dataset.",
                compound_id, row, smiles,
                f"Gasteiger charge computation failed: {e}")
            continue

        invalid = _summarize_invalid_gasteiger_charges(mol)
        if invalid is not None:
            logger.warning(
                "Skipping compound due to invalid Gasteiger charges: "
                "compound_id=%r row=%d smiles=%r reason=%s. "
                "Consider removing this compound from the dataset.",
                compound_id, row, smiles, invalid)
            continue

        x, edge_index, edge_attr = mol_to_graph_tensors(mol)
        g = GraphData(x=x, edge_index=edge_index, edge_attr=edge_attr,
                      smiles=smiles, compound_id=compound_id)
        if has_labels:
            y_arr = _to_float_sequence(y_val)
            g.y = y_arr[None, :]
            g.y_mask = np.isfinite(y_arr).astype(np.float32)[None, :]
        out.append(g)

    return out
