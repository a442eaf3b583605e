"""Gasteiger-Marsili PEOE partial charges.

Replaces ``rdkit.Chem.rdPartialCharges.ComputeGasteigerCharges`` (called at
``gt_pyg/data/utils.py:496``). The reference reads the per-heavy-atom
``_GasteigerCharge`` property (``atom_features.py:164``), clips to [-2, 2]
and scales to [-1, 1].

Implementation follows the original PEOE scheme (Gasteiger & Marsili,
Tetrahedron 36 (1980) 3219): 12 damped iterations of electronegativity
equalization over sigma bonds, with implicit hydrogens expanded to virtual
H atoms. Elements/orbitals without parameters get the zero "dummy" row,
which yields non-finite charges — exactly the failure mode the reference's
skip-on-bad-charges path expects for exotic metals
(``data/utils.py:509-520``, tested with an Au complex at
``data/tests/test_utils.py:16-19``).
"""

from __future__ import annotations

import math

from .mol import Mol, DOUBLE

# (a, b, c) electronegativity polynomial chi(q) = a + b*q + c*q^2
# per element symbol + orbital label. Classic PEOE parameter set.
_PARAMS: dict[tuple[str, str], tuple[float, float, float]] = {
    ("H", "*"): (7.17, 6.24, -0.56),
    ("C", "sp3"): (7.98, 9.18, 1.88),
    ("C", "sp2"): (8.79, 9.32, 1.51),
    ("C", "sp"): (10.39, 9.45, 0.73),
    ("N", "sp3"): (11.54, 10.82, 1.36),
    ("N", "sp2"): (12.87, 11.15, 0.85),
    ("N", "sp"): (15.68, 11.70, -0.27),
    ("O", "sp3"): (14.18, 12.92, 1.39),
    ("O", "sp2"): (17.07, 13.79, 0.47),
    ("F", "sp3"): (14.66, 13.85, 2.31),
    ("Cl", "sp3"): (11.00, 9.69, 1.35),
    ("Br", "sp3"): (10.08, 8.47, 1.16),
    ("I", "sp3"): (9.90, 7.96, 0.96),
    ("S", "sp3"): (10.14, 9.13, 1.38),
    ("S", "so"): (10.14, 9.13, 1.38),
    ("S", "so2"): (12.00, 10.81, 1.20),
    ("P", "sp3"): (8.90, 8.24, 0.96),
}
_DUMMY = (0.0, 0.0, 0.0)
_H_CHI_PLUS = 20.02
_DAMP = 0.5
_NITER = 12


def _orbital_label(mol: Mol, idx: int) -> str:
    a = mol.atoms[idx]
    if a.symbol == "S":
        # sulfoxide / sulfone labels
        n_ox_double = sum(
            1 for b in mol.atom_bonds(idx)
            if b.kekule_order == DOUBLE and mol.atoms[b.other(idx)].atomic_num == 8
        )
        if n_ox_double == 1:
            return "so"
        if n_ox_double >= 2:
            return "so2"
        return "sp3"
    hyb = a.hybridization
    if hyb in ("SP3", "SP3D", "SP3D2", "S"):
        return "sp3"
    if hyb == "SP2":
        return "sp2"
    if hyb == "SP":
        return "sp"
    return "sp3"


def _params_for(mol: Mol, idx: int) -> tuple[float, float, float]:
    sym = mol.atoms[idx].symbol
    label = _orbital_label(mol, idx)
    return _PARAMS.get((sym, label)) or _PARAMS.get((sym, "sp3")) or _DUMMY


def compute_gasteiger_charges(mol: Mol, n_iter: int = _NITER) -> list[float]:
    """Compute PEOE charges; stores ``_GasteigerCharge`` on each atom's
    ``props`` and returns the list of heavy-atom charges.

    Unparameterized atoms produce ``nan``/``inf`` charges (not an error),
    matching the reference's skip-compound semantics.
    """
    n_heavy = mol.num_atoms

    # expand implicit/explicit Hs into virtual atoms
    params: list[tuple[float, float, float]] = []
    charges: list[float] = []
    bonds: list[tuple[int, int]] = []
    for a in mol.atoms:
        params.append(_params_for(mol, a.idx))
        charges.append(float(a.formal_charge))
    for b in mol.bonds:
        bonds.append((b.begin, b.end))
    h_parent: list[int] = []
    for a in mol.atoms:
        for _ in range(a.total_num_hs):
            hid = n_heavy + len(h_parent)
            h_parent.append(a.idx)
            params.append(_PARAMS[("H", "*")])
            charges.append(0.0)
            bonds.append((a.idx, hid))

    n_all = n_heavy + len(h_parent)
    # chi+ normalizers: chi at q=+1 (a+b+c); H uses the standard 20.02
    chi_plus = []
    for k in range(n_all):
        a_, b_, c_ = params[k]
        if k >= n_heavy:
            chi_plus.append(_H_CHI_PLUS)
        else:
            chi_plus.append(a_ + b_ + c_)

    for it in range(n_iter):
        damp = _DAMP ** (it + 1)
        chi = [a_ + b_ * q + c_ * q * q
               for (a_, b_, c_), q in zip(params, charges)]
        delta = [0.0] * n_all
        for (i, j) in bonds:
            ci, cj = chi[i], chi[j]
            if ci == cj:
                continue
            if ci < cj:
                # electrons flow i -> j; normalize by chi+ of donor i
                denom = chi_plus[i]
                dq = (cj - ci) / denom if denom != 0.0 else math.inf
            else:
                denom = chi_plus[j]
                dq = -((ci - cj) / denom) if denom != 0.0 else -math.inf
            delta[i] += dq * damp
            delta[j] -= dq * damp
        for k in range(n_all):
            charges[k] += delta[k]
            if not math.isfinite(charges[k]):
                charges[k] = math.nan if math.isnan(charges[k]) else charges[k]

    heavy = charges[:n_heavy]
    h_sums = [0.0] * n_heavy
    for hk, parent in enumerate(h_parent):
        h_sums[parent] += charges[n_heavy + hk]
    for a in mol.atoms:
        a.props["_GasteigerCharge"] = heavy[a.idx]
        a.props["_GasteigerHCharge"] = h_sums[a.idx]
    return heavy
