"""Periodic-table data for the pure-Python chemistry kernel.

This module replaces the subset of RDKit's ``PeriodicTable`` that the
reference featurizer relies on (atomic numbers, standard atomic weights,
default valence models for implicit-H assignment, and outer-shell electron
counts used by hybridization / Gasteiger computations).

Reference behavior being reproduced: ``gt_pyg/data/atom_features.py``
(symbol vocabulary :62-67, ``GetMass()`` :432) and RDKit's implicit-valence
model used implicitly throughout ``gt_pyg/data/utils.py``.
"""

from __future__ import annotations

# symbol -> atomic number
ATOMIC_NUM: dict[str, int] = {
    "H": 1, "He": 2, "Li": 3, "Be": 4, "B": 5, "C": 6, "N": 7, "O": 8,
    "F": 9, "Ne": 10, "Na": 11, "Mg": 12, "Al": 13, "Si": 14, "P": 15,
    "S": 16, "Cl": 17, "Ar": 18, "K": 19, "Ca": 20, "Sc": 21, "Ti": 22,
    "V": 23, "Cr": 24, "Mn": 25, "Fe": 26, "Co": 27, "Ni": 28, "Cu": 29,
    "Zn": 30, "Ga": 31, "Ge": 32, "As": 33, "Se": 34, "Br": 35, "Kr": 36,
    "Rb": 37, "Sr": 38, "Y": 39, "Zr": 40, "Nb": 41, "Mo": 42, "Tc": 43,
    "Ru": 44, "Rh": 45, "Pd": 46, "Ag": 47, "Cd": 48, "In": 49, "Sn": 50,
    "Sb": 51, "Te": 52, "I": 53, "Xe": 54, "Cs": 55, "Ba": 56, "La": 57,
    "Ce": 58, "Pr": 59, "Nd": 60, "Pm": 61, "Sm": 62, "Eu": 63, "Gd": 64,
    "Tb": 65, "Dy": 66, "Ho": 67, "Er": 68, "Tm": 69, "Yb": 70, "Lu": 71,
    "Hf": 72, "Ta": 73, "W": 74, "Re": 75, "Os": 76, "Ir": 77, "Pt": 78,
    "Au": 79, "Hg": 80, "Tl": 81, "Pb": 82, "Bi": 83, "Po": 84, "At": 85,
    "Rn": 86, "Fr": 87, "Ra": 88, "Ac": 89, "Th": 90, "Pa": 91, "U": 92,
    "Np": 93, "Pu": 94,
}

SYMBOL: dict[int, str] = {v: k for k, v in ATOMIC_NUM.items()}

# Standard atomic weights (IUPAC conventional values, matching RDKit's
# GetMass() to the precision relevant for the mass*0.01 feature slot).
ATOMIC_MASS: dict[int, float] = {
    1: 1.008, 2: 4.003, 3: 6.941, 4: 9.012, 5: 10.811, 6: 12.011,
    7: 14.007, 8: 15.999, 9: 18.998, 10: 20.180, 11: 22.990, 12: 24.305,
    13: 26.982, 14: 28.086, 15: 30.974, 16: 32.067, 17: 35.453, 18: 39.948,
    19: 39.098, 20: 40.078, 21: 44.956, 22: 47.867, 23: 50.942, 24: 51.996,
    25: 54.938, 26: 55.845, 27: 58.933, 28: 58.693, 29: 63.546, 30: 65.39,
    31: 69.723, 32: 72.61, 33: 74.922, 34: 78.96, 35: 79.904, 36: 83.80,
    37: 85.468, 38: 87.62, 39: 88.906, 40: 91.224, 41: 92.906, 42: 95.94,
    43: 98.0, 44: 101.07, 45: 102.906, 46: 106.42, 47: 107.868, 48: 112.412,
    49: 114.818, 50: 118.711, 51: 121.760, 52: 127.60, 53: 126.904,
    54: 131.29, 55: 132.905, 56: 137.328, 57: 138.906, 58: 140.116,
    59: 140.908, 60: 144.24, 61: 145.0, 62: 150.36, 63: 151.964,
    64: 157.25, 65: 158.925, 66: 162.50, 67: 164.930, 68: 167.26,
    69: 168.934, 70: 173.04, 71: 174.967, 72: 178.49, 73: 180.948,
    74: 183.84, 75: 186.207, 76: 190.23, 77: 192.217, 78: 195.078,
    79: 196.967, 80: 200.59, 81: 204.383, 82: 207.2, 83: 208.980,
    84: 209.0, 85: 210.0, 86: 222.0, 87: 223.0, 88: 226.0, 89: 227.0,
    90: 232.038, 91: 231.036, 92: 238.029, 93: 237.0, 94: 244.0,
}

# Default valence list per element for implicit-H assignment (RDKit model:
# the smallest default valence >= current explicit valence determines the
# implicit H count; -1 means "no implicit Hs ever" — metals etc.).
DEFAULT_VALENCES: dict[int, tuple[int, ...]] = {
    1: (1,),          # H
    2: (0,),          # He
    3: (1,),          # Li (RDKit gives Li default valence 1)
    4: (2,),          # Be
    5: (3,),          # B
    6: (4,),          # C
    7: (3,),          # N
    8: (2,),          # O
    9: (1,),          # F
    10: (0,),         # Ne
    11: (1,),         # Na
    12: (2,),         # Mg  (RDKit: -1; but bracket atoms get 0 implicit Hs anyway)
    13: (3,),         # Al
    14: (4,),         # Si
    15: (3, 5),       # P
    16: (2, 4, 6),    # S
    17: (1,),         # Cl
    18: (0,),         # Ar
    19: (1,),         # K
    20: (2,),         # Ca
    34: (2, 4, 6),    # Se
    35: (1,),         # Br
    52: (2, 4, 6),    # Te
    53: (1, 3, 5),    # I
}

# Outer-shell (valence) electron counts — used for lone-pair / hybridization
# and PEOE orbital-type classification.
OUTER_ELECS: dict[int, int] = {}
_GROUP_OUTER = {1: 1, 2: 2, 13: 3, 14: 4, 15: 5, 16: 6, 17: 7, 18: 8}


def get_group_number(z: int) -> int:
    """IUPAC group (1-18) for atomic number ``z``; 0 for lanthanides/actinides.

    Same mapping as the reference's ``get_group`` (atom_features.py:274-310);
    re-derived here from periodic structure instead of a literal dict.
    """
    if z <= 0:
        return 0
    if z == 1:
        return 1
    if z == 2:
        return 18
    for start, width in ((3, 8), (11, 8)):  # periods 2-3: 8 columns
        if start <= z < start + 8:
            col = z - start + 1  # 1..8
            return col if col <= 2 else col + 10
    for start in (19, 37):  # periods 4-5: 18 columns
        if start <= z < start + 18:
            return z - start + 1
    if 55 <= z <= 86:  # period 6 with lanthanides 57-71
        if 57 <= z <= 71:
            return 0
        idx = z - 54 if z < 57 else z - 54 - 14
        return idx
    if 87 <= z <= 118:  # period 7 with actinides 89-103
        if 89 <= z <= 103:
            return 0
        idx = z - 86 if z < 89 else z - 86 - 14
        return idx
    return 0


def get_period_number(z: int) -> int:
    """Periodic-table period (row) for atomic number ``z``.

    Same boundaries as the reference's ``get_period``
    (atom_features.py:236-271).
    """
    if z <= 0:
        return 0
    for period, hi in ((1, 2), (2, 10), (3, 18), (4, 36), (5, 54), (6, 86)):
        if z <= hi:
            return period
    return 7


for _z in range(1, 95):
    _g = get_group_number(_z)
    if _g in _GROUP_OUTER:
        OUTER_ELECS[_z] = _GROUP_OUTER[_g]
    elif _g == 0:
        OUTER_ELECS[_z] = 3  # lanthanide/actinide nominal
    else:
        OUTER_ELECS[_z] = _g  # transition metals: group number as d+s count


# Organic subset — atoms that may be written bare (without brackets) in
# SMILES, with implicit-H semantics.
ORGANIC_SUBSET = {"B", "C", "N", "O", "P", "S", "F", "Cl", "Br", "I"}

# Aromatic-capable symbols in SMILES lowercase notation.
AROMATIC_SYMBOLS = {"b", "c", "n", "o", "p", "s", "se", "as", "te"}

# Electronegativity (Pauling) — used for tie-breaks / conjugation heuristics.
PAULING_EN: dict[int, float] = {
    1: 2.20, 3: 0.98, 4: 1.57, 5: 2.04, 6: 2.55, 7: 3.04, 8: 3.44, 9: 3.98,
    11: 0.93, 12: 1.31, 13: 1.61, 14: 1.90, 15: 2.19, 16: 2.58, 17: 3.16,
    19: 0.82, 20: 1.00, 35: 2.96, 53: 2.66, 34: 2.55,
}


def default_valence_for(z: int, explicit_valence: float) -> int | None:
    """Smallest default valence >= ``explicit_valence``, or None if the
    element has no default-valence model (no implicit Hs)."""
    vals = DEFAULT_VALENCES.get(z)
    if vals is None:
        return None
    for v in vals:
        if v >= explicit_valence - 1e-6:
            return v
    return None
