"""Stereochemistry perception: CIP R/S labels and double-bond E/Z.

Replaces ``Chem.AssignStereochemistry(mol, cleanIt=True, force=True)``
(called at ``gt_pyg/data/utils.py:492``). Feature consumers:

* atom ``_CIPCode`` ("R"/"S") one-hot — ``atom_features.py:403-406``
* atom chiral tag one-hot — ``atom_features.py:397-401``
* bond stereo one-hot (STEREOZ/E/ANY/NONE/CIS/TRANS) —
  ``bond_features.py:56-60``

CIP priorities use the classic sphere-expansion model with duplicate atoms
for multiple bonds (kekulé orders). Tags on non-stereogenic atoms (equal
branches) are cleaned to CHI_UNSPECIFIED, mirroring ``cleanIt=True``.
"""

from __future__ import annotations

from .mol import (
    Mol, DOUBLE,
    CHI_UNSPECIFIED, CHI_CW, CHI_CCW,
    STEREOZ, STEREOE, DIR_NONE, DIR_UP,
)


def _branch_spheres(mol: Mol, root: int, start: int, max_depth: int = 12):
    """Yield per-sphere sorted atomic-number lists for the branch entered
    from `root` via neighbor `start` (CIP-style, with duplicate phantom
    atoms for multiple bonds)."""
    # node: (atom_idx, parent_idx) ; phantom: ('dup', Z)
    sphere = [(start, root)]
    b0 = mol.get_bond(root, start)
    extra0 = int(round(b0.kekule_value)) - 1 if b0 else 0
    phantoms = [mol.atoms[root].atomic_num] * extra0
    depth = 0
    visited_edges = {(root, start)}
    while (sphere or phantoms) and depth < max_depth:
        vals = sorted(
            [mol.atoms[a].atomic_num for a, _ in sphere] + phantoms,
            reverse=True,
        )
        yield vals
        nxt = []
        nxt_phantoms = []
        for a, parent in sphere:
            za = mol.atoms[a].atomic_num
            # implicit hydrogens expand as real H leaves
            nxt_phantoms.extend([1] * mol.atoms[a].total_num_hs)
            for b in mol.atom_bonds(a):
                nb = b.other(a)
                order = int(round(b.kekule_value))
                # phantom duplicates for pi bonds (both directions)
                if order > 1:
                    nxt_phantoms.extend([mol.atoms[nb].atomic_num] * (order - 1))
                if nb == parent:
                    continue
                if (a, nb) in visited_edges:
                    # ring closure: CIP adds a duplicate then stops
                    nxt_phantoms.append(mol.atoms[nb].atomic_num)
                    continue
                visited_edges.add((a, nb))
                nxt.append((nb, a))
        sphere = nxt
        phantoms = nxt_phantoms
        depth += 1


def _compare_branches(mol: Mol, root: int, n1, n2) -> int:
    """CIP-style comparison of two substituents of `root`.

    n1/n2 are neighbor atom indices or 'H' for the implicit hydrogen.
    Returns >0 if n1 has priority over n2, <0 if lower, 0 if tied.
    """
    if n1 == "H" and n2 == "H":
        return 0
    if n1 == "H":
        return -1 if mol.atoms[n2].atomic_num >= 1 else 1
    if n2 == "H":
        z1 = mol.atoms[n1].atomic_num
        return 1 if z1 >= 1 else -1
    it1 = _branch_spheres(mol, root, n1)
    it2 = _branch_spheres(mol, root, n2)
    while True:
        v1 = next(it1, None)
        v2 = next(it2, None)
        if v1 is None and v2 is None:
            return 0
        if v1 is None:
            return -1
        if v2 is None:
            return 1
        if v1 != v2:
            return 1 if v1 > v2 else -1


def _rank_neighbors(mol: Mol, center: int, neighbors: list):
    """Sort neighbors by CIP priority (descending). Returns None on tie."""
    import functools

    def cmp(a, b):
        return _compare_branches(mol, center, a, b)

    ranked = sorted(neighbors, key=functools.cmp_to_key(cmp), reverse=True)
    for k in range(len(ranked) - 1):
        if _compare_branches(mol, center, ranked[k], ranked[k + 1]) == 0:
            return None
    return ranked


def _perm_parity(a: list, b: list) -> int:
    """Number of transpositions (mod 2) turning list a into list b."""
    a = list(a)
    parity = 0
    for i in range(len(a)):
        if a[i] != b[i]:
            j = a.index(b[i], i + 1)
            a[i], a[j] = a[j], a[i]
            parity ^= 1
    return parity


def assign_atom_stereo(mol: Mol) -> None:
    """Compute _CIPCode for atoms carrying a tetrahedral tag; clean tags on
    non-stereogenic centers."""
    for a in mol.atoms:
        if a.chiral_tag not in (CHI_CW, CHI_CCW):
            continue
        sn = [x for x in a._stereo_neighbors if x is not None]
        # pad the implicit-H slot if the parser didn't record one but the
        # atom has exactly 3 listed neighbors and one hydrogen
        if len(sn) == 3 and a.total_num_hs == 1 and "H" not in sn:
            sn = [sn[0], "H", sn[1], sn[2]]
        if len(sn) != 4:
            a.chiral_tag = CHI_UNSPECIFIED
            continue
        ranked = _rank_neighbors(mol, a.idx, sn)
        if ranked is None:
            # not a stereocenter under our CIP model — cleanIt semantics
            a.chiral_tag = CHI_UNSPECIFIED
            a.props.pop("_CIPCode", None)
            continue
        # target arrangement [lowest, a, b, c] (descending after lowest)
        target = [ranked[3], ranked[0], ranked[1], ranked[2]]
        parity = _perm_parity(sn, target)
        # '@' (CCW): in written order, looking from sn[0], sn[1..3] run CCW.
        # In arrangement [d,a,b,c]: looking from d, a->b->c CCW; with d
        # pointing away the sense flips to CW => R. Each transposition of
        # the neighbor list flips handedness.
        base = "R" if a.chiral_tag == CHI_CCW else "S"
        if parity:
            base = "S" if base == "R" else "R"
        a.props["_CIPCode"] = base


def _direction_sign(bond, anchor: int) -> int:
    """+1 if the far end of `bond` points 'up' relative to `anchor`."""
    if bond.direction == DIR_NONE:
        return 0
    up = bond.direction == DIR_UP
    # direction is stored for begin -> end
    if bond.begin == anchor:
        return 1 if up else -1
    return -1 if up else 1


def assign_bond_stereo(mol: Mol) -> None:
    """Compute STEREOE/STEREOZ for double bonds flanked by directional
    single bonds."""
    for b in mol.bonds:
        if b.kekule_order != DOUBLE or b.is_aromatic:
            continue
        i, j = b.begin, b.end
        ref = {}
        ok = True
        for end in (i, j):
            cands = []
            for nb_bond in mol.atom_bonds(end):
                if nb_bond.idx == b.idx:
                    continue
                sgn = _direction_sign(nb_bond, end)
                if sgn != 0:
                    cands.append((nb_bond.other(end), sgn))
            if not cands:
                ok = False
                break
            ref[end] = cands[0]
        if not ok:
            continue
        (k, sk), (l, sl) = ref[i], ref[j]
        # 'F/C=C/F': F is below its carbon on the left, above on the right
        # -> opposite sides (trans). Substituents share a side iff their
        # up/down signs relative to their own double-bond carbon agree.
        same_side = (sk == sl)
        others_i = [nb for nb in mol.neighbors(i) if nb != j]
        others_j = [nb for nb in mol.neighbors(j) if nb != i]
        hi_i = k
        if len(others_i) == 2:
            o = [x for x in others_i if x != k][0]
            if _compare_branches(mol, i, o, k) > 0:
                hi_i = o
        hi_j = l
        if len(others_j) == 2:
            o = [x for x in others_j if x != l][0]
            if _compare_branches(mol, j, o, l) > 0:
                hi_j = o
        # flip side if the high-priority substituent differs from the
        # directional reference
        high_same_side = same_side
        if hi_i != k:
            high_same_side = not high_same_side
        if hi_j != l:
            high_same_side = not high_same_side
        b.stereo_atoms = (hi_i, hi_j)
        b.stereo = STEREOZ if high_same_side else STEREOE


def assign_stereochemistry(mol: Mol) -> None:
    """Full stereo perception (atoms + bonds)."""
    assign_atom_stereo(mol)
    assign_bond_stereo(mol)
