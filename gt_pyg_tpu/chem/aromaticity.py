"""Kekulization and aromaticity perception.

Replaces RDKit's sanitization steps used implicitly by the reference's
``MolFromSmiles`` path (``gt_pyg/data/utils.py:96``): aromatic SMILES get a
valid Kekulé structure (perfect matching of ring double bonds), and
Kekulé-written rings are perceived aromatic under a Hückel 4n+2 model.
"""

from __future__ import annotations

from .mol import SINGLE, DOUBLE, TRIPLE, AROMATIC, SanitizeError


def _target_valence(atom) -> int:
    """Kekulé target valence for an aromatic atom (charge-adjusted)."""
    z = atom.atomic_num
    base = {5: 3, 6: 4, 7: 3, 8: 2, 15: 3, 16: 2, 33: 3, 34: 2, 52: 2}.get(z)
    if base is None:
        return 0
    chg = atom.formal_charge
    if z == 6:
        return base - abs(chg)
    if z in (7, 15, 33):
        return base + chg
    if z in (8, 16, 34, 52):
        return base + chg
    if z == 5:
        return base - chg
    return base


def kekulize(mol) -> None:
    """Assign kekule_order (SINGLE/DOUBLE) to AROMATIC bonds via perfect
    matching over atoms that require one ring double bond."""
    arom_bonds = [b for b in mol.bonds if b.order == AROMATIC]
    if not arom_bonds:
        for b in mol.bonds:
            b.kekule_order = b.order
        return

    arom_atoms = sorted({b.begin for b in arom_bonds} | {b.end for b in arom_bonds})

    # which aromatic atoms need a double bond in the ring system
    needs: dict[int, bool] = {}
    for i in arom_atoms:
        a = mol.atoms[i]
        tv = _target_valence(a)
        if tv <= 0:
            raise SanitizeError(
                f"cannot kekulize aromatic atom {a.symbol}{i}")
        # sigma/multiple connections outside the aromatic system + Hs
        used = a.num_explicit_hs
        ring_sigma = 0
        for b in mol.atom_bonds(i):
            if b.order == AROMATIC:
                ring_sigma += 1
            else:
                used += b.order_value
        conn = used + ring_sigma
        if not a.explicit_hs_set:
            # bare aromatic organic-subset atom: implicit H fills remaining
            # valence if the atom would otherwise be under target even with
            # a double bond. SMILES convention: aromatic C with 2 ring bonds
            # gets 1 H (benzene); aromatic N with 2 ring bonds gets none.
            z = a.atomic_num
            if z == 6 and ring_sigma == 2 and used == 0 and a.formal_charge == 0:
                a.num_explicit_hs = 1
                a.explicit_hs_set = True
                conn += 1
        avail = tv - conn
        needs[i] = avail >= 1

    # perfect matching on 'needs' atoms over aromatic bonds (backtracking;
    # aromatic systems are small and mostly planar rings, so this is fast)
    matched: dict[int, int] = {}

    need_list = [i for i in arom_atoms if needs[i]]
    if len(need_list) % 2 != 0:
        raise SanitizeError("odd number of kekulizable aromatic atoms")

    adj: dict[int, list] = {i: [] for i in need_list}
    for b in arom_bonds:
        if needs.get(b.begin) and needs.get(b.end):
            adj[b.begin].append(b)
            adj[b.end].append(b)

    order = sorted(need_list, key=lambda i: len(adj[i]))

    def backtrack(pos: int) -> bool:
        while pos < len(order) and order[pos] in matched:
            pos += 1
        if pos == len(order):
            return True
        i = order[pos]
        for b in adj[i]:
            j = b.other(i)
            if j in matched:
                continue
            matched[i] = b.idx
            matched[j] = b.idx
            if backtrack(pos + 1):
                return True
            del matched[i]
            del matched[j]
        return False

    if not backtrack(0):
        raise SanitizeError("kekulization failed: no perfect matching")

    chosen = set(matched.values())
    for b in arom_bonds:
        b.kekule_order = DOUBLE if b.idx in chosen else SINGLE
        b.is_aromatic = True
    for i in arom_atoms:
        mol.atoms[i].is_aromatic = True
    for b in mol.bonds:
        if b.order != AROMATIC:
            b.kekule_order = b.order


def _pi_contribution(mol, i: int, ring: set[int]) -> int | None:
    """Electrons atom i contributes to the ring pi system; None = blocks
    aromaticity."""
    a = mol.atoms[i]
    z = a.atomic_num
    if z not in (5, 6, 7, 8, 15, 16, 33, 34, 52):
        return None
    sigma = mol.degree(i) + a.total_num_hs
    if sigma > 3:
        return None
    # an already-aromatic in-ring bond counts as pi participation — using
    # only the kekulé order would make perception depend on the arbitrary
    # kekulé choice of a fused aromatic neighbor ring
    in_ring_double = any(
        (b.kekule_order == DOUBLE or b.is_aromatic) and b.other(i) in ring
        for b in mol.atom_bonds(i)
    )
    exo_double = any(
        b.kekule_order in (DOUBLE, TRIPLE) and b.other(i) not in ring
        for b in mol.atom_bonds(i)
    )
    if in_ring_double:
        return 1
    if exo_double:
        # sp2 but pi electrons point out of the ring (e.g. quinone C=O):
        # contributes 0 only for neutral C with electronegative partner;
        # keep RDKit default: carbon with exocyclic double bond contributes 0
        return 0 if z == 6 else 0
    # no double bond: must bring a lone pair (heteroatom / carbanion)
    if z == 6:
        if a.formal_charge == -1:
            return 2
        if a.formal_charge == 1:
            return 0
        return None
    if mol.lone_pairs(i) >= 1:
        return 2
    return None


def perceive_aromaticity(mol) -> None:
    """Mark Kekulé-written rings aromatic when they satisfy Hückel 4n+2.

    Handles single SSSR rings and one round of fused-pair envelopes
    (covers naphthalene-like systems written in Kekulé form).
    """
    atom_rings, bond_rings = mol.ring_info()

    ring_sets = [set(r) for r in atom_rings]

    def try_ring(atoms: set[int], bonds: list[int]) -> bool:
        total = 0
        for i in atoms:
            c = _pi_contribution(mol, i, atoms)
            if c is None:
                return False
            total += c
        if total % 4 != 2:
            return False
        for bi in bonds:
            b = mol.bonds[bi]
            b.is_aromatic = True
        for i in atoms:
            mol.atoms[i].is_aromatic = True
        return True

    changed = True
    passes = 0
    while changed and passes < 4:
        changed = False
        passes += 1
        for r_atoms, r_bonds in zip(atom_rings, bond_rings):
            sa = set(r_atoms)
            if all(mol.bonds[bi].is_aromatic for bi in r_bonds):
                continue
            if try_ring(sa, list(r_bonds)):
                changed = True

    # fused pair envelopes (azulene-style): union of two rings sharing an edge
    for ai in range(len(ring_sets)):
        for aj in range(ai + 1, len(ring_sets)):
            shared = ring_sets[ai] & ring_sets[aj]
            if len(shared) != 2:
                continue
            union_atoms = ring_sets[ai] | ring_sets[aj]
            if all(mol.atoms[i].is_aromatic for i in union_atoms):
                continue
            union_bonds = [
                b.idx for b in mol.bonds
                if b.begin in union_atoms and b.end in union_atoms
                and not (b.begin in shared and b.end in shared)
            ]
            perim = set()
            for bi in union_bonds:
                perim.add(mol.bonds[bi].begin)
                perim.add(mol.bonds[bi].end)
            try_ring(perim, union_bonds)
