"""Ring perception (SSSR) for the pure-Python chemistry kernel.

Produces the same (atom_rings, bond_rings) structure the reference reads
from RDKit's ``mol.GetRingInfo()`` (``gt_pyg/data/utils.py:198-200``):
ring-by-ring aligned tuples of atom indices and bond indices.

Algorithm: candidate smallest rings through every ring bond (BFS shortest
cycle), then a greedy GF(2)-independent selection of ``m - n + c`` rings
ordered by size (classic SSSR).
"""

from __future__ import annotations

from collections import deque


def _shortest_cycle_through(mol, bond) -> list[int] | None:
    """Shortest cycle containing `bond`, as an ordered atom list."""
    src, dst = bond.begin, bond.end
    # BFS from src to dst avoiding the direct bond
    prev = {src: None}
    q = deque([src])
    while q:
        a = q.popleft()
        if a == dst:
            break
        for b in mol.atom_bonds(a):
            if b.idx == bond.idx:
                continue
            nb = b.other(a)
            if nb not in prev:
                prev[nb] = a
                q.append(nb)
    if dst not in prev:
        return None
    path = []
    cur = dst
    while cur is not None:
        path.append(cur)
        cur = prev[cur]
    return path  # dst ... src; closing bond dst-src is `bond`


def _ring_bonds(mol, atom_ring: list[int]) -> list[int]:
    n = len(atom_ring)
    out = []
    for k in range(n):
        b = mol.get_bond(atom_ring[k], atom_ring[(k + 1) % n])
        if b is None:
            return []
        out.append(b.idx)
    return out


def sssr(mol) -> tuple[list[tuple[int, ...]], list[tuple[int, ...]]]:
    """Smallest set of smallest rings.

    Returns:
        (atom_rings, bond_rings): aligned lists of tuples, one per ring,
        atoms in traversal order.
    """
    n, m = mol.num_atoms, mol.num_bonds
    n_comp = len(mol.fragments())
    target = m - n + n_comp
    if target <= 0:
        return [], []

    # candidate rings: shortest cycle through each cyclic bond
    candidates: dict[frozenset, list[int]] = {}
    for bond in mol.bonds:
        cyc = _shortest_cycle_through(mol, bond)
        if cyc is None:
            continue
        key = frozenset(cyc)
        if key not in candidates or len(cyc) < len(candidates[key]):
            candidates[key] = cyc

    ordered = sorted(candidates.values(), key=len)

    # greedy GF(2)-independent selection over bond-incidence vectors
    atom_rings: list[tuple[int, ...]] = []
    bond_rings: list[tuple[int, ...]] = []
    pivots: dict[int, int] = {}  # highest-bit -> reduced basis vector
    for ring in ordered:
        if len(atom_rings) >= target:
            break
        bonds = _ring_bonds(mol, ring)
        if not bonds:
            continue
        vec = 0
        for bi in bonds:
            vec |= 1 << bi
        # xor-basis reduction by pivot bit
        x = vec
        while x:
            p = x.bit_length() - 1
            if p in pivots:
                x ^= pivots[p]
            else:
                pivots[p] = x
                atom_rings.append(tuple(ring))
                bond_rings.append(tuple(bonds))
                break

    return atom_rings, bond_rings


def ring_membership_counts(mol) -> tuple[dict[int, int], dict[int, int]]:
    """Number of SSSR rings each atom/bond belongs to."""
    atom_rings, bond_rings = mol.ring_info()
    ac: dict[int, int] = {}
    bc: dict[int, int] = {}
    for ar in atom_rings:
        for a in ar:
            ac[a] = ac.get(a, 0) + 1
    for br in bond_rings:
        for b in br:
            bc[b] = bc.get(b, 0) + 1
    return ac, bc
