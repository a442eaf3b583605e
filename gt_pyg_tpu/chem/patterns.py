"""Pharmacophore perception.

Implements the reference's five SMARTS patterns
(``gt_pyg/data/atom_features.py:17-50``) as explicit graph predicates over
:class:`~gt_pyg_tpu.chem.mol.Mol` — no SMARTS engine needed, because the
patterns are fixed. Each function mirrors the *root-atom* matching
semantics of ``mol.GetSubstructMatches`` on a single-atom recursive SMARTS
(``get_pharmacophore_flags``, atom_features.py:184-233).

Flag layout per atom (atom_features.py:187-193):
[0] H-bond donor, [1] H-bond acceptor, [2] hydrophobic,
[3] positive ionizable, [4] negative ionizable.
"""

from __future__ import annotations

from .mol import Mol, DOUBLE


def _total_valence(mol: Mol, i: int) -> float:
    return mol.total_valence(i)


def _has_double_to(mol: Mol, i: int, zs: tuple, in_ring_ok: bool = True) -> bool:
    for b in mol.atom_bonds(i):
        if b.kekule_order == DOUBLE and mol.atoms[b.other(i)].atomic_num in zs:
            if in_ring_ok or not mol.bond_in_ring(b.idx):
                return True
    return False


def is_hbd(mol: Mol, i: int) -> bool:
    """H-bond donor: [$([N;!H0;v3]),$([N;!H0;+1;v4]),$([O,S;H1;+0]),$([n;H1;+0])]"""
    a = mol.atoms[i]
    z, h, chg, v = a.atomic_num, a.total_num_hs, a.formal_charge, _total_valence(mol, i)
    if z == 7 and h > 0 and abs(v - 3) < 0.26 and not a.is_aromatic:
        return True
    if z == 7 and h > 0 and chg == 1 and abs(v - 4) < 0.26:
        return True
    if z in (8, 16) and h == 1 and chg == 0:
        return True
    if z == 7 and a.is_aromatic and h == 1 and chg == 0:
        return True
    return False


def is_hba(mol: Mol, i: int) -> bool:
    """H-bond acceptor (RDKit Lipinski-style), atom_features.py:22-25."""
    a = mol.atoms[i]
    z, h, chg = a.atomic_num, a.total_num_hs, a.formal_charge
    v = _total_valence(mol, i)

    if z in (8, 16) and not a.is_aromatic:
        # $([O,S;H1;v2;!$(*-*=[O,N,P,S])]) — hydroxyl not adjacent to X=Y
        if h == 1 and abs(v - 2) < 0.26:
            acidic_context = False
            for b in mol.atom_bonds(i):
                if b.kekule_order != DOUBLE:
                    nb = b.other(i)
                    if _has_double_to(mol, nb, (7, 8, 15, 16)):
                        acidic_context = True
            if not acidic_context:
                return True
        # $([O,S;H0;v2]) — ether / carbonyl O / thioether
        if h == 0 and abs(v - 2) < 0.26:
            return True
        # $([O,S;-])
        if chg < 0:
            return True
    if z in (8, 16) and a.is_aromatic and chg == 0:
        # $([nH0,o,s;+0]) — aromatic o / s
        return True
    if z == 7 and not a.is_aromatic:
        # $([N;v3;!$(N-*=!@[O,N,P,S])]) — trivalent N, not amide-like
        if abs(v - 3) < 0.26:
            amide_like = False
            for b in mol.atom_bonds(i):
                if b.kekule_order != DOUBLE:
                    nb = b.other(i)
                    for b2 in mol.atom_bonds(nb):
                        if (b2.kekule_order == DOUBLE
                                and not mol.bond_in_ring(b2.idx)
                                and mol.atoms[b2.other(nb)].atomic_num in (7, 8, 15, 16)):
                            amide_like = True
            if not amide_like:
                return True
    if z == 7 and a.is_aromatic and h == 0 and chg == 0:
        # aromatic nH0
        return True
    return False


def is_hydrophobic(mol: Mol, i: int) -> bool:
    """[#6;+0;!$([#6]~[#7,#8,#9])] — neutral C not bonded to N/O/F."""
    a = mol.atoms[i]
    if a.atomic_num != 6 or a.formal_charge != 0:
        return False
    return not any(mol.atoms[nb].atomic_num in (7, 8, 9)
                   for nb in mol.neighbors(i))


def _is_carbonyl_c(mol: Mol, i: int) -> bool:
    return (mol.atoms[i].atomic_num == 6
            and _has_double_to(mol, i, (8,)))


def _aromatic_ring_walks(mol: Mol, i: int, size: int):
    """Yield aromatic rings (as ordered tuples starting at i) containing i."""
    atom_rings, bond_rings = mol.ring_info()
    for ar, br in zip(atom_rings, bond_rings):
        if len(ar) != size or i not in ar:
            continue
        if not all(mol.bonds[bi].is_aromatic for bi in br):
            continue
        k = ar.index(i)
        ring = list(ar[k:]) + list(ar[:k])
        yield tuple(ring)
        yield tuple([ring[0]] + list(reversed(ring[1:])))


def is_pos_ionizable(mol: Mol, i: int) -> bool:
    """Positive ionizable (atom_features.py:32-40): basic amines, protonated
    N, imidazole C4, guanidine N — excluding anilines and nitro."""
    a = mol.atoms[i]
    z, h, chg = a.atomic_num, a.total_num_hs, a.formal_charge

    def n_excluded_aniline() -> bool:
        # ;!$(N[a]) applies to the whole disjunction when the root is N
        return z == 7 and any(mol.atoms[nb].is_aromatic for nb in mol.neighbors(i))

    matched = False
    if z == 7 and chg == 0 and not a.is_aromatic:
        nbs = mol.neighbors(i)
        carbons = [nb for nb in nbs
                   if mol.atoms[nb].atomic_num == 6 and not _is_carbonyl_c(mol, nb)]
        # primary/secondary/tertiary amine with all-C non-carbonyl partners
        if h == 2 and len(nbs) == 1 and len(carbons) == 1:
            matched = True
        elif h == 1 and len(nbs) == 2 and len(carbons) == 2:
            matched = True
        elif h == 0 and len(nbs) == 3 and len(carbons) == 3:
            matched = True
    if z == 7 and chg > 0:
        # $([#7;+;!$([N+]-[O-])]) — protonated N, not nitro/N-oxide
        nitro = any(mol.atoms[nb].formal_charge < 0
                    and mol.atoms[nb].atomic_num == 8
                    and mol.get_bond(i, nb).kekule_order != DOUBLE
                    for nb in mol.neighbors(i))
        if not nitro:
            matched = True
    if z == 6 and a.is_aromatic:
        # $(c1c[nH]cn1): root c bonded (in ring) to n(H0) and c, where that
        # c neighbors [nH]; i.e. C4/C5-type carbon of imidazole
        for ring in _aromatic_ring_walks(mol, i, 5):
            A, B, C, D, E = ring
            if (mol.atoms[B].atomic_num == 6
                    and mol.atoms[C].atomic_num == 7 and mol.atoms[C].total_num_hs == 1
                    and mol.atoms[D].atomic_num == 6
                    and mol.atoms[E].atomic_num == 7 and mol.atoms[E].total_num_hs == 0):
                matched = True
    if z == 7 and not matched:
        # guanidine $(NC(=N)N): root N bonded to C(=N)N
        for nb in mol.neighbors(i):
            c = mol.atoms[nb]
            if c.atomic_num != 6:
                continue
            has_dn = _has_double_to(mol, nb, (7,))
            other_n = any(
                mol.atoms[x].atomic_num == 7 and x != i
                and mol.get_bond(nb, x).kekule_order != DOUBLE
                for x in mol.neighbors(nb)
            )
            if has_dn and other_n:
                matched = True
    if matched and n_excluded_aniline():
        return False
    return matched


def is_neg_ionizable(mol: Mol, i: int) -> bool:
    """Negative ionizable (atom_features.py:44-50): acids, phosphates,
    tetrazoles, sulfonamide NH, boronic acids. Root-atom semantics."""
    a = mol.atoms[i]
    z, h = a.atomic_num, a.total_num_hs

    def acidic_o(x: int) -> bool:
        o = mol.atoms[x]
        return o.atomic_num == 8 and (
            o.total_num_hs == 1 or (o.total_num_hs == 0 and o.formal_charge == -1)
        )

    if z in (6, 16):
        # $([C,S](=[O,S,P])-[O;H1,H0&-1])
        if _has_double_to(mol, i, (8, 15, 16)):
            for b in mol.atom_bonds(i):
                if b.kekule_order != DOUBLE and acidic_o(b.other(i)):
                    return True
    if z == 15:
        # phosphate/phosphonate
        if _has_double_to(mol, i, (8,)):
            single_nbs = [b.other(i) for b in mol.atom_bonds(i)
                          if b.kekule_order != DOUBLE]
            if any(acidic_o(x) for x in single_nbs):
                oc = sum(1 for x in single_nbs
                         if mol.atoms[x].atomic_num in (6, 8))
                if oc >= 3:
                    return True
    if z == 6 and a.is_aromatic:
        # tetrazole c: ring c1[nH]nnn1 or c1nn[nH]n1
        for ring in _aromatic_ring_walks(mol, i, 5):
            others = ring[1:]
            if all(mol.atoms[x].atomic_num == 7 for x in others):
                nh = [mol.atoms[x].total_num_hs for x in others]
                if sum(nh) == 1:
                    return True
    if z == 7 and h == 1:
        # sulfonamide NH: $([NH]S(=O)(=O))
        for nb in mol.neighbors(i):
            s = mol.atoms[nb]
            if s.atomic_num == 16:
                n_dox = sum(1 for b in mol.atom_bonds(nb)
                            if b.kekule_order == DOUBLE
                            and mol.atoms[b.other(nb)].atomic_num == 8)
                if n_dox >= 2:
                    return True
    if z == 5:
        # boronic acid B(OH)(OH)
        ohs = sum(1 for nb in mol.neighbors(i)
                  if mol.atoms[nb].atomic_num == 8
                  and mol.atoms[nb].total_num_hs == 1)
        if ohs >= 2:
            return True
    return False


def get_pharmacophore_flags(mol: Mol) -> dict[int, list[int]]:
    """Per-atom 5-bit pharmacophore flags (same layout as the reference)."""
    flags = {}
    for a in mol.atoms:
        i = a.idx
        flags[i] = [
            int(is_hbd(mol, i)),
            int(is_hba(mol, i)),
            int(is_hydrophobic(mol, i)),
            int(is_pos_ionizable(mol, i)),
            int(is_neg_ionizable(mol, i)),
        ]
    return flags
