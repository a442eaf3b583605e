"""Canonical SMILES output.

Replaces ``Chem.MolToSmiles(mol, canonical=True, isomericSmiles=...)``
(reference ``gt_pyg/data/utils.py:181``). Canonical atom ranking uses
Morgan-style iterative refinement over atom invariants with deterministic
tie-breaking; output preserves aromatic lowercase notation, charges,
tetrahedral tags (parity-corrected for the output neighbor order) and
double-bond stereo via directional bonds.

The canonical form is *internally* canonical (same molecule → same string);
it does not aim to reproduce RDKit's exact string choices.
"""

from __future__ import annotations

from .mol import (
    Mol, SINGLE, DOUBLE, TRIPLE, AROMATIC,
    CHI_CW, CHI_CCW, STEREOZ, STEREOE,
)
from .periodic import ORGANIC_SUBSET

_BOND_TOKEN = {SINGLE: "", DOUBLE: "=", TRIPLE: "#", AROMATIC: ""}


def canonical_ranks(mol: Mol) -> list[int]:
    """Morgan-style canonical ranks (0 = first emitted)."""
    n = mol.num_atoms
    invariants = []
    for a in mol.atoms:
        invariants.append((
            mol.degree(a.idx), a.atomic_num, a.formal_charge,
            a.total_num_hs, int(a.is_aromatic), int(mol.atom_in_ring(a.idx)),
            a.isotope,
        ))
    # initial ranks from sorted invariants
    order = sorted(range(n), key=lambda i: invariants[i])
    ranks = [0] * n
    for pos, i in enumerate(order):
        ranks[i] = pos if pos == 0 or invariants[order[pos]] != invariants[order[pos - 1]] \
            else ranks[order[pos - 1]]

    def refine(ranks: list[int]) -> list[int]:
        for _ in range(2 * n + 2):
            keys = []
            for i in range(n):
                nbr = sorted(
                    (ranks[b.other(i)],
                     round((1.5 if b.is_aromatic else b.kekule_value) * 2))
                    for b in mol.atom_bonds(i)
                )
                keys.append((ranks[i], tuple(nbr)))
            order = sorted(range(n), key=lambda i: keys[i])
            new = [0] * n
            for pos, i in enumerate(order):
                new[i] = new[order[pos - 1]] if pos and keys[i] == keys[order[pos - 1]] else pos
            if new == ranks:
                return ranks
            ranks = new
        return ranks

    ranks = refine(ranks)
    # greedy tie-breaking: promote the lowest-index atom in the first tied
    # class, then re-refine. NOTE: input-order dependent when tied atoms
    # are not automorphic — write_smiles resolves this by branching over
    # candidates and taking the minimal string (see _canonical_string).
    while len(set(ranks)) < n:
        seen: dict[int, list[int]] = {}
        for i in range(n):
            seen.setdefault(ranks[i], []).append(i)
        tied = min((r for r, idxs in seen.items() if len(idxs) > 1))
        chosen = min(seen[tied])
        ranks = [r * 2 for r in ranks]
        ranks[chosen] -= 1
        ranks = refine(ranks)
    return ranks


def _refine_fn(mol):
    """Return the rank-refinement closure for `mol` (shared by the
    greedy and branching canonicalization paths)."""
    n = mol.num_atoms

    def refine(ranks: list[int]) -> list[int]:
        for _ in range(2 * n + 2):
            keys = []
            for i in range(n):
                nbr = sorted(
                    (ranks[b.other(i)],
                     round((1.5 if b.is_aromatic else b.kekule_value) * 2))
                    for b in mol.atom_bonds(i)
                )
                keys.append((ranks[i], tuple(nbr)))
            order = sorted(range(n), key=lambda i: keys[i])
            new = [0] * n
            for pos, i in enumerate(order):
                new[i] = (new[order[pos - 1]]
                          if pos and keys[i] == keys[order[pos - 1]]
                          else pos)
            if new == ranks:
                return ranks
            ranks = new
        return ranks

    return refine


def _initial_ranks(mol) -> list[int]:
    n = mol.num_atoms
    invariants = []
    for a in mol.atoms:
        invariants.append((
            mol.degree(a.idx), a.atomic_num, a.formal_charge,
            a.total_num_hs, int(a.is_aromatic),
            int(mol.atom_in_ring(a.idx)), a.isotope,
        ))
    order = sorted(range(n), key=lambda i: invariants[i])
    ranks = [0] * n
    for pos, i in enumerate(order):
        ranks[i] = (ranks[order[pos - 1]]
                    if pos and invariants[i] == invariants[order[pos - 1]]
                    else pos)
    return ranks


def _atom_token(mol: Mol, a, chiral_out: str | None) -> str:
    sym = a.symbol
    arom = a.is_aromatic and sym.lower() in ("b", "c", "n", "o", "p", "s", "se", "as", "te")
    out_sym = sym.lower() if arom else sym

    needs_bracket = (
        sym not in ORGANIC_SUBSET
        or a.formal_charge != 0
        or a.isotope != 0
        or chiral_out is not None
    )
    if not needs_bracket:
        # bracket needed if H-count differs from what the parser would infer
        probe = Mol()
        from .mol import Atom

        pa = Atom(symbol=sym, is_aromatic=a.is_aromatic)
        probe.add_atom(pa)
        # compare against organic-subset implicit model on the real graph:
        ev = mol.explicit_valence(a.idx) - a.num_explicit_hs  # bonds only
        from .periodic import default_valence_for

        dv = default_valence_for(a.atomic_num, ev)
        implied = max(0, int(round(dv - ev))) if dv is not None else 0
        if a.is_aromatic and sym == "N" and a.total_num_hs > 0:
            needs_bracket = True  # pyrrole-type [nH]
        elif implied != a.total_num_hs:
            needs_bracket = True

    if not needs_bracket:
        return out_sym

    parts = ["["]
    if a.isotope:
        parts.append(str(a.isotope))
    parts.append(out_sym)
    if chiral_out:
        parts.append(chiral_out)
    h = a.total_num_hs
    if h == 1:
        parts.append("H")
    elif h > 1:
        parts.append(f"H{h}")
    chg = a.formal_charge
    if chg == 1:
        parts.append("+")
    elif chg == -1:
        parts.append("-")
    elif chg > 1:
        parts.append(f"+{chg}")
    elif chg < -1:
        parts.append(f"-{-chg}")
    parts.append("]")
    return "".join(parts)


def _perm_parity(a: list, b: list) -> int:
    a = list(a)
    parity = 0
    for i in range(len(a)):
        if a[i] != b[i]:
            j = a.index(b[i], i + 1)
            a[i], a[j] = a[j], a[i]
            parity ^= 1
    return parity


def write_smiles(mol: Mol, isomeric: bool = True, canonical: bool = True) -> str:
    """Serialize a sanitized Mol to SMILES.

    Canonical mode resolves refinement ties by branching over candidate
    promotions and returning the lexicographically smallest string (with a
    work budget; beyond it the remaining ties resolve greedily). This
    makes the output invariant to input atom order — the property
    ``canonicalize_smiles`` (reference data/utils.py:146-182) relies on.
    """
    n = mol.num_atoms
    if n == 0:
        return ""
    if not canonical:
        return _emit_with_ranks(mol, list(range(n)), isomeric)

    refine = _refine_fn(mol)
    base = refine(_initial_ranks(mol))
    budget = [4000]
    memo: dict = {}

    def tied_classes(ranks):
        seen: dict[int, list[int]] = {}
        for i, r in enumerate(ranks):
            seen.setdefault(r, []).append(i)
        return sorted((r, idxs) for r, idxs in seen.items()
                      if len(idxs) > 1)

    def promote(ranks, c):
        nr = [x * 2 for x in ranks]
        nr[c] -= 1
        return refine(nr)

    def resolve_greedy(ranks):
        while True:
            t = tied_classes(ranks)
            if not t:
                return _emit_with_ranks(mol, ranks, isomeric)
            ranks = promote(ranks, min(t[0][1]))

    def resolve(ranks):
        key = tuple(ranks)
        if key in memo:
            return memo[key]
        t = tied_classes(ranks)
        if not t:
            s = _emit_with_ranks(mol, ranks, isomeric)
            memo[key] = s
            return s
        best = None
        for c in sorted(t[0][1]):
            if budget[0] > 0:
                budget[0] -= 1
                s = resolve(promote(ranks, c))
            else:
                s = resolve_greedy(promote(ranks, c))
            if best is None or s < best:
                best = s
        memo[key] = best
        return best

    return resolve(base)


def _emit_with_ranks(mol: Mol, ranks: list, isomeric: bool) -> str:
    n = mol.num_atoms
    visited = [False] * n
    ring_bond_digit: dict[int, int] = {}   # bond idx -> digit
    digit_free = list(range(1, 100))
    out_neighbor_order: dict[int, list] = {i: [] for i in range(n)}
    tree_bond: set[int] = set()
    ring_bonds: dict[int, list[int]] = {i: [] for i in range(n)}  # atom -> bond idxs

    # First pass: DFS to establish spanning tree, ring closures, and the
    # output neighbor order per atom (parent, [H], closures, children).
    order_children: dict[int, list[tuple[int, int]]] = {i: [] for i in range(n)}
    parents: dict[int, int | None] = {}
    roots = []

    def dfs(start: int) -> None:
        stack = [(start, None)]
        parents[start] = None
        visited[start] = True
        while stack:
            u, parent = stack.pop()
            nbs = sorted(
                (b.other(u), b.idx) for b in mol.atom_bonds(u)
            )
            nbs.sort(key=lambda t: ranks[t[0]])
            for v, bi in nbs:
                if v == parent and bi in tree_bond:
                    continue
                if not visited[v]:
                    visited[v] = True
                    parents[v] = u
                    tree_bond.add(bi)
                    order_children[u].append((v, bi))
                    stack.append((v, u))
                else:
                    if bi not in tree_bond and bi not in ring_bond_digit:
                        ring_bond_digit[bi] = digit_free.pop(0)
                        ring_bonds[u].append(bi)
                        ring_bonds[v].append(bi)

    for start in sorted(range(n), key=lambda i: ranks[i]):
        if not visited[start]:
            roots.append(start)
            dfs(start)

    # iterative DFS pushed children in reverse emission order; fix ordering
    for u in range(n):
        order_children[u].sort(key=lambda t: ranks[t[0]])

    # output neighbor order for stereo parity
    for u in range(n):
        lst: list = []
        if parents.get(u) is not None:
            lst.append(parents[u])
        if mol.atoms[u].total_num_hs >= 1:
            lst.append("H")
        for bi in ring_bonds[u]:
            lst.append(mol.bonds[bi].other(u))
        for v, _ in order_children[u]:
            lst.append(v)
        out_neighbor_order[u] = lst

    # directional bond assignment for E/Z
    bond_dir_sign: dict[int, int] = {}  # bond idx -> sign of substituent
    if isomeric:
        for b in mol.bonds:
            if b.stereo in (STEREOZ, STEREOE) and len(b.stereo_atoms) == 2:
                k, l = b.stereo_atoms
                bk = mol.get_bond(k, b.begin) or mol.get_bond(k, b.end)
                bl = mol.get_bond(l, b.begin) or mol.get_bond(l, b.end)
                if bk is None or bl is None:
                    continue
                sk = bond_dir_sign.get(bk.idx)
                if sk is None:
                    sk = 1
                    bond_dir_sign[bk.idx] = sk
                want_same = b.stereo == STEREOZ
                sl = sk if want_same else -sk
                bond_dir_sign.setdefault(bl.idx, sl)

    def bond_token(b, u: int, v: int) -> str:
        """Token for bond b written while moving u -> v."""
        au, av = mol.atoms[u], mol.atoms[v]
        if isomeric and b.idx in bond_dir_sign and b.kekule_order == SINGLE:
            # sign refers to the substituent (non-double-bond) atom being
            # up/down relative to its alkene carbon
            sub_is_v = any(
                v in bb.stereo_atoms for bb in mol.bonds
                if bb.stereo in (STEREOZ, STEREOE)
            )
            s = bond_dir_sign[b.idx]
            if not sub_is_v:
                s = -s
            return "/" if s > 0 else "\\"
        if b.is_aromatic and au.is_aromatic and av.is_aromatic:
            return ""
        if b.order == SINGLE and au.is_aromatic and av.is_aromatic:
            return "-"
        if b.is_aromatic:
            return _BOND_TOKEN[b.kekule_order]
        return _BOND_TOKEN[b.order]

    def chiral_token(u: int) -> str | None:
        if not isomeric:
            return None
        a = mol.atoms[u]
        if a.chiral_tag not in (CHI_CW, CHI_CCW):
            return None
        orig = [x for x in a._stereo_neighbors if x is not None]
        if len(orig) == 3 and a.total_num_hs == 1 and "H" not in orig:
            orig = [orig[0], "H", orig[1], orig[2]]
        new = out_neighbor_order[u]
        if len(orig) != 4 or len(new) != 4 or set(map(str, orig)) != set(map(str, new)):
            return "@" if a.chiral_tag == CHI_CCW else "@@"
        parity = _perm_parity([str(x) for x in orig], [str(x) for x in new])
        tag = a.chiral_tag
        if parity:
            tag = CHI_CW if tag == CHI_CCW else CHI_CCW
        return "@" if tag == CHI_CCW else "@@"

    def emit(u: int) -> str:
        parts = [_atom_token(mol, mol.atoms[u], chiral_token(u))]
        for bi in ring_bonds[u]:
            d = ring_bond_digit[bi]
            b = mol.bonds[bi]
            tok = bond_token(b, u, b.other(u))
            parts.append(tok + (str(d) if d < 10 else f"%{d}"))
        children = order_children[u]
        for k, (v, bi) in enumerate(children):
            seg = bond_token(mol.bonds[bi], u, v) + emit(v)
            if k < len(children) - 1:
                parts.append("(" + seg + ")")
            else:
                parts.append(seg)
        return "".join(parts)

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 4 * n + 100))
    try:
        return ".".join(emit(r) for r in roots)
    finally:
        sys.setrecursionlimit(old_limit)
