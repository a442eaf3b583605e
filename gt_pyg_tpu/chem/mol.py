"""Molecular graph data structures for the pure-Python chemistry kernel.

This kernel replaces the subset of RDKit used by the reference featurizer
(``gt_pyg/data/utils.py``, ``atom_features.py``, ``bond_features.py``):
molecule graphs with aromaticity, kekulization, implicit hydrogens,
hybridization, conjugation, and ring perception.

The object model is intentionally small and explicit; all perception steps
run in :meth:`Mol.sanitize`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import periodic
from .periodic import ATOMIC_NUM, ATOMIC_MASS, OUTER_ELECS

# Bond order encodings
SINGLE, DOUBLE, TRIPLE, AROMATIC = "SINGLE", "DOUBLE", "TRIPLE", "AROMATIC"
_ORDER_VALUE = {SINGLE: 1.0, DOUBLE: 2.0, TRIPLE: 3.0, AROMATIC: 1.5}

# Chirality tags (same vocabulary as the reference one-hot,
# atom_features.py:397-399)
CHI_UNSPECIFIED = "CHI_UNSPECIFIED"
CHI_CW = "CHI_TETRAHEDRAL_CW"
CHI_CCW = "CHI_TETRAHEDRAL_CCW"
CHI_OTHER = "CHI_OTHER"

# Bond stereo vocabulary (bond_features.py:56-60)
STEREONONE = "STEREONONE"
STEREOZ = "STEREOZ"
STEREOE = "STEREOE"
STEREOCIS = "STEREOCIS"
STEREOTRANS = "STEREOTRANS"
STEREOANY = "STEREOANY"

# Directional single-bond markers from SMILES '/' and '\'
DIR_NONE, DIR_UP, DIR_DOWN = "NONE", "UP", "DOWN"


class SanitizeError(ValueError):
    """Raised when a molecule fails valence/aromaticity perception."""


@dataclass
class Atom:
    symbol: str
    idx: int = -1
    formal_charge: int = 0
    is_aromatic: bool = False
    isotope: int = 0
    chiral_tag: str = CHI_UNSPECIFIED
    # H counts: bracket atoms fix their H count explicitly; organic-subset
    # atoms get implicit Hs from the default-valence model.
    num_explicit_hs: int = 0
    explicit_hs_set: bool = False
    num_implicit_hs: int = 0
    # perception results
    hybridization: str = "SP3"
    # neighbor atom indices in parse order (used for stereo perception);
    # None entries mark the implicit-H / lone-pair position.
    _stereo_neighbors: list = field(default_factory=list)
    props: dict = field(default_factory=dict)

    @property
    def atomic_num(self) -> int:
        return ATOMIC_NUM.get(self.symbol, 0)

    @property
    def mass(self) -> float:
        return ATOMIC_MASS.get(self.atomic_num, 0.0)

    @property
    def total_num_hs(self) -> int:
        return self.num_explicit_hs + self.num_implicit_hs


@dataclass
class Bond:
    begin: int
    end: int
    order: str = SINGLE
    idx: int = -1
    is_aromatic: bool = False
    # kekulé order resolved during sanitization (equals `order` for
    # non-aromatic bonds)
    kekule_order: str = SINGLE
    stereo: str = STEREONONE
    direction: str = DIR_NONE  # '/' or '\' marker as written in SMILES
    is_conjugated: bool = False
    # stereo reference atoms (neighbors of begin/end defining E/Z), set
    # during stereo perception
    stereo_atoms: tuple = ()

    @property
    def order_value(self) -> float:
        return _ORDER_VALUE[self.order]

    @property
    def kekule_value(self) -> float:
        return _ORDER_VALUE[self.kekule_order]

    def other(self, idx: int) -> int:
        return self.end if idx == self.begin else self.begin


class Mol:
    """A molecular graph with RDKit-equivalent perception results."""

    def __init__(self) -> None:
        self.atoms: list[Atom] = []
        self.bonds: list[Bond] = []
        self._adj: list[list[int]] = []  # atom idx -> list of bond indices
        self._ring_info: tuple | None = None  # (atom_rings, bond_rings)
        self._sanitized = False

    # ---- construction ----
    def add_atom(self, atom: Atom) -> int:
        atom.idx = len(self.atoms)
        self.atoms.append(atom)
        self._adj.append([])
        return atom.idx

    def add_bond(self, begin: int, end: int, order: str = SINGLE,
                 is_aromatic: bool = False, direction: str = DIR_NONE) -> Bond:
        if begin == end:
            raise SanitizeError(f"self-bond on atom {begin}")
        if self.get_bond(begin, end) is not None:
            raise SanitizeError(f"duplicate bond {begin}-{end}")
        b = Bond(begin=begin, end=end, order=order, is_aromatic=is_aromatic,
                 direction=direction)
        b.idx = len(self.bonds)
        b.kekule_order = order if order != AROMATIC else SINGLE
        self.bonds.append(b)
        self._adj[begin].append(b.idx)
        self._adj[end].append(b.idx)
        return b

    # ---- queries ----
    @property
    def num_atoms(self) -> int:
        return len(self.atoms)

    @property
    def num_bonds(self) -> int:
        return len(self.bonds)

    def get_bond(self, i: int, j: int) -> Bond | None:
        for bi in self._adj[i]:
            b = self.bonds[bi]
            if b.other(i) == j:
                return b
        return None

    def neighbors(self, i: int) -> list[int]:
        return [self.bonds[bi].other(i) for bi in self._adj[i]]

    def atom_bonds(self, i: int) -> list[Bond]:
        return [self.bonds[bi] for bi in self._adj[i]]

    def degree(self, i: int) -> int:
        """Heavy-atom degree (explicit connections in the graph)."""
        return len(self._adj[i])

    def explicit_valence(self, i: int, kekule: bool = True) -> float:
        return sum(
            (b.kekule_value if kekule else b.order_value)
            for b in self.atom_bonds(i)
        ) + self.atoms[i].num_explicit_hs

    def total_valence(self, i: int) -> float:
        return self.explicit_valence(i) + self.atoms[i].num_implicit_hs

    def adjacency(self):
        import numpy as np

        n = self.num_atoms
        adj = np.zeros((n, n), dtype=np.int64)
        for b in self.bonds:
            adj[b.begin, b.end] = 1
            adj[b.end, b.begin] = 1
        return adj

    # ---- ring info ----
    def ring_info(self) -> tuple:
        """(atom_rings, bond_rings) from SSSR — lazy, computed in sanitize."""
        if self._ring_info is None:
            from .rings import sssr

            self._ring_info = sssr(self)
        return self._ring_info

    def atom_in_ring(self, i: int) -> bool:
        return any(i in ring for ring in self.ring_info()[0])

    def bond_in_ring(self, bi: int) -> bool:
        return any(bi in ring for ring in self.ring_info()[1])

    def fragments(self) -> list[list[int]]:
        """Connected components as lists of atom indices."""
        seen = [False] * self.num_atoms
        comps = []
        for s in range(self.num_atoms):
            if seen[s]:
                continue
            comp, stack = [], [s]
            seen[s] = True
            while stack:
                a = stack.pop()
                comp.append(a)
                for nb in self.neighbors(a):
                    if not seen[nb]:
                        seen[nb] = True
                        stack.append(nb)
            comps.append(sorted(comp))
        return comps

    def extract_fragment(self, atom_ids: list[int]) -> "Mol":
        """Return a new Mol containing only `atom_ids` (order preserved)."""
        remap = {a: i for i, a in enumerate(atom_ids)}
        m = Mol()
        for a in atom_ids:
            src = self.atoms[a]
            na = Atom(
                symbol=src.symbol, formal_charge=src.formal_charge,
                is_aromatic=src.is_aromatic, isotope=src.isotope,
                chiral_tag=src.chiral_tag,
                num_explicit_hs=src.num_explicit_hs,
                explicit_hs_set=src.explicit_hs_set,
            )
            na._stereo_neighbors = [
                (remap.get(x) if isinstance(x, int) else x)
                for x in src._stereo_neighbors
            ]
            m.add_atom(na)
        for b in self.bonds:
            if b.begin in remap and b.end in remap:
                nb = m.add_bond(remap[b.begin], remap[b.end], b.order,
                                b.is_aromatic, b.direction)
                nb.kekule_order = b.kekule_order
        return m

    # ---- perception pipeline ----
    def sanitize(self) -> "Mol":
        """Run full perception: rings, kekulization, aromaticity, implicit
        Hs, conjugation, hybridization. Raises SanitizeError on failure."""
        from .rings import sssr
        from .aromaticity import kekulize, perceive_aromaticity

        self._ring_info = sssr(self)
        # 1. Kekulize aromatic bonds (resolves kekule_order), validating
        #    aromatic ring systems written in lowercase notation.
        kekulize(self)
        # 2. Implicit hydrogens from the default-valence model.
        self._assign_implicit_hs()
        # 3. Aromaticity perception for Kekulé-written rings.
        perceive_aromaticity(self)
        # Implicit Hs may change if aromatic flags changed valence model:
        # (kekulé orders are canonical, so no re-assignment needed)
        # 4. Conjugation + hybridization.
        self._assign_hybridization()
        self._assign_conjugation()
        self._sanitized = True
        return self

    def _assign_implicit_hs(self) -> None:
        for a in self.atoms:
            if a.explicit_hs_set:
                a.num_implicit_hs = 0
                continue
            ev = self.explicit_valence(a.idx)
            z = a.atomic_num
            # Formal charge shifts the effective default valence for the
            # common organic elements (RDKit's model): e.g. N+ -> 4, O- -> 1.
            dv = periodic.default_valence_for(z, 0) or 0
            chg = a.formal_charge
            if chg != 0:
                group = periodic.get_group_number(z)
                if group in (14,):  # C: +/- both reduce available valence
                    dv = dv - abs(chg)
                elif group in (15, 16, 17):  # N,O,halogens: + raises, - lowers
                    dv = dv + chg
                elif group == 13:  # B: B- -> 4
                    dv = dv - chg
                else:
                    dv = dv
                target = dv
                if target < 0:
                    target = 0
                if ev > target + 1e-6:
                    # try the hypervalent series (e.g. S+, P+)
                    tv = periodic.default_valence_for(z, ev - chg)
                    if tv is not None and chg > 0:
                        target = tv + chg
                    else:
                        target = ev  # no implicit Hs; hypervalent as-written
                a.num_implicit_hs = max(0, int(round(target - ev)))
            else:
                tv = periodic.default_valence_for(z, ev)
                if tv is None:
                    a.num_implicit_hs = 0
                else:
                    a.num_implicit_hs = max(0, int(round(tv - ev)))

    def lone_pairs(self, i: int) -> int:
        a = self.atoms[i]
        outer = OUTER_ELECS.get(a.atomic_num)
        if outer is None:
            return 0
        used = self.total_valence(i)
        lp = (outer - a.formal_charge - used) / 2.0
        return max(0, int(lp))

    def _assign_hybridization(self) -> None:
        """RDKit-equivalent hybridization from steric number.

        steric = sigma partners (heavy neighbors + total Hs) + lone pairs;
        aromatic atoms are at least SP2 (reference one-hot vocabulary at
        atom_features.py:369-371).
        """
        for a in self.atoms:
            i = a.idx
            z = a.atomic_num
            if z <= 1:
                a.hybridization = "S"
                continue
            sigma = self.degree(i) + a.total_num_hs
            lp = self.lone_pairs(i)
            steric = sigma + lp
            # multiple bonds do not add orbitals; pi electrons live in p
            n_multiple = sum(
                1 for b in self.atom_bonds(i)
                if b.kekule_order in (DOUBLE, TRIPLE)
            )
            has_triple = any(b.kekule_order == TRIPLE for b in self.atom_bonds(i))
            two_doubles = sum(1 for b in self.atom_bonds(i)
                              if b.kekule_order == DOUBLE) >= 2
            if a.is_aromatic:
                a.hybridization = "SP2"
                continue
            if has_triple or two_doubles:
                # allene centre / alkyne: SP (if steric allows)
                steric = min(steric, 2) if sigma <= 2 else steric
            elif n_multiple >= 1:
                steric = min(steric, max(sigma, 3))
            if steric <= 1:
                a.hybridization = "S"
            elif steric == 2:
                a.hybridization = "SP"
            elif steric == 3:
                a.hybridization = "SP2"
            elif steric == 4:
                a.hybridization = "SP3"
            elif steric == 5:
                a.hybridization = "SP3D"
            elif steric == 6:
                a.hybridization = "SP3D2"
            else:
                a.hybridization = "OTHER"

    def _assign_conjugation(self) -> None:
        """RDKit-style conjugation: a bond is conjugated when both of its
        atoms participate in a pi system (multiple bond, aromatic ring, or a
        lone pair on an sp2-adjacent heteroatom)."""

        def has_pi(i: int) -> bool:
            if self.atoms[i].is_aromatic:
                return True
            return any(b.kekule_order in (DOUBLE, TRIPLE)
                       for b in self.atom_bonds(i))

        def pi_candidate(i: int) -> bool:
            if has_pi(i):
                return True
            # heteroatom lone pair adjacent to a pi system (amide N, ester O)
            a = self.atoms[i]
            if self.lone_pairs(i) > 0 and a.atomic_num in (7, 8, 16, 15):
                return True
            if a.formal_charge < 0:
                return True
            return False

        for b in self.bonds:
            if b.is_aromatic:
                b.is_conjugated = True
                continue
            i, j = b.begin, b.end
            if b.order in (DOUBLE, TRIPLE):
                # double bond conjugated when either end continues the pi
                # system through another multiple bond / lone pair donor
                cont = False
                for end in (i, j):
                    for nb in self.neighbors(end):
                        if nb in (i, j):
                            continue
                        if pi_candidate(nb):
                            cont = True
                b.is_conjugated = cont
            else:
                b.is_conjugated = (has_pi(i) or pi_candidate(i)) and \
                                  (has_pi(j) or pi_candidate(j)) and \
                                  (has_pi(i) or has_pi(j))

    # ---- convenience ----
    def heavy_atom_count(self) -> int:
        return sum(1 for a in self.atoms if a.atomic_num > 1)

    def __repr__(self) -> str:
        return f"Mol(atoms={self.num_atoms}, bonds={self.num_bonds})"
