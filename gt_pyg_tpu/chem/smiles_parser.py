"""SMILES parser producing :class:`~gt_pyg_tpu.chem.mol.Mol` graphs.

Replaces the reference's ``Chem.MolFromSmiles`` (used at
``gt_pyg/data/utils.py:96``). Supports the full organic subset, bracket
atoms (isotope, chirality, H-count, charge), branches, ring closures
(including ``%nn``), directional bonds, aromatic lowercase notation, and
dot-separated fragments.

The parser records per-atom neighbor order (including the implicit-H slot)
so tetrahedral parity from ``@``/``@@`` can be converted to CIP labels by
:mod:`gt_pyg_tpu.chem.stereo`.
"""

from __future__ import annotations

from .mol import (
    Mol, Atom, SINGLE, DOUBLE, TRIPLE, AROMATIC,
    CHI_CW, CHI_CCW, DIR_NONE, DIR_UP, DIR_DOWN, SanitizeError,
)
from .periodic import ATOMIC_NUM, ORGANIC_SUBSET

_BOND_CHARS = {
    "-": (SINGLE, DIR_NONE),
    "=": (DOUBLE, DIR_NONE),
    "#": (TRIPLE, DIR_NONE),
    ":": (AROMATIC, DIR_NONE),
    "/": (SINGLE, DIR_UP),
    "\\": (SINGLE, DIR_DOWN),
}

_TWO_LETTER_ORGANIC = ("Cl", "Br")


class SmilesParseError(ValueError):
    pass


def _parse_bracket_atom(s: str, pos: int) -> tuple[Atom, int]:
    """Parse a bracket atom starting at s[pos] == '['. Returns (atom, next)."""
    end = s.find("]", pos)
    if end < 0:
        raise SmilesParseError(f"unclosed bracket at {pos}")
    body = s[pos + 1:end]
    i = 0
    isotope = 0
    while i < len(body) and body[i].isdigit():
        isotope = isotope * 10 + int(body[i])
        i += 1
    # element symbol (allow aromatic lowercase and '*')
    sym = ""
    aromatic = False
    if i < len(body):
        if body[i] == "*":
            sym = "*"
            i += 1
        elif body[i].isupper():
            sym = body[i]
            i += 1
            if i < len(body) and body[i].islower() and sym + body[i] in ATOMIC_NUM:
                sym += body[i]
                i += 1
        elif body[i].islower():
            low = body[i]
            if i + 1 < len(body) and (low + body[i + 1]) in ("se", "as", "te"):
                sym = (low + body[i + 1]).capitalize()
                if sym == "As":
                    sym = "As"
                aromatic = True
                i += 2
            else:
                sym = low.upper()
                aromatic = True
                i += 1
    if not sym:
        raise SmilesParseError(f"bad bracket atom [{body}]")
    if sym == "Se":
        pass
    atom = Atom(symbol=sym if sym != "*" else "*", isotope=isotope,
                is_aromatic=aromatic)
    atom.explicit_hs_set = True
    # chirality
    if i < len(body) and body[i] == "@":
        if i + 1 < len(body) and body[i + 1] == "@":
            atom.chiral_tag = CHI_CW
            i += 2
        else:
            atom.chiral_tag = CHI_CCW
            i += 1
        # extended chirality tokens (@TH1 etc.) — skip alphanumerics
        while i < len(body) and body[i].isupper() and body[i] in "TASOBH" and \
                i + 1 < len(body) and body[i + 1].isupper():
            i += 2
            while i < len(body) and body[i].isdigit():
                i += 1
    # hydrogen count
    if i < len(body) and body[i] == "H":
        i += 1
        h = 1
        if i < len(body) and body[i].isdigit():
            h = 0
            while i < len(body) and body[i].isdigit():
                h = h * 10 + int(body[i])
                i += 1
        atom.num_explicit_hs = h
    # charge
    if i < len(body) and body[i] in "+-":
        sign = 1 if body[i] == "+" else -1
        i += 1
        if i < len(body) and body[i].isdigit():
            mag = 0
            while i < len(body) and body[i].isdigit():
                mag = mag * 10 + int(body[i])
                i += 1
        else:
            mag = 1
            while i < len(body) and body[i] == body[i - 1]:
                mag += 1
                i += 1
        atom.formal_charge = sign * mag
    # atom map (ignored)
    if i < len(body) and body[i] == ":":
        i += 1
        while i < len(body) and body[i].isdigit():
            i += 1
    if i != len(body):
        raise SmilesParseError(f"trailing junk in bracket atom [{body}]")
    return atom, end + 1


def parse_smiles(smiles: str, sanitize: bool = True) -> Mol:
    """Parse a SMILES string into a (by default sanitized) Mol."""
    if not isinstance(smiles, str) or not smiles.strip():
        raise SmilesParseError("empty SMILES")
    s = smiles.strip()
    mol = Mol()

    prev_atom: int | None = None
    pending_bond: tuple[str, str] | None = None  # (order, direction)
    branch_stack: list[int | None] = []
    ring_open: dict[int, tuple[int, tuple | None, int]] = {}
    # ring number -> (atom idx, pending bond at open, stereo slot position)

    i = 0
    n = len(s)

    def add_parsed_atom(atom: Atom) -> None:
        nonlocal prev_atom, pending_bond
        idx = mol.add_atom(atom)
        if prev_atom is not None:
            order, direction = pending_bond if pending_bond else (None, DIR_NONE)
            if order is None:
                both_arom = mol.atoms[prev_atom].is_aromatic and atom.is_aromatic
                order = AROMATIC if both_arom else SINGLE
            b = mol.add_bond(prev_atom, idx, order, direction=direction)
            if direction != DIR_NONE:
                b.direction = direction
            mol.atoms[prev_atom]._stereo_neighbors.append(idx)
            atom._stereo_neighbors.append(prev_atom)
        if atom.explicit_hs_set and atom.num_explicit_hs > 0:
            # implicit-H slot comes right after the preceding-atom slot
            atom._stereo_neighbors.append("H")
        pending_bond = None
        prev_atom = idx

    while i < n:
        c = s[i]
        if c == "[":
            atom, i = _parse_bracket_atom(s, i)
            add_parsed_atom(atom)
        elif c.isalpha() or c == "*":
            sym = None
            if c == "*":
                sym, arom = "*", False
            elif s[i:i + 2] in _TWO_LETTER_ORGANIC:
                sym, arom = s[i:i + 2], False
                i += 1
            elif c.isupper():
                if c not in ORGANIC_SUBSET:
                    raise SmilesParseError(
                        f"atom '{c}' must be in brackets at {i} in {smiles!r}")
                sym, arom = c, False
            else:
                up = c.upper()
                if up not in ("B", "C", "N", "O", "P", "S"):
                    raise SmilesParseError(
                        f"bad aromatic atom '{c}' at {i} in {smiles!r}")
                sym, arom = up, True
            add_parsed_atom(Atom(symbol=sym, is_aromatic=arom))
            i += 1
        elif c in _BOND_CHARS:
            if pending_bond is not None:
                raise SmilesParseError(f"double bond symbol at {i}")
            pending_bond = _BOND_CHARS[c]
            i += 1
        elif c == "(":
            if prev_atom is None:
                raise SmilesParseError(f"branch with no atom at {i}")
            branch_stack.append(prev_atom)
            i += 1
        elif c == ")":
            if not branch_stack:
                raise SmilesParseError(f"unmatched ')' at {i}")
            prev_atom = branch_stack.pop()
            i += 1
        elif c.isdigit() or c == "%":
            if prev_atom is None:
                raise SmilesParseError(f"ring closure with no atom at {i}")
            if c == "%":
                if i + 2 >= n + 1 or not s[i + 1:i + 3].isdigit():
                    raise SmilesParseError(f"bad %ring number at {i}")
                num = int(s[i + 1:i + 3])
                i += 3
            else:
                num = int(c)
                i += 1
            if num in ring_open:
                o_atom, o_bond, o_slot = ring_open.pop(num)
                order = None
                direction = DIR_NONE
                if o_bond is not None and o_bond[0] is not None:
                    order, direction = o_bond
                if pending_bond is not None:
                    order2, dir2 = pending_bond
                    if order is not None and order2 != order:
                        raise SmilesParseError(
                            f"conflicting ring-bond orders for ring {num}")
                    order, direction = order2, dir2
                    # direction as written at the closing position refers to
                    # closing_atom -> opening_atom; bond stored open->close,
                    # so flip
                    if direction == DIR_UP:
                        direction = DIR_DOWN
                    elif direction == DIR_DOWN:
                        direction = DIR_UP
                if order is None:
                    both_arom = (mol.atoms[o_atom].is_aromatic
                                 and mol.atoms[prev_atom].is_aromatic)
                    order = AROMATIC if both_arom else SINGLE
                b = mol.add_bond(o_atom, prev_atom, order, direction=direction)
                # fill reserved stereo slots
                o_sn = mol.atoms[o_atom]._stereo_neighbors
                o_sn[o_slot] = prev_atom
                mol.atoms[prev_atom]._stereo_neighbors.append(o_atom)
                pending_bond = None
            else:
                slot = len(mol.atoms[prev_atom]._stereo_neighbors)
                mol.atoms[prev_atom]._stereo_neighbors.append(None)
                ring_open[num] = (prev_atom, pending_bond, slot)
                pending_bond = None
        elif c == ".":
            if pending_bond is not None:
                raise SmilesParseError(f"bond before '.' at {i}")
            prev_atom = None
            i += 1
        elif c in " \t":
            break  # SMILES ends at whitespace (title follows)
        else:
            raise SmilesParseError(f"unexpected character {c!r} at {i} in {smiles!r}")

    if branch_stack:
        raise SmilesParseError("unclosed branch '('")
    if ring_open:
        raise SmilesParseError(f"unclosed ring bond(s): {sorted(ring_open)}")
    if pending_bond is not None:
        raise SmilesParseError("dangling bond at end of SMILES")
    if mol.num_atoms == 0:
        raise SmilesParseError("no atoms parsed")

    _fold_explicit_hydrogens(mol)

    if sanitize:
        mol.sanitize()
    return mol


def _fold_explicit_hydrogens(mol: Mol) -> None:
    """Fold [H] atoms into their heavy neighbor (RDKit RemoveHs behavior,
    matching the reference at data/utils.py:101)."""
    h_atoms = [a.idx for a in mol.atoms
               if a.symbol == "H" and a.isotope == 0 and a.formal_charge == 0
               and mol.degree(a.idx) == 1]
    if not h_atoms:
        return
    h_set = set(h_atoms)
    keep = [a.idx for a in mol.atoms if a.idx not in h_set]
    # credit Hs to neighbors; record the neighbor slot as 'H' for stereo
    for h in h_atoms:
        b = mol.atom_bonds(h)[0]
        if b.order != SINGLE:
            raise SanitizeError("non-single bond to explicit H")
        nb = b.other(h)
        na = mol.atoms[nb]
        na.num_explicit_hs += 1
        na.explicit_hs_set = True
        sn = na._stereo_neighbors
        for k, v in enumerate(sn):
            if v == h:
                sn[k] = "H"

    # rebuild the molecule without H atoms
    remap = {a: i for i, a in enumerate(keep)}
    new_atoms = []
    for a in keep:
        src = mol.atoms[a]
        src._stereo_neighbors = [
            (remap[x] if isinstance(x, int) else x)
            for x in src._stereo_neighbors
            if not (isinstance(x, int) and x in h_set) or x == "H"
        ]
        new_atoms.append(src)
    old_bonds = [b for b in mol.bonds if b.begin not in h_set and b.end not in h_set]
    mol.atoms = []
    mol.bonds = []
    mol._adj = []
    for a in new_atoms:
        a.idx = -1
        mol.add_atom(a)
    for b in old_bonds:
        nb = mol.add_bond(remap[b.begin], remap[b.end], b.order,
                          b.is_aromatic, b.direction)
        nb.kekule_order = b.kekule_order
