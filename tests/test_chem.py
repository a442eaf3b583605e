"""Chemistry-kernel tests: SMILES parsing, perception, charges, stereo,
canonical output."""

import math

import pytest

from gt_pyg_tpu.chem import parse_smiles, SmilesParseError
from gt_pyg_tpu.chem.gasteiger import compute_gasteiger_charges
from gt_pyg_tpu.chem.smiles_writer import write_smiles
from gt_pyg_tpu.chem.stereo import assign_stereochemistry


class TestParser:
    @pytest.mark.parametrize("smi,n_atoms,n_bonds", [
        ("C", 1, 0),
        ("CCO", 3, 2),
        ("c1ccccc1", 6, 6),
        ("C1=CC=CC=C1", 6, 6),
        ("c1ccc2ccccc2c1", 10, 11),
        ("CC(=O)Nc1ccc(O)cc1", 11, 11),
        ("CN1C=NC2=C1C(=O)N(C)C(=O)N2C", 14, 15),
        ("CCO.[Na+].[Cl-]", 5, 2),
        ("[H]C([H])([H])[H]", 1, 0),
    ])
    def test_atom_bond_counts(self, smi, n_atoms, n_bonds):
        m = parse_smiles(smi)
        assert m.num_atoms == n_atoms
        assert m.num_bonds == n_bonds

    @pytest.mark.parametrize("smi,hs", [
        ("C", [4]),
        ("CCO", [3, 2, 1]),
        ("c1ccncc1", [1, 1, 1, 0, 1, 1]),
        ("c1cc[nH]c1", [1, 1, 1, 1, 1]),
        ("[NH4+]", [4]),
        ("C[N+](C)(C)C", [3, 0, 3, 3, 3]),
        ("CS(=O)(=O)C", [3, 0, 0, 0, 3]),
    ])
    def test_hydrogen_counts(self, smi, hs):
        m = parse_smiles(smi)
        assert [a.total_num_hs for a in m.atoms] == hs

    @pytest.mark.parametrize("smi,n_arom", [
        ("c1ccccc1", 6),
        ("C1=CC=CC=C1", 6),        # perceived from Kekulé form
        ("c1ccc2ccccc2c1", 10),
        ("C1CCCCC1", 0),
        ("c1ccoc1", 5),
        ("c1ccsc1", 5),
        ("c1cc[nH]c1", 5),
    ])
    def test_aromatic_perception(self, smi, n_arom):
        m = parse_smiles(smi)
        assert sum(a.is_aromatic for a in m.atoms) == n_arom

    @pytest.mark.parametrize("bad", ["", "C(", "C1CC", "CX", "[C", "C)"])
    def test_parse_errors(self, bad):
        with pytest.raises((SmilesParseError, ValueError)):
            parse_smiles(bad)

    def test_kekule_valences(self):
        m = parse_smiles("c1ccccc1")
        for a in m.atoms:
            assert m.total_valence(a.idx) == 4

    @pytest.mark.parametrize("smi,hybs", [
        ("CC=C", ["SP3", "SP2", "SP2"]),
        ("CC#N", ["SP3", "SP", "SP"]),
        ("c1ccccc1", ["SP2"] * 6),
        ("CO", ["SP3", "SP3"]),
        ("FS(F)(F)(F)(F)F",
         ["SP3", "SP3D2", "SP3", "SP3", "SP3", "SP3", "SP3"]),
    ])
    def test_hybridization(self, smi, hybs):
        m = parse_smiles(smi)
        assert [a.hybridization for a in m.atoms] == hybs


class TestGasteiger:
    def test_known_values_ethanol(self):
        """PEOE charges must match the published Gasteiger-Marsili values
        (same values RDKit produces)."""
        m = parse_smiles("CCO")
        q = compute_gasteiger_charges(m)
        assert q[0] == pytest.approx(-0.0418, abs=2e-3)
        assert q[1] == pytest.approx(0.0402, abs=2e-3)
        assert q[2] == pytest.approx(-0.3967, abs=2e-3)

    def test_methane(self):
        m = parse_smiles("C")
        (q,) = compute_gasteiger_charges(m)
        assert q == pytest.approx(-0.0776, abs=2e-3)

    def test_charge_conservation(self):
        m = parse_smiles("CC(=O)[O-]")
        q = compute_gasteiger_charges(m)
        total = sum(q) + sum(a.props["_GasteigerHCharge"] for a in m.atoms)
        assert total == pytest.approx(-1.0, abs=1e-6)

    def test_unparameterized_metal_nonfinite(self):
        """Exotic metals (no PEOE params) yield non-finite charges — the
        skip-compound signal (reference data/tests/test_utils.py:16-19)."""
        m = parse_smiles("F[Au](F)F")
        q = compute_gasteiger_charges(m)
        assert any(not math.isfinite(v) for v in q)


class TestStereo:
    @pytest.mark.parametrize("smi,codes", [
        ("C[C@H](N)C(=O)O", {"S"}),   # L-alanine
        ("C[C@@H](N)C(=O)O", {"R"}),
        ("CC(C)C", set()),
        ("C[C@H](C)O", set()),        # pseudo-stereocenter cleaned
    ])
    def test_cip_codes(self, smi, codes):
        m = parse_smiles(smi)
        assign_stereochemistry(m)
        got = {a.props.get("_CIPCode") for a in m.atoms if "_CIPCode" in a.props}
        assert got == codes

    @pytest.mark.parametrize("smi,stereo", [
        ("F/C=C/F", "STEREOE"),
        ("F/C=C\\F", "STEREOZ"),
        ("C/C=C/C", "STEREOE"),
        ("C/C=C\\C", "STEREOZ"),
        ("CC=CC", "STEREONONE"),
    ])
    def test_bond_stereo(self, smi, stereo):
        m = parse_smiles(smi)
        assign_stereochemistry(m)
        got = [b.stereo for b in m.bonds if b.kekule_order == "DOUBLE"]
        assert got == [stereo]


class TestWriter:
    @pytest.mark.parametrize("a,b", [
        ("CCO", "OCC"),
        ("CCO", "C(O)C"),
        ("c1ccccc1", "C1=CC=CC=C1"),
        ("CC(=O)O", "OC(C)=O"),
        ("c1ccc2ccccc2c1", "c1ccc2c(c1)cccc2"),
        ("CC(=O)Nc1ccc(O)cc1", "Oc1ccc(NC(C)=O)cc1"),
    ])
    def test_canonical_invariance(self, a, b):
        assert write_smiles(parse_smiles(a)) == write_smiles(parse_smiles(b))

    @pytest.mark.parametrize("smi", [
        "CCO", "c1ccccc1", "CC(=O)Nc1ccc(O)cc1", "C[C@H](N)C(=O)O",
        "F/C=C/F", "CN1C=NC2=C1C(=O)N(C)C(=O)N2C", "[NH4+]",
        "O=S(=O)([O-])c1ccccc1", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    ])
    def test_roundtrip_stable(self, smi):
        m = parse_smiles(smi)
        assign_stereochemistry(m)
        s1 = write_smiles(m)
        m2 = parse_smiles(s1)
        assign_stereochemistry(m2)
        assert write_smiles(m2) == s1

    def test_stereo_preserved(self):
        s = write_smiles(parse_smiles("C[C@H](N)C(=O)O"))
        m2 = parse_smiles(s)
        assign_stereochemistry(m2)
        codes = {a.props.get("_CIPCode") for a in m2.atoms if "_CIPCode" in a.props}
        assert codes == {"S"}


class TestRings:
    def test_benzene_one_ring(self):
        m = parse_smiles("c1ccccc1")
        atom_rings, bond_rings = m.ring_info()
        assert len(atom_rings) == 1
        assert len(atom_rings[0]) == 6

    def test_naphthalene_two_rings(self):
        m = parse_smiles("c1ccc2ccccc2c1")
        atom_rings, _ = m.ring_info()
        assert sorted(len(r) for r in atom_rings) == [6, 6]

    def test_spiro(self):
        m = parse_smiles("C1CCC2(CC1)CCCC2")
        atom_rings, _ = m.ring_info()
        assert sorted(len(r) for r in atom_rings) == [5, 6]

    def test_cubane_ring_count(self):
        m = parse_smiles("C1(C2C3C14)C5C4C3C25")
        atom_rings, _ = m.ring_info()
        # SSSR size = m - n + 1 = 12 - 8 + 1 = 5
        assert len(atom_rings) == 5


class TestCanonicalInvariance:
    """Canonical output must be invariant to input atom order — the
    property that required branch-resolved tie-breaking and
    kekulé-independent ranking (fused aromatic systems)."""

    @pytest.mark.parametrize("smi", [
        "c1cc2cc3[nH]c4ccc(OCC5=NCCN5)cc4c3cc2cn1",   # fused tricyclic
        "NC(=O)CCN1C(=O)Cc2c1ccc1ccccc21",             # isoindolinone
        "c1cc(OCCN2CCCCC2)cc(-c2ccc3ccnnc3c2)c1",
        "O=C1NC(=O)c2c1cccc2-c1ccc(OCCN2CCCCC2)cc1",   # phthalimide
        "CN1C(=O)/C(=C\\c2cncn2C)c2c1ccc1ncsc21",
    ])
    def test_roundtrip_stable_hard_cases(self, smi):
        m = parse_smiles(smi)
        assign_stereochemistry(m)
        c1 = write_smiles(m)
        m2 = parse_smiles(c1)
        assign_stereochemistry(m2)
        assert write_smiles(m2) == c1

    def test_phthalimide_five_ring_not_aromatic(self):
        m = parse_smiles("O=C1NC(=O)c2ccccc21")
        # benzo ring aromatic (6), imide ring not
        assert sum(a.is_aromatic for a in m.atoms) == 6


class TestParserEdgeCases:
    @pytest.mark.parametrize("smi,charges,isotopes", [
        ("[13CH4]", [0], [13]),
        ("[Fe++]", [2], [0]),
        ("[Fe+2]", [2], [0]),
        ("[O--]", [-2], [0]),
        ("[nH+]1ccccc1", [1, 0, 0, 0, 0, 0], [0] * 6),
    ])
    def test_bracket_atoms(self, smi, charges, isotopes):
        m = parse_smiles(smi)
        assert [a.formal_charge for a in m.atoms] == charges
        assert [a.isotope for a in m.atoms] == isotopes

    def test_percent_ring_closure(self):
        m = parse_smiles("C%10CCCCC%10")
        assert m.num_atoms == 6 and m.num_bonds == 6
        assert len(m.ring_info()[0]) == 1

    def test_selenophene_aromatic(self):
        m = parse_smiles("c1cc[se]c1")
        assert sum(a.is_aromatic for a in m.atoms) == 5
        assert m.atoms[3].symbol == "Se"

    def test_pyridinium_hydrogens(self):
        m = parse_smiles("[nH+]1ccccc1")
        assert m.atoms[0].total_num_hs == 1
