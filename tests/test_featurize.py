"""Featurization tests — mirrors the reference's data-layer test strategy
(``gt_pyg/data/tests/``): feature dims, label/mask semantics, skip
behavior, ring stats, GNM."""

import logging

import numpy as np
import pytest

from gt_pyg_tpu.chem import parse_smiles
from gt_pyg_tpu.chem.gasteiger import compute_gasteiger_charges
from gt_pyg_tpu.data import (
    get_tensor_data,
    get_atom_feature_dim,
    get_bond_feature_dim,
    get_atom_features,
    get_bond_features,
    get_ring_membership_stats,
    get_gnm_encodings,
    canonicalize_smiles,
    pad_graph_batch,
)

# known bad-Gasteiger SMILES (Au complex), same role as the reference's
# data/tests/test_utils.py:16-19
BAD_GASTEIGER_SMILES = "F[Au](F)F"


class TestDims:
    def test_atom_feature_dim_140(self):
        assert get_atom_feature_dim() == 140

    def test_bond_feature_dim_39(self):
        assert get_bond_feature_dim() == 39

    def test_dims_vary_with_flags(self):
        assert get_atom_feature_dim(use_stereochemistry=False) == 140 - 7
        assert get_atom_feature_dim(hydrogens_implicit=False) == 140 - 6 + 1
        assert get_bond_feature_dim(use_stereochemistry=False) == 32


class TestAtomFeatures:
    def test_vector_layout_carbon(self):
        m = parse_smiles("C")
        compute_gasteiger_charges(m)
        v = get_atom_features(m, m.atoms[0])
        assert len(v) == 140
        assert v[0] == 1.0          # atom type one-hot: C first
        assert v[43] == 1.0         # degree 0
        assert v[49 + 3] == 1.0     # formal charge 0 (index 3 of 8)
        # atomic number scalar at offset 43+6+8+7+1+1 = 66
        assert v[66] == 6.0
        # mass slot: 12.011 * 0.01
        assert v[-2] == pytest.approx(0.12011)
        # GNM default 0
        assert v[-1] == 0.0

    def test_gasteiger_bounded(self):
        m = parse_smiles("CC(=O)[O-]")
        compute_gasteiger_charges(m)
        for a in m.atoms:
            v = get_atom_features(m, a)
            g = v[-8]  # gasteiger slot: 140-8 (before 5 pharm + mass + gnm)
            assert -1.0 <= g <= 1.0

    def test_unknown_symbol_catchall(self, caplog):
        m = parse_smiles("[U]")
        compute_gasteiger_charges(m)
        v = get_atom_features(m, m.atoms[0])
        assert v[42] == 1.0  # "Unknown" catch-all slot


class TestRingStats:
    def test_benzene(self):
        m = parse_smiles("c1ccccc1")
        atom_stats, bond_stats = get_ring_membership_stats(m)
        for st in atom_stats.values():
            assert st["count"] == 1
            assert st["min_size"] == 6
            assert st["max_size"] == 6
            assert st["has_aromatic"] is True
            assert st["has_non_aromatic"] is False

    def test_fusion_atom_counts(self):
        m = parse_smiles("c1ccc2ccccc2c1")
        atom_stats, _ = get_ring_membership_stats(m)
        counts = sorted(st["count"] for st in atom_stats.values())
        assert counts == [1] * 8 + [2, 2]

    def test_acyclic(self):
        m = parse_smiles("CCO")
        atom_stats, bond_stats = get_ring_membership_stats(m)
        assert all(st["count"] == 0 for st in atom_stats.values())
        assert all(st["min_size"] is None for st in bond_stats.values())


class TestGNM:
    def test_path_graph_matches_numpy(self):
        m = parse_smiles("CCO")
        adj = m.adjacency()
        gnm = get_gnm_encodings(adj)
        deg = np.diag(adj.sum(1))
        expected = np.diag(np.linalg.pinv(deg - adj))
        np.testing.assert_allclose(gnm, expected)

    def test_single_atom_zeros(self):
        assert get_gnm_encodings(np.zeros((1, 1))).tolist() == [0.0]

    def test_cycle_symmetry(self):
        m = parse_smiles("C1CCCCC1")
        gnm = get_gnm_encodings(m.adjacency())
        np.testing.assert_allclose(gnm, gnm[0])


class TestGetTensorData:
    def test_single_task_shapes(self):
        ds = get_tensor_data(["CCO", "c1ccccc1"], [1.0, 2.0], progress=False)
        assert len(ds) == 2
        for g in ds:
            assert g.y.shape == (1, 1)
            assert g.y_mask.shape == (1, 1)
            assert g.x.shape[1] == 140
            assert g.edge_attr.shape[1] == 39
            assert g.edge_index.shape[0] == 2

    def test_multi_task_nan_mask(self):
        ds = get_tensor_data(["CCO"], [[1.0, None, np.nan]], progress=False)
        g = ds[0]
        assert g.y.shape == (1, 3)
        np.testing.assert_array_equal(g.y_mask, [[1.0, 0.0, 0.0]])

    def test_inference_mode_no_labels(self):
        ds = get_tensor_data(["CCO"], progress=False)
        assert ds[0].y is None and ds[0].y_mask is None

    def test_length_mismatch_raises(self):
        with pytest.raises(ValueError, match="same length"):
            get_tensor_data(["C", "CC"], [1.0], progress=False)
        with pytest.raises(ValueError, match="same length"):
            get_tensor_data(["C"], [1.0], ids=[1, 2], progress=False)

    def test_bad_gasteiger_skipped_with_alignment(self, caplog):
        with caplog.at_level(logging.WARNING):
            ds = get_tensor_data(
                [BAD_GASTEIGER_SMILES, "CCO"], [[7.0], [8.0]],
                ids=["bad", "good"], progress=False)
        assert len(ds) == 1
        assert ds[0].y[0, 0] == 8.0  # label alignment preserved
        assert any("bad" in r.message and "row=0" in r.message
                   for r in caplog.records)

    def test_invalid_smiles_raises(self):
        with pytest.raises(ValueError, match="canonicalize"):
            get_tensor_data(["not_a_smiles((("], [1.0], progress=False)

    def test_single_atom_molecule(self):
        ds = get_tensor_data(["C"], [1.0], progress=False)
        g = ds[0]
        assert g.num_nodes == 1
        assert g.num_edges == 0
        assert g.edge_attr.shape == (0, 39)

    def test_both_edge_directions(self):
        ds = get_tensor_data(["CCO"], progress=False)
        ei = ds[0].edge_index
        pairs = {(int(a), int(b)) for a, b in ei.T}
        assert (0, 1) in pairs and (1, 0) in pairs


class TestCanonicalize:
    def test_salt_stripping(self):
        assert canonicalize_smiles("CCO.[Na+].[Cl-]") == canonicalize_smiles("CCO")

    def test_charge_preserved(self):
        s = canonicalize_smiles("[NH4+]")
        assert "+" in s

    def test_invalid_returns_none(self):
        assert canonicalize_smiles("xx((") is None

    def test_stereo_strip(self):
        with_st = canonicalize_smiles("C[C@H](N)C(=O)O", keep_stereo=True)
        no_st = canonicalize_smiles("C[C@H](N)C(=O)O", keep_stereo=False)
        assert "@" in with_st
        assert "@" not in no_st


class TestBatching:
    def _ds(self):
        return get_tensor_data(["CCO", "c1ccccc1", "C"], [1.0, 2.0, 3.0],
                               progress=False)

    def test_pad_shapes(self):
        b = pad_graph_batch(self._ds(), node_multiple=32, edge_multiple=32)
        assert b.node_x.shape == (32, 140)
        assert b.edge_attr.shape == (32, 39)
        assert int(b.num_nodes) == 10
        assert int(b.num_graphs) == 3

    def test_edges_sorted_by_dst(self):
        b = pad_graph_batch(self._ds(), node_multiple=32, edge_multiple=32)
        assert np.all(np.diff(b.edge_dst.astype(np.int64)) >= 0)

    def test_padding_points_at_trash_slots(self):
        b = pad_graph_batch(self._ds(), node_multiple=32, edge_multiple=32)
        ne = int(b.num_edges)
        nn = int(b.num_nodes)
        assert np.all(b.edge_dst[ne:] == 32)
        assert np.all(b.node_graph[nn:] == 3)

    def test_graph_pad(self):
        b = pad_graph_batch(self._ds(), node_multiple=32, edge_multiple=32,
                            graph_pad=8)
        assert b.y.shape == (8, 1)
        np.testing.assert_array_equal(b.graph_mask[:4], [1, 1, 1, 0])

    def test_overflow_raises(self):
        with pytest.raises(ValueError, match="padding too small"):
            pad_graph_batch(self._ds(), node_pad=4, edge_pad=64)
