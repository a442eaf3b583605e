"""ChEMBL structure-pipeline standardization tests — the port of the
reference family at ``gt_pyg/data/tests/test_standardize.py:15-87``:
skipif-gated functional tests when ``chembl_structure_pipeline`` is
installed, plus the ImportError path exercised WITHOUT the dependency
via ``unittest.mock.patch.dict(sys.modules, ...)`` (the reference's
only mock-a-backend pattern, SURVEY.md §4)."""

import unittest.mock

import numpy as np
import pytest

from gt_pyg_tpu.data import get_tensor_data
from gt_pyg_tpu.data.featurize import standardize_smiles

chembl_available = True
try:
    import chembl_structure_pipeline  # noqa: F401
except ImportError:
    chembl_available = False

needs_chembl = pytest.mark.skipif(
    not chembl_available,
    reason="chembl_structure_pipeline not installed",
)


class TestStandardizeSmiles:
    @needs_chembl
    def test_simple_passthrough(self):
        assert standardize_smiles("CCO") == "CCO"

    @needs_chembl
    def test_salt_stripping(self):
        result = standardize_smiles("c1ccccc1.Cl")
        assert result is not None
        assert "Cl" not in result

    @needs_chembl
    def test_returns_none_on_invalid(self):
        assert standardize_smiles("not_a_smiles") is None

    @needs_chembl
    def test_returns_canonical(self):
        assert standardize_smiles("C(O)C") == "CCO"

    def test_raises_without_chembl(self):
        """Reference test_standardize.py:54-57 — the ImportError path
        must fire even on machines WITH chembl installed."""
        with unittest.mock.patch.dict(
                "sys.modules", {"chembl_structure_pipeline": None}):
            with pytest.raises(ImportError,
                               match="chembl_structure_pipeline"):
                standardize_smiles("CCO")


class TestGetTensorDataStandardize:
    @needs_chembl
    def test_standardize_flag_produces_valid_data(self):
        data_list = get_tensor_data(["CCO"], [1.0], standardize=True,
                                    progress=False)
        assert len(data_list) == 1
        assert data_list[0].x is not None

    @needs_chembl
    def test_standardize_strips_salt(self):
        data_std = get_tensor_data(["c1ccccc1.Cl"], standardize=True,
                                   progress=False)
        data_plain = get_tensor_data(["c1ccccc1"], standardize=False,
                                     progress=False)
        np.testing.assert_array_equal(data_std[0].x, data_plain[0].x)
        np.testing.assert_array_equal(data_std[0].edge_index,
                                      data_plain[0].edge_index)
        np.testing.assert_array_equal(data_std[0].edge_attr,
                                      data_plain[0].edge_attr)

    def test_standardize_raises_without_chembl(self):
        """The check fires BEFORE the featurization loop (reference
        data/utils.py:456), so the error is immediate, not per-row."""
        with unittest.mock.patch.dict(
                "sys.modules", {"chembl_structure_pipeline": None}):
            with pytest.raises(ImportError,
                               match="chembl_structure_pipeline"):
                get_tensor_data(["CCO"], standardize=True, progress=False)

    def test_standardize_false_no_import_needed(self):
        with unittest.mock.patch.dict(
                "sys.modules", {"chembl_structure_pipeline": None}):
            data_list = get_tensor_data(["CCO"], [1.0], standardize=False,
                                        progress=False)
        assert len(data_list) == 1

    def test_parallel_path_raises_without_chembl(self):
        """The pooled featurizer inherits the same contract."""
        from gt_pyg_tpu.data.pipeline import get_tensor_data_parallel

        with unittest.mock.patch.dict(
                "sys.modules", {"chembl_structure_pipeline": None}):
            with pytest.raises(ImportError,
                               match="chembl_structure_pipeline"):
                get_tensor_data_parallel(["CCO"] * 4, standardize=True,
                                         chunk_size=2, num_workers=1,
                                         progress=False)
