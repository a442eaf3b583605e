"""Public API contract — mirrors the reference's
``nn/tests/test_public_api.py:10-59``: documented names importable, __all__
is honest, no private leakage."""

import gt_pyg_tpu


DOCUMENTED = [
    "__version__",
    "GraphTransformerNet",
    "GTConv",
    "MLP",
    "get_tensor_data",
    "get_atom_feature_dim",
    "get_bond_feature_dim",
]


class TestPublicAPI:
    def test_documented_names_importable(self):
        for name in DOCUMENTED:
            assert getattr(gt_pyg_tpu, name) is not None

    def test_all_superset_of_documented(self):
        assert set(DOCUMENTED) <= set(gt_pyg_tpu.__all__)

    def test_no_private_names_exported(self):
        for name in gt_pyg_tpu.__all__:
            assert not name.startswith("_") or name == "__version__"

    def test_every_all_name_accessible(self):
        for name in gt_pyg_tpu.__all__:
            assert getattr(gt_pyg_tpu, name) is not None

    def test_version_is_pep440ish(self):
        v = gt_pyg_tpu.__version__
        assert isinstance(v, str) and len(v) > 0
        assert v[0].isdigit()

    def test_feature_dims(self):
        assert gt_pyg_tpu.get_atom_feature_dim() == 140
        assert gt_pyg_tpu.get_bond_feature_dim() == 39

    def test_subpackages_importable(self):
        import gt_pyg_tpu.chem  # noqa: F401
        import gt_pyg_tpu.data  # noqa: F401
        import gt_pyg_tpu.nn  # noqa: F401
        import gt_pyg_tpu.ops  # noqa: F401
        import gt_pyg_tpu.train  # noqa: F401
        import gt_pyg_tpu.parallel  # noqa: F401
        import gt_pyg_tpu.checkpoint  # noqa: F401
        import gt_pyg_tpu.utils  # noqa: F401
