"""Checkpoint subsystem tests — mirrors the reference's
``nn/tests/test_checkpoint.py`` + ``test_model.py`` checkpoint coverage:
round-trips, metadata-only reads, version policies, torch import."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gt_pyg_tpu.checkpoint import (
    save_checkpoint, load_checkpoint, get_checkpoint_info,
    save_model_checkpoint, load_model_checkpoint, load_weights,
    convert_torch_state_dict, merge_pretrained,
)
from gt_pyg_tpu.data import get_tensor_data, pad_graph_batch
from gt_pyg_tpu.nn import GraphTransformerNet


@pytest.fixture(scope="module")
def batch():
    ds = get_tensor_data(["CCO", "c1ccccc1"], [1.0, 2.0], progress=False)
    return jax.tree_util.tree_map(
        jnp.asarray, pad_graph_batch(ds, node_multiple=16, edge_multiple=32))


@pytest.fixture(scope="module")
def model_state(batch):
    model = GraphTransformerNet(node_dim_in=140, edge_dim_in=39,
                                hidden_dim=16, num_gt_layers=1, num_heads=2,
                                dropout=0.0)
    v = model.init({"params": jax.random.PRNGKey(0)}, batch,
                   deterministic=True)
    return model, {"params": v["params"],
                   "batch_stats": v.get("batch_stats", {})}


class TestRoundTrip:
    def test_model_checkpoint_round_trip(self, tmp_path, batch, model_state):
        model, state = model_state
        p = save_model_checkpoint(model, state, tmp_path / "m",
                                  epoch=7, best_metric=0.123)
        assert p.suffix == ".ckpt"
        m2, state2, ckpt = load_model_checkpoint(p)
        assert ckpt["epoch"] == 7
        assert ckpt["best_metric"] == pytest.approx(0.123)
        assert m2.get_config() == model.get_config()
        out1 = model.apply({"params": state["params"],
                            "batch_stats": state["batch_stats"]},
                           batch, deterministic=True)
        out2 = m2.apply({"params": state2["params"],
                         "batch_stats": state2["batch_stats"]},
                        batch, deterministic=True)
        np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]),
                                   rtol=1e-6)

    def test_parent_dir_created(self, tmp_path, model_state):
        model, state = model_state
        p = save_model_checkpoint(model, state, tmp_path / "a/b/c/m")
        assert p.exists()

    def test_optimizer_state_saved(self, tmp_path, model_state):
        import optax

        model, state = model_state
        tx = optax.adamw(1e-3)
        opt = tx.init(state["params"])
        p = save_checkpoint(tmp_path / "o", state, optimizer_state=opt)
        ckpt = load_checkpoint(p)
        assert "optimizer_state_dict" in ckpt


class TestMetadata:
    def test_info_excludes_arrays(self, tmp_path, model_state):
        model, state = model_state
        p = save_model_checkpoint(model, state, tmp_path / "m", epoch=3,
                                  frozen_status={"heads": False})
        info = get_checkpoint_info(p)
        assert "model_state_dict" not in info
        assert info["epoch"] == 3
        assert info["frozen_status"] == {"heads": False}
        assert info["checkpoint_version"] == 1
        assert "created_at" in info

    def test_bad_magic_rejected(self, tmp_path):
        f = tmp_path / "junk.ckpt"
        f.write_bytes(b"NOPE1234")
        with pytest.raises(ValueError, match="bad magic"):
            get_checkpoint_info(f)


class TestVersionPolicy:
    def _tampered(self, tmp_path, model_state, version):
        import json, struct

        model, state = model_state
        p = save_model_checkpoint(model, state, tmp_path / "v")
        raw = p.read_bytes()
        (hlen,) = struct.unpack("<I", raw[4:8])
        header = json.loads(raw[8:8 + hlen])
        if version is None:
            header.pop("gt_pyg_tpu_version", None)
        else:
            header["gt_pyg_tpu_version"] = version
        hdr = json.dumps(header).encode()
        p.write_bytes(b"GTPT" + struct.pack("<I", len(hdr)) + hdr
                      + raw[8 + hlen:])
        return p

    def test_warn_on_mismatch(self, tmp_path, model_state, caplog):
        import logging

        p = self._tampered(tmp_path, model_state, "9.9.9")
        with caplog.at_level(logging.WARNING):
            load_checkpoint(p, version_check="warn")
        assert any("9.9.9" in r.message for r in caplog.records)

    def test_error_on_mismatch(self, tmp_path, model_state):
        p = self._tampered(tmp_path, model_state, "9.9.9")
        with pytest.raises(RuntimeError, match="9.9.9"):
            load_checkpoint(p, version_check="error")

    def test_ignore(self, tmp_path, model_state):
        p = self._tampered(tmp_path, model_state, "9.9.9")
        load_checkpoint(p, version_check="ignore")

    def test_missing_version_error(self, tmp_path, model_state):
        p = self._tampered(tmp_path, model_state, None)
        with pytest.raises(RuntimeError, match="no gt_pyg_tpu_version"):
            load_checkpoint(p, version_check="error")

    def test_invalid_policy(self, tmp_path, model_state):
        model, state = model_state
        p = save_model_checkpoint(model, state, tmp_path / "m")
        with pytest.raises(ValueError, match="version_check"):
            load_checkpoint(p, version_check="bogus")


class TestHeadFilter:
    def test_load_weights_filter_heads(self, tmp_path, batch, model_state):
        model, state = model_state
        p = save_model_checkpoint(model, state, tmp_path / "m")
        filtered, _ = load_weights(p, filter_heads=True)
        assert "mu_mlp" not in filtered["params"]
        assert "log_var_mlp" not in filtered["params"]
        assert "node_emb" in filtered["params"]


class TestTorchImport:
    def test_full_reference_shaped_state_dict(self, batch):
        """Build a torch state dict with the reference's exact key space
        and verify it maps onto our params with matching shapes."""
        torch = pytest.importorskip("torch")

        model = GraphTransformerNet(node_dim_in=140, edge_dim_in=39,
                                    hidden_dim=16, num_gt_layers=1,
                                    num_heads=2, norm="bn", gate=True,
                                    dropout=0.0)
        v = model.init({"params": jax.random.PRNGKey(0)}, batch,
                       deterministic=True)
        init_state = {"params": v["params"], "batch_stats": v["batch_stats"]}

        sd = {}

        def lin(name, o, i, bias=True):
            sd[f"{name}.weight"] = torch.randn(o, i)
            if bias:
                sd[f"{name}.bias"] = torch.randn(o)

        def bn(name, d):
            sd[f"{name}.weight"] = torch.ones(d)
            sd[f"{name}.bias"] = torch.zeros(d)
            sd[f"{name}.running_mean"] = torch.randn(d)
            sd[f"{name}.running_var"] = torch.rand(d) + 0.5
            sd[f"{name}.num_batches_tracked"] = torch.tensor(3)

        def mlp(name, i, h, o):
            lin(f"{name}.blocks.0.0", h, i)
            lin(f"{name}.blocks.1.0", h, h)
            lin(f"{name}.output_layer", o, h)

        H = 16
        lin("node_emb", H, 140, bias=False)
        lin("edge_emb", H, 39, bias=False)
        bn("input_norm", H)
        g = "gt_layers.0"
        for w in ("WQ", "WK", "WV"):
            lin(f"{g}.{w}", H, H, bias=False)
        lin(f"{g}.WO", H, H)
        lin(f"{g}.WE_logits", 2, H)
        lin(f"{g}.WE_value", H, H)
        lin(f"{g}.WOe", H, H)
        lin(f"{g}.n_gate", H, H)
        lin(f"{g}.e_gate", 2, H)
        bn(f"{g}.norm1", H)
        bn(f"{g}.norm2", H)
        bn(f"{g}.norm0e", H)
        bn(f"{g}.norm1e", H)
        mlp(f"{g}.ffn", H, max(H, 4 * H), H)
        mlp(f"{g}.ffn_e", H, max(H, 2 * H), H)
        bn("readout_norm", H)
        mlp("mu_mlp", H, H, 1)
        mlp("log_var_mlp", H, H, 1)

        converted = convert_torch_state_dict(sd)
        merged = merge_pretrained(init_state, converted)

        # every imported leaf shape must match the init tree
        flat_init = jax.tree_util.tree_leaves_with_path(init_state["params"])
        flat_merged = dict(jax.tree_util.tree_leaves_with_path(
            merged["params"]))
        assert len(flat_init) == len(flat_merged)

        # the imported weights actually land (node_emb transposed)
        np.testing.assert_allclose(
            merged["params"]["node_emb"]["kernel"],
            sd["node_emb.weight"].numpy().T)
        np.testing.assert_allclose(
            merged["batch_stats"]["input_norm"]["mean"],
            sd["input_norm.running_mean"].numpy())

        # model still runs with imported weights
        model.apply({"params": merged["params"],
                     "batch_stats": merged["batch_stats"]},
                    jax.tree_util.tree_map(jnp.asarray, batch),
                    deterministic=True)

    def test_head_filter(self):
        torch = pytest.importorskip("torch")
        sd = {"mu_mlp.output_layer.weight": torch.randn(1, 4),
              "node_emb.weight": torch.randn(4, 4)}
        from gt_pyg_tpu.checkpoint.torch_import import (
            convert_torch_state_dict)

        conv = convert_torch_state_dict(sd)
        assert "mu_mlp" in conv["params"]
        filtered = {k: v for k, v in conv["params"].items()
                    if k not in ("mu_mlp", "log_var_mlp")}
        assert "mu_mlp" not in filtered
