"""Trainer infrastructure tests: schedule, freezing, metrics, datasets,
data-parallel step, multichip dry-run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gt_pyg_tpu.train.schedule import warmup_cosine_factor, make_epoch_lr
from gt_pyg_tpu.train.freeze import freeze_mask, frozen_status
from gt_pyg_tpu.train.metrics import (
    official_metrics, macro_official_avg, bootstrap_metrics,
    evaluate_predictions,
)


class TestSchedule:
    def test_warmup_linear(self):
        # epoch 0 -> 1/25, epoch 24 -> 25/25 (reference LambdaLR, cell 11)
        assert warmup_cosine_factor(0) == pytest.approx(1 / 25)
        assert warmup_cosine_factor(24) == pytest.approx(1.0)

    def test_cosine_floor(self):
        lr = make_epoch_lr(1e-3)
        # midpoint of the cosine from epoch 25 to 500
        mid = lr(25 + (500 - 25) // 2)
        assert 1e-5 < mid < 1e-3
        assert lr(500) == pytest.approx(1e-5, rel=1e-2)

    def test_restart_behavior(self):
        """Past T_max the reference's cosine keeps going — LR rises again
        (cosine restarts; SURVEY.md §3.3)."""
        lr = make_epoch_lr(1e-3)
        assert lr(975) > lr(500)


class TestFreeze:
    @pytest.fixture
    def params(self):
        leaf = {"kernel": np.zeros(1)}
        return {
            "node_emb": dict(leaf), "edge_emb": dict(leaf),
            "input_norm": {"scale": np.zeros(1)},
            "gt_layer_0": {"WQ": dict(leaf)},
            "gt_layer_1": {"WQ": dict(leaf)},
            "readout_norm": {"scale": np.zeros(1)},
            "mu_mlp": {"output_linear": dict(leaf)},
            "log_var_mlp": {"output_linear": dict(leaf)},
        }

    def test_freeze_all_except_heads(self, params):
        mask = freeze_mask(params, components="all", exclude="heads")
        st = frozen_status(mask)
        assert st["embeddings"] is True
        assert st["gt_layers"] is True
        assert st["heads"] is False
        assert st["pooling"] is None

    def test_freeze_single_layer(self, params):
        mask = freeze_mask(params, components="gt_layer_1")
        assert all(jax.tree_util.tree_leaves(mask["gt_layer_1"]))
        assert not any(jax.tree_util.tree_leaves(mask["gt_layer_0"]))

    def test_invalid_layer_index(self, params):
        with pytest.raises(ValueError, match="Invalid layer index"):
            freeze_mask(params, components="gt_layer_5")

    def test_unknown_component(self, params):
        with pytest.raises(ValueError, match="Unknown component"):
            freeze_mask(params, components="bogus")

    def test_frozen_grads_zeroed_in_training(self):
        """End-to-end: frozen components receive no updates."""
        from gt_pyg_tpu.data import get_tensor_data, pad_graph_batch
        from gt_pyg_tpu.data.loader import iter_batches
        from gt_pyg_tpu.nn import GraphTransformerNet
        from gt_pyg_tpu.train import Trainer, TrainConfig

        ds = get_tensor_data(["CCO", "CCC", "CCN", "CCO"],
                             [1.0, 2.0, 3.0, 4.0], progress=False)
        model = GraphTransformerNet(node_dim_in=140, edge_dim_in=39,
                                    hidden_dim=16, num_gt_layers=1,
                                    num_heads=2, dropout=0.0, norm="ln")
        cfg = TrainConfig(endpoints=("y",), epochs=1, batch_train=4,
                          node_multiple=32, edge_multiple=32,
                          loss="mae", w_tau=0.0)
        trainer = Trainer(model, cfg)
        sample = next(iter_batches(ds, 4, node_multiple=32,
                                   edge_multiple=32))
        state = trainer.init_state(sample)
        mask = freeze_mask(state["params"], components="all",
                           exclude="heads")
        trainer.frozen_mask = mask
        before = jax.tree_util.tree_map(np.asarray, state["params"])
        state, _, _ = trainer.train_epoch(
            state, ds, jnp.ones((1,)), 1, jax.random.PRNGKey(0))
        after = state["params"]
        # frozen: unchanged
        np.testing.assert_array_equal(
            before["node_emb"]["kernel"],
            np.asarray(after["node_emb"]["kernel"]))
        np.testing.assert_array_equal(
            before["gt_layer_0"]["WQ"]["kernel"],
            np.asarray(after["gt_layer_0"]["WQ"]["kernel"]))
        # heads: updated
        assert not np.array_equal(
            before["mu_mlp"]["output_linear"]["kernel"],
            np.asarray(after["mu_mlp"]["output_linear"]["kernel"]))


class TestMetrics:
    def test_official_perfect(self):
        y = np.array([1.0, 2.0, 3.0, 4.0])
        m = official_metrics(y, y)
        assert m["MAE"] == 0.0
        assert m["RAE"] == 0.0
        assert m["R2"] == pytest.approx(1.0)
        assert m["Spearman R"] == pytest.approx(1.0)
        assert m["Kendall's Tau"] == pytest.approx(1.0)

    def test_constant_predictions_nan_rank(self):
        y = np.array([1.0, 2.0, 3.0])
        p = np.array([2.0, 2.0, 2.0])
        m = official_metrics(y, p)
        assert np.isnan(m["Spearman R"])

    def test_macro_average_skips_average_row(self):
        d = {"A": {"MAE": 1.0, "RAE": 0.5, "R2": 0.9, "Spearman R": 0.8,
                   "Kendall's Tau": 0.7},
             "Average": {"MAE": 99.0}}
        avg = macro_official_avg(d)
        assert avg["MAE"] == 1.0

    def test_bootstrap_shrinks_with_agreement(self):
        rng = np.random.default_rng(0)
        y = rng.standard_normal(200)
        bs = bootstrap_metrics(y, y + 0.1 * rng.standard_normal(200),
                               n_boot=50)
        assert bs["MAE"]["std"] < 0.05

    def test_evaluate_predictions_average(self):
        y = np.array([[1.0, 2.0], [2.0, 3.0], [3.0, 1.0], [0.0, 4.0]])
        p = y + 0.1
        m = np.ones_like(y)
        out = evaluate_predictions(y, p, m, ["a", "b"])
        assert out["Average"]["MAE"] == pytest.approx(0.1, abs=1e-6)


class TestDatasets:
    def test_inverse_log_transform(self):
        import pandas as pd

        from gt_pyg_tpu.data.datasets import inverse_log_transform_assay_data

        df = pd.DataFrame({
            "SMILES": ["C"], "Molecule Name": ["m1"],
            "LogD": [1.5], "LogS": [-4.0],
        })
        out, _ = inverse_log_transform_assay_data(df)
        assert out["LogD"][0] == pytest.approx(1.5)  # not log-scaled
        # KSOL: (10**-4)/1e-6 - 1 = 99.0
        assert out["KSOL"][0] == pytest.approx(99.0)

    def test_forward_log_transform_roundtrips_inverse(self):
        import pandas as pd

        from gt_pyg_tpu.data.datasets import (
            inverse_log_transform_assay_data, log_transform_assay_data)

        df = pd.DataFrame({
            "SMILES": ["C", "CC"], "Molecule Name": ["m1", "m2"],
            "LogD": [1.5, -0.3], "LogS": [-4.0, -5.2],
            "Log_HLM_CLint": [1.2, 2.1],
        })
        raw, _ = inverse_log_transform_assay_data(df)
        back = log_transform_assay_data(raw)
        for col in ("LogD", "LogS", "Log_HLM_CLint"):
            np.testing.assert_allclose(back[col].values, df[col].values,
                                       rtol=1e-12)

    def test_clip_to_train_range(self):
        from gt_pyg_tpu.data.datasets import clip_to_train_range

        preds = np.array([[-5.0], [0.5], [9.0]])
        out = clip_to_train_range(preds, [0.0], [1.0], delta=0.0)
        np.testing.assert_allclose(out.ravel(), [0.0, 0.5, 1.0])

    def test_shuffle_split_deterministic(self):
        import pandas as pd

        from gt_pyg_tpu.data.datasets import shuffle_split

        df = pd.DataFrame({"x": range(100)})
        a1, b1 = shuffle_split(df, seed=42)
        a2, b2 = shuffle_split(df, seed=42)
        assert a1["x"].tolist() == a2["x"].tolist()
        assert len(a1) == 80 and len(b1) == 20


class TestMultichip:
    def test_dryrun_8_devices(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_edge_partitioned_forward(self):
        from gt_pyg_tpu.data import get_tensor_data, pad_graph_batch
        from gt_pyg_tpu.nn import GraphTransformerNet
        from gt_pyg_tpu.parallel import (
            make_mesh, shard_flat_batch, make_edge_partitioned_apply)

        ds = get_tensor_data(["CCO", "c1ccccc1", "CC(=O)O", "CCN"] * 4,
                             [1.0] * 16, progress=False)
        batch = pad_graph_batch(ds, node_multiple=64, edge_multiple=64)
        model = GraphTransformerNet(node_dim_in=140, edge_dim_in=39,
                                    hidden_dim=16, num_gt_layers=1,
                                    num_heads=2, dropout=0.0, norm="ln")
        v = model.init({"params": jax.random.PRNGKey(0)}, batch,
                       deterministic=True)
        # single-device reference
        ref, _ = model.apply(v, batch, deterministic=True)

        mesh = make_mesh({"data": 8})
        sharded = shard_flat_batch(
            jax.tree_util.tree_map(jnp.asarray, batch), mesh)
        fwd = make_edge_partitioned_apply(model, mesh)
        pred, log_var = fwd(v["params"], v.get("batch_stats", {}), sharded)
        np.testing.assert_allclose(np.asarray(pred), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


class TestBnFreeze:
    def test_frozen_bn_stats_unchanged(self):
        """Frozen components keep their BatchNorm running stats
        (reference BN-eval-on-freeze, model.py:374-385)."""
        from gt_pyg_tpu.data import get_tensor_data
        from gt_pyg_tpu.data.loader import iter_batches
        from gt_pyg_tpu.nn import GraphTransformerNet
        from gt_pyg_tpu.train import Trainer, TrainConfig
        from gt_pyg_tpu.train.freeze import freeze_mask

        ds = get_tensor_data(["CCO", "CCC", "CCN", "CCCO"],
                             [1.0, 2.0, 3.0, 4.0], progress=False)
        model = GraphTransformerNet(node_dim_in=140, edge_dim_in=39,
                                    hidden_dim=16, num_gt_layers=1,
                                    num_heads=2, dropout=0.0, norm="bn")
        cfg = TrainConfig(endpoints=("y",), epochs=1, batch_train=4,
                          node_multiple=32, edge_multiple=32, loss="mae")
        trainer = Trainer(model, cfg)
        sample = next(iter_batches(ds, 4, node_multiple=32,
                                   edge_multiple=32))
        state = trainer.init_state(sample)
        trainer.frozen_mask = freeze_mask(state["params"], "encoder")
        trainer.frozen_bstats_mask = freeze_mask(state["batch_stats"],
                                                 "encoder", num_layers=1)
        before = jax.tree_util.tree_map(np.asarray, state["batch_stats"])
        state, _, _ = trainer.train_epoch(state, ds, jnp.ones((1,)), 1,
                                          jax.random.PRNGKey(0))
        after = state["batch_stats"]
        np.testing.assert_array_equal(
            before["input_norm"]["mean"],
            np.asarray(after["input_norm"]["mean"]))
        # unfrozen readout BN did update
        assert not np.array_equal(
            before["readout_norm"]["mean"],
            np.asarray(after["readout_norm"]["mean"]))

    def test_mask_set_after_compile_retraces(self):
        """Assigning frozen_bstats_mask AFTER the train step has compiled
        must still take effect — the mask is read at trace time, so the
        setter drops the compiled steps (round-4 ADVICE fix)."""
        from gt_pyg_tpu.data import get_tensor_data
        from gt_pyg_tpu.data.loader import iter_batches
        from gt_pyg_tpu.nn import GraphTransformerNet
        from gt_pyg_tpu.train import Trainer, TrainConfig
        from gt_pyg_tpu.train.freeze import freeze_mask

        ds = get_tensor_data(["CCO", "CCC", "CCN", "CCCO"],
                             [1.0, 2.0, 3.0, 4.0], progress=False)
        model = GraphTransformerNet(node_dim_in=140, edge_dim_in=39,
                                    hidden_dim=16, num_gt_layers=1,
                                    num_heads=2, dropout=0.0, norm="bn")
        cfg = TrainConfig(endpoints=("y",), epochs=1, batch_train=4,
                          node_multiple=32, edge_multiple=32, loss="mae")
        trainer = Trainer(model, cfg)
        sample = next(iter_batches(ds, 4, node_multiple=32,
                                   edge_multiple=32))
        state = trainer.init_state(sample)
        # compile the step with NO mask first
        state, _, _ = trainer.train_epoch(state, ds, jnp.ones((1,)), 1,
                                          jax.random.PRNGKey(0))
        # now freeze — a stale compiled step would keep updating stats
        trainer.frozen_mask = freeze_mask(state["params"], "encoder")
        trainer.frozen_bstats_mask = freeze_mask(state["batch_stats"],
                                                 "encoder", num_layers=1)
        before = jax.tree_util.tree_map(np.asarray, state["batch_stats"])
        state, _, _ = trainer.train_epoch(state, ds, jnp.ones((1,)), 2,
                                          jax.random.PRNGKey(1))
        after = state["batch_stats"]
        np.testing.assert_array_equal(
            before["input_norm"]["mean"],
            np.asarray(after["input_norm"]["mean"]))
        assert not np.array_equal(
            before["readout_norm"]["mean"],
            np.asarray(after["readout_norm"]["mean"]))

    def test_frozen_bn_forward_uses_running_stats(self):
        """Reference BN-eval-on-freeze FORWARD semantics
        (model.py:374-385): a frozen component's BatchNorm normalizes
        with RUNNING stats during training, so (with dropout 0 and
        zero_var) the train-mode forward of a fully-frozen model equals
        its eval-mode forward — while the unfrozen train-mode forward
        (batch moments) differs."""
        import jax

        from gt_pyg_tpu.data import get_tensor_data, pad_graph_batch
        from gt_pyg_tpu.nn import GraphTransformerNet

        ds = get_tensor_data(["CCO", "CCC", "CCN", "CCCO"],
                             [1.0, 2.0, 3.0, 4.0], progress=False)
        batch = pad_graph_batch(ds, node_multiple=32, edge_multiple=32,
                                graph_pad=4)
        model = GraphTransformerNet(node_dim_in=140, edge_dim_in=39,
                                    hidden_dim=16, num_gt_layers=2,
                                    num_heads=2, dropout=0.0, norm="bn")
        v = model.init({"params": jax.random.PRNGKey(0)}, batch,
                       deterministic=True)
        rngs = {"dropout": jax.random.PRNGKey(1),
                "reparam": jax.random.PRNGKey(2)}
        frozen_all = ("input_norm", "gt_layer_0", "gt_layer_1",
                      "readout_norm")

        eval_pred, _ = model.apply(v, batch, deterministic=True)
        (train_frozen, _), _ = model.apply(
            v, batch, deterministic=False, zero_var=True,
            frozen_norms=frozen_all, rngs=rngs, mutable=["batch_stats"])
        (train_live, _), _ = model.apply(
            v, batch, deterministic=False, zero_var=True,
            rngs=rngs, mutable=["batch_stats"])

        np.testing.assert_allclose(np.asarray(train_frozen),
                                   np.asarray(eval_pred),
                                   rtol=1e-5, atol=1e-6)
        assert not np.allclose(np.asarray(train_live),
                               np.asarray(eval_pred), atol=1e-3)

        # partial freeze: differs from both the fully-live and the
        # fully-frozen forwards
        (train_part, _), _ = model.apply(
            v, batch, deterministic=False, zero_var=True,
            frozen_norms=("gt_layer_0",), rngs=rngs,
            mutable=["batch_stats"])
        assert not np.allclose(np.asarray(train_part),
                               np.asarray(eval_pred), atol=1e-3)
        assert not np.allclose(np.asarray(train_part),
                               np.asarray(train_live), atol=1e-3)

    def test_trainer_derives_frozen_norms_from_bstats_mask(self):
        from gt_pyg_tpu.data import get_tensor_data
        from gt_pyg_tpu.data.loader import iter_batches
        from gt_pyg_tpu.nn import GraphTransformerNet
        from gt_pyg_tpu.train import Trainer, TrainConfig
        from gt_pyg_tpu.train.freeze import freeze_mask

        ds = get_tensor_data(["CCO", "CCC"], [1.0, 2.0], progress=False)
        model = GraphTransformerNet(node_dim_in=140, edge_dim_in=39,
                                    hidden_dim=16, num_gt_layers=2,
                                    num_heads=2, dropout=0.0, norm="bn")
        cfg = TrainConfig(endpoints=("y",), epochs=1, batch_train=2,
                          node_multiple=32, edge_multiple=32, loss="mae")
        trainer = Trainer(model, cfg)
        sample = next(iter_batches(ds, 2, node_multiple=32,
                                   edge_multiple=32))
        state = trainer.init_state(sample)
        assert trainer._frozen_norm_names() == ()
        trainer.frozen_bstats_mask = freeze_mask(state["batch_stats"],
                                                 "encoder", num_layers=2)
        assert trainer._frozen_norm_names() == (
            "gt_layer_0", "gt_layer_1", "input_norm")
