"""Data-parallel training through the production Trainer path
(cfg.mesh_devices > 1): shard_map + psum over an 8-virtual-device CPU
mesh, with cross-replica BatchNorm and the same per-device step body as
single-device training (VERDICT r1 item 3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gt_pyg_tpu.data import get_tensor_data
from gt_pyg_tpu.nn import GraphTransformerNet
from gt_pyg_tpu.train import Trainer, TrainConfig


@pytest.fixture(scope="module")
def graphs():
    return get_tensor_data(
        ["CCO", "c1ccccc1", "CC(=O)O", "CCCC", "CCN",
         "CC(=O)Nc1ccc(O)cc1", "c1ccncc1", "C1CCCCC1"],
        [[float(i) / 4.0] for i in range(8)], progress=False)


def _model(**over):
    cfg = dict(node_dim_in=140, edge_dim_in=39, hidden_dim=32,
               num_gt_layers=2, num_heads=4, dropout=0.0, norm="bn",
               gate=True, gt_aggregators=("sum", "mean"),
               aggregators=("sum", "mean", "max", "std"), num_tasks=1)
    cfg.update(over)
    return GraphTransformerNet(**cfg)


def _cfg(**over):
    base = dict(endpoints=("LogD",), epochs=2, batch_train=8,
                batch_eval=8, loss="mae", zero_var=True,
                device_data=False, node_multiple=128, edge_multiple=128,
                log_every=100, warmup_epochs=1, t_max=2)
    base.update(over)
    return TrainConfig(**base)


class TestTrainerDP:
    def test_fit_runs_on_8_device_mesh(self, graphs):
        model = _model(bn_axis_name="data")
        trainer = Trainer(model, _cfg(mesh_devices=8))
        assert trainer.mesh is not None
        sample_batch = _sample(graphs)
        state = trainer.init_state(sample_batch)
        result = trainer.fit(state, graphs, graphs)
        assert len(result["history"]) == 2
        assert np.isfinite(result["history"][-1]["train_loss"])
        assert np.isfinite(result["history"][-1]["val_loss"])

    def test_dp_step_matches_single_device(self, graphs):
        """One epoch of 8-way DP == one epoch single-device (same init,
        MAE loss, no dropout): pmean of per-shard grads over equal-size
        shards with synced BN reproduces the global-batch step."""
        m_dp = _model(bn_axis_name="data")
        m_sd = _model()
        t_dp = Trainer(m_dp, _cfg(mesh_devices=8))
        t_sd = Trainer(m_sd, _cfg())

        state0 = t_sd.init_state(_sample(graphs))
        ts = jnp.ones((1,), jnp.float32)
        rng = jax.random.PRNGKey(0)
        s_dp, loss_dp, _ = t_dp.train_epoch(
            dict(state0), graphs, ts, epoch=1, rng=rng)
        s_sd, loss_sd, _ = t_sd.train_epoch(
            dict(state0), graphs, ts, epoch=1, rng=rng)
        assert np.isclose(loss_dp, loss_sd, rtol=1e-4, atol=1e-5)
        # Adam's first step pushes near-zero gradients to ±lr, so float
        # noise between the two execution orders flips a small fraction
        # of updates by ~2*lr; require closeness at that floor plus
        # near-total elementwise agreement, then functional agreement on
        # the NEXT epoch's loss (which sees the epoch-1 params).
        from jax.flatten_util import ravel_pytree

        p_dp, _ = ravel_pytree(s_dp["params"])
        p_sd, _ = ravel_pytree(s_sd["params"])
        diff = np.abs(np.asarray(p_dp) - np.asarray(p_sd))
        assert diff.max() < 3e-3
        assert (diff < 1e-5).mean() > 0.99
        _, loss_dp2, _ = t_dp.train_epoch(s_dp, graphs, ts, epoch=2,
                                          rng=rng)
        _, loss_sd2, _ = t_sd.train_epoch(s_sd, graphs, ts, epoch=2,
                                          rng=rng)
        assert np.isclose(loss_dp2, loss_sd2, rtol=1e-3, atol=1e-4)

    def test_dp_with_tile_kernel(self, graphs):
        model = _model(bn_axis_name="data", attn_impl="tile")
        trainer = Trainer(model, _cfg(mesh_devices=4, tile_edges=96,
                                      tiles_multiple=1))
        state = trainer.init_state(_sample(graphs, tile_edges=96))
        ts = jnp.ones((1,), jnp.float32)
        state, loss, _ = trainer.train_epoch(
            state, graphs, ts, epoch=1, rng=jax.random.PRNGKey(0))
        assert np.isfinite(loss)

    def test_dp_with_production_fast_path(self, graphs):
        """bf16 + norm folding + tile kernel under a 4-device DP mesh:
        the step must run and train (finite loss), protecting the
        multi-chip story for the shipped v4 fast path (GT_TPU_PROJ=auto
        resolves to the split kernel since the round-4 demotion)."""
        import jax.numpy as jnp_

        model = _model(bn_axis_name="data", attn_impl="tile",
                       norm_fold="on", dtype=jnp_.bfloat16)
        trainer = Trainer(model, _cfg(mesh_devices=4, tile_edges=96,
                                      tiles_multiple=1))
        state = trainer.init_state(_sample(graphs, tile_edges=96))
        ts = jnp.ones((1,), jnp.float32)
        state, loss1, _ = trainer.train_epoch(
            state, graphs, ts, epoch=1, rng=jax.random.PRNGKey(0))
        assert np.isfinite(loss1)

    def test_dp_with_proj_fused_kernel(self, graphs):
        """GT_TPU_PROJ=on (the v5 projection-fused kernel, kept in-tree
        behind the flag since its round-4 perf demotion) under a
        4-device DP mesh — the fused kernel's only multi-device
        coverage (ADVICE r4)."""
        import os

        import jax.numpy as jnp_

        old = os.environ.get("GT_TPU_PROJ")
        os.environ["GT_TPU_PROJ"] = "on"
        try:
            model = _model(bn_axis_name="data", attn_impl="tile",
                           norm_fold="on", dtype=jnp_.bfloat16)
            trainer = Trainer(model, _cfg(mesh_devices=4, tile_edges=96,
                                          tiles_multiple=1))
            state = trainer.init_state(_sample(graphs, tile_edges=96))
            ts = jnp.ones((1,), jnp.float32)
            state, loss1, _ = trainer.train_epoch(
                state, graphs, ts, epoch=1, rng=jax.random.PRNGKey(0))
            assert np.isfinite(loss1)
        finally:
            if old is None:
                os.environ.pop("GT_TPU_PROJ", None)
            else:
                os.environ["GT_TPU_PROJ"] = old

    def test_dp_with_pooling_moments_kernel(self, graphs, monkeypatch):
        """GT_TPU_POOL=matmul (the round-5 MXU pooling-moments kernel,
        auto-on for the bf16 TPU fast path) under a 4-device DP mesh:
        pallas_call inside shard_map with per-shard segment ids — the
        kernel's multi-device coverage. The DP epoch must match the
        scatter-pooling epoch bit-for-bit is NOT required (summation
        order differs); finite-and-close is."""
        import jax.numpy as jnp_

        def one_epoch():
            model = _model(bn_axis_name="data", attn_impl="tile",
                           norm_fold="on", dtype=jnp_.bfloat16)
            trainer = Trainer(model, _cfg(mesh_devices=4, tile_edges=96,
                                          tiles_multiple=1))
            state = trainer.init_state(_sample(graphs, tile_edges=96))
            ts = jnp.ones((1,), jnp.float32)
            _, loss, _ = trainer.train_epoch(
                state, graphs, ts, epoch=1, rng=jax.random.PRNGKey(0))
            return float(loss)

        monkeypatch.setenv("GT_TPU_POOL", "off")
        ref = one_epoch()
        monkeypatch.setenv("GT_TPU_POOL", "matmul")
        got = one_epoch()
        assert np.isfinite(got)
        np.testing.assert_allclose(got, ref, rtol=2e-2)

    def test_too_many_devices_raises(self, graphs):
        with pytest.raises(ValueError, match="devices are visible"):
            Trainer(_model(), _cfg(mesh_devices=999))


class TestMeshParsing:
    def test_parse_forms(self):
        from gt_pyg_tpu.cli import _parse_mesh

        assert _parse_mesh(None) == 1
        assert _parse_mesh("4") == 4
        assert _parse_mesh("data=8") == 8
        assert _parse_mesh("auto") == len(jax.devices())
        with pytest.raises(ValueError, match="data"):
            _parse_mesh("model=4")


def _sample(graphs, tile_edges=None):
    from gt_pyg_tpu.data import pad_graph_batch

    if tile_edges:
        return pad_graph_batch(graphs, tile_edges=tile_edges)
    return pad_graph_batch(graphs, node_multiple=128, edge_multiple=128,
                           use_native=False)
