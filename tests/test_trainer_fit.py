"""End-to-end Trainer.fit coverage: best-state tracking, history,
callbacks, restore_state round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gt_pyg_tpu.data import get_tensor_data
from gt_pyg_tpu.data.loader import iter_batches
from gt_pyg_tpu.nn import GraphTransformerNet
from gt_pyg_tpu.train import Trainer, TrainConfig


@pytest.fixture(scope="module")
def setup():
    smis = ["CCO", "CCC", "CCN", "CCCO", "c1ccccc1", "CC(=O)O",
            "CCOC", "CCCC"]
    ds = get_tensor_data(smis, list(np.linspace(0.0, 3.0, len(smis))),
                         progress=False)
    model = GraphTransformerNet(node_dim_in=140, edge_dim_in=39,
                                hidden_dim=16, num_gt_layers=1,
                                num_heads=2, dropout=0.0, norm="ln")
    cfg = TrainConfig(endpoints=("y",), epochs=3, batch_train=4,
                      batch_eval=8, node_multiple=32, edge_multiple=64,
                      loss="mae", log_every=10, warmup_epochs=1, t_max=3)
    trainer = Trainer(model, cfg)
    sample = next(iter_batches(ds, 4, node_multiple=32, edge_multiple=64))
    state = trainer.init_state(sample)
    return trainer, state, ds


class TestFit:
    def test_fit_returns_best_and_history(self, setup):
        trainer, state, ds = setup
        res = trainer.fit(state, ds[:6], ds[6:])
        assert len(res["history"]) == 3

    def test_fit_streaming_path(self, setup):
        """The host-streaming (non device-resident) data path."""
        import dataclasses

        trainer, state, ds = setup
        cfg = dataclasses.replace(trainer.cfg, device_data=False)
        from gt_pyg_tpu.train import Trainer

        t2 = Trainer(trainer.model, cfg)
        res = t2.fit(t2.init_state(
            __import__("gt_pyg_tpu.data.loader", fromlist=["iter_batches"])
            .iter_batches(ds, 4, node_multiple=32,
                          edge_multiple=64).__next__()), ds[:6], ds[6:])
        assert len(res["history"]) == 3
        assert res["best"]["state"] is not None
        assert np.isfinite(res["best"]["val_rae"])
        assert "y" in res["per_endpoint_best"]
        assert res["task_scale"].shape == (1,)

    def test_callbacks_invoked(self, setup):
        trainer, state, ds = setup
        seen = []
        trainer.fit(state, ds[:6], ds[6:],
                    callbacks=[lambda ep, st, h: seen.append(ep)])
        assert seen == [1, 2, 3]

    def test_restore_state_round_trip(self, setup, tmp_path):
        from gt_pyg_tpu.checkpoint import save_checkpoint

        trainer, state, ds = setup
        res = trainer.fit(state, ds[:6], ds[6:])
        st = res["state"]
        save_checkpoint(tmp_path / "r", model_state={
            "params": st["params"], "batch_stats": st["batch_stats"]},
            config=trainer.model.get_config(),
            optimizer_state=st["opt_state"], epoch=3)
        sample = next(iter_batches(ds, 4, node_multiple=32,
                                   edge_multiple=64))
        state2, epoch = trainer.restore_state(sample, tmp_path / "r.ckpt")
        assert epoch == 4
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(st["params"])[0]),
            np.asarray(jax.tree_util.tree_leaves(state2["params"])[0]))
        # optimizer moments restored too
        l1 = jax.tree_util.tree_leaves(st["opt_state"])
        l2 = jax.tree_util.tree_leaves(state2["opt_state"])
        assert any(np.asarray(a).size > 1 and np.allclose(a, b)
                   for a, b in zip(l1, l2))

    def test_predict_shapes(self, setup):
        trainer, state, ds = setup
        preds = trainer.predict(state, ds)
        assert preds.shape == (len(ds), 1)


class TestEMA:
    def test_ema_stream_tracked_and_distinct(self, setup):
        """cfg.ema_decay tracks a val-selected EMA state alongside the
        raw stream: returned, finite, and (after >1 epoch of updates)
        parameter-distinct from the raw best state."""
        import dataclasses

        trainer, state, ds = setup
        cfg = dataclasses.replace(trainer.cfg, ema_decay=0.5)
        t = Trainer(trainer.model, cfg)
        res = t.fit(t.init_state(
            next(iter_batches(ds, 4, node_multiple=32, edge_multiple=64))),
            ds[:6], ds[6:])
        be = res["best_ema"]
        assert be["state"] is not None and np.isfinite(be["val_rae"])
        assert be["epoch"] >= 1
        raw = res["best"]["state"]["params"]
        ema = be["state"]["params"]
        leaves_r = jax.tree_util.tree_leaves(raw)
        leaves_e = jax.tree_util.tree_leaves(ema)
        assert any(not np.allclose(np.asarray(a), np.asarray(b))
                   for a, b in zip(leaves_r, leaves_e))

    def test_ema_off_by_default(self, setup):
        trainer, state, ds = setup
        res = trainer.fit(state, ds[:6], ds[6:])
        assert res["best_ema"]["state"] is None
