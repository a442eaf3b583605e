"""VmapEnsembleTrainer: per-member equivalence with the single-model
Trainer, member diversity, best-state tracking, checkpoint compatibility.

The vmapped ensemble is the TPU-native answer to the reference's 9
sequential member runs (compare_predictions.ipynb "beardy-polonium"
ensemble) — the member axis must change WHAT is batched, not the math,
so a vmapped member step must reproduce the single-member step exactly
under the same PRNG key.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gt_pyg_tpu.data import get_tensor_data
from gt_pyg_tpu.data.loader import iter_batches
from gt_pyg_tpu.nn import GraphTransformerNet
from gt_pyg_tpu.train import Trainer, TrainConfig, VmapEnsembleTrainer


@pytest.fixture(scope="module")
def setup():
    smis = ["CCO", "CCC", "CCN", "CCCO", "c1ccccc1", "CC(=O)O",
            "CCOC", "CCCC", "CCNC", "CC(C)O"]
    y = [[v, v * 0.5] for v in np.linspace(0.0, 3.0, len(smis))]
    ds = get_tensor_data(smis, y, progress=False)
    model = GraphTransformerNet(node_dim_in=140, edge_dim_in=39,
                                hidden_dim=16, num_gt_layers=1,
                                num_heads=2, dropout=0.1, norm="bn",
                                gate=True, num_tasks=2)
    cfg = TrainConfig(endpoints=("a", "b"), epochs=4, batch_train=4,
                      batch_eval=8, node_multiple=32, edge_multiple=64,
                      loss="mae", log_every=10, warmup_epochs=1, t_max=4)
    return model, cfg, ds


def _tree_allclose(a, b, **kw):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    assert len(leaves_a) == len(leaves_b)
    for x, y in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y, np.float64), **kw)


class TestStepEquivalence:
    def test_m1_vmapped_step_matches_single_trainer_step(self, setup):
        """A 1-member vmapped step must equal the plain Trainer step
        bit-for-bit under the same key and batch."""
        model, cfg, ds = setup
        trainer = Trainer(model, cfg)
        sample = next(iter_batches(ds, 4, node_multiple=32,
                                   edge_multiple=64, num_tasks=2))
        state = trainer.init_state(sample, rng=jax.random.PRNGKey(1000))
        ens = VmapEnsembleTrainer(model, cfg, num_members=1,
                                  member_seeds=[1000])
        states = ens.init_states(sample)
        _tree_allclose(states["params"],
                       jax.tree_util.tree_map(lambda x: x[None],
                                              state["params"]))

        jb = jax.tree_util.tree_map(jnp.asarray, sample)
        lr = jnp.asarray(1e-3, jnp.float32)
        ts = jnp.ones((2,), jnp.float32)
        key = jax.random.PRNGKey(7)
        new_state, loss, ok = trainer._train_step_impl(state, jb, lr, ts,
                                                       key)

        def one(s, r):
            return trainer._train_step_impl(s, jb, lr, ts, r)

        new_states, losses, oks = jax.vmap(one)(states, key[None])
        assert losses.shape == (1,)
        np.testing.assert_allclose(float(losses[0]), float(loss),
                                   rtol=1e-6)
        _tree_allclose(
            new_states["params"],
            jax.tree_util.tree_map(lambda x: x[None], new_state["params"]),
            rtol=1e-6, atol=1e-7)


class TestDecorrelate:
    """Per-member minibatch streams (round-4): repadded+stacked recipes
    must materialize exactly like the originals, and members must see
    different batches at the same step."""

    def _dd(self, ds):
        from gt_pyg_tpu.data.device_dataset import DeviceDataset

        return DeviceDataset(ds)

    def _assert_same_real_rows(self, ref, got, nn, ne, ng):
        np.testing.assert_array_equal(np.asarray(got.node_x)[:nn],
                                      np.asarray(ref.node_x)[:nn])
        np.testing.assert_array_equal(np.asarray(got.edge_src)[:ne],
                                      np.asarray(ref.edge_src)[:ne])
        np.testing.assert_array_equal(np.asarray(got.edge_dst)[:ne],
                                      np.asarray(ref.edge_dst)[:ne])
        np.testing.assert_array_equal(np.asarray(got.y)[:ng],
                                      np.asarray(ref.y)[:ng])
        assert float(np.asarray(got.node_mask).sum()) == nn
        assert float(np.asarray(got.edge_mask).sum()) == ne

    @pytest.mark.parametrize("tiled", [False, True])
    def test_repad_materializes_identically(self, setup, tiled):
        _, _, ds = setup
        dd = self._dd(ds)
        ids = [0, 3, 4]
        if tiled:
            ib = dd.index_batch_tiled(ids, tile_edges=64, graph_pad=4)
            big = dd.repad(ib, ib.node_gather.shape[0] + 2 * 128,
                           ib.edge_gather.shape[0] + 2 * 64)
        else:
            ib = dd.index_batch(ids, node_pad=64, edge_pad=96, graph_pad=4)
            big = dd.repad(ib, 128, 160)
        ref = dd.materialize(ib)
        got = dd.materialize(big)
        nn, ne = int(ib.num_nodes), int(ib.num_edges)
        self._assert_same_real_rows(ref, got, nn, ne, len(ids))

    def test_unify_and_stack_vmap_matches_singles(self, setup):
        _, _, ds = setup
        from gt_pyg_tpu.data.device_dataset import materialize_batch

        dd = self._dd(ds)
        ib_a = dd.index_batch([0, 1, 2], node_pad=32, edge_pad=64,
                              graph_pad=4)
        ib_b = dd.index_batch([7, 8, 9, 4], node_pad=64, edge_pad=96,
                              graph_pad=4)
        stacked = dd.unify_and_stack([ib_a, ib_b])
        assert stacked.node_gather.shape == (2, 64)
        tree = dd.device_tree()
        meta = dd.static_meta()
        sj = jax.tree_util.tree_map(jnp.asarray, stacked)
        batches = jax.vmap(
            lambda one: materialize_batch(tree, one, meta))(sj)
        for k, ib in enumerate([ib_a, ib_b]):
            ref = dd.materialize(ib)
            got = jax.tree_util.tree_map(lambda x, k=k: x[k], batches)
            self._assert_same_real_rows(ref, got, int(ib.num_nodes),
                                        int(ib.num_edges),
                                        int(ib.num_graphs))

    def test_members_see_different_batches(self, setup):
        """At a given step the decorrelated members must consume
        different graph subsets (independent shuffle streams)."""
        model, cfg, ds = setup
        ens = VmapEnsembleTrainer(model, cfg, num_members=2,
                                  member_seeds=[1000, 1001])
        dd = ens.inner._get_dd(ds)
        iters = [dd.iter_index_batches(4, shuffle=True,
                                       rng=np.random.default_rng(
                                           1_000_003 * (s + 1) + 1),
                                       node_multiple=32, edge_multiple=64)
                 for s in ens.seeds]
        first = [next(it) for it in iters]
        assert not np.array_equal(first[0].graph_ids, first[1].graph_ids)

    def test_decorrelated_fit_runs(self, setup):
        model, cfg, ds = setup
        ens = VmapEnsembleTrainer(model, cfg, num_members=2,
                                  member_seeds=[1000, 1001],
                                  decorrelate=True)
        sample = next(iter_batches(ds, 4, node_multiple=32,
                                   edge_multiple=64, num_tasks=2))
        states = ens.init_states(sample)
        res = ens.fit(states, ds[:8], ds[8:])
        assert np.all(np.isfinite(res["best_rae"]))

    def test_shared_stream_mode_still_works(self, setup):
        model, cfg, ds = setup
        ens = VmapEnsembleTrainer(model, cfg, num_members=2,
                                  decorrelate=False)
        sample = next(iter_batches(ds, 4, node_multiple=32,
                                   edge_multiple=64, num_tasks=2))
        states = ens.init_states(sample)
        res = ens.fit(states, ds[:8], ds[8:])
        assert np.all(np.isfinite(res["best_rae"]))


class TestFit:
    def test_fit_members_diverge_and_track_best(self, setup, tmp_path):
        model, cfg, ds = setup
        ens = VmapEnsembleTrainer(model, cfg, num_members=2,
                                  member_seeds=[1000, 1001])
        sample = next(iter_batches(ds, 4, node_multiple=32,
                                   edge_multiple=64, num_tasks=2))
        states = ens.init_states(sample)
        res = ens.fit(states, ds[:8], ds[8:])
        assert len(res["history"]) == cfg.epochs
        assert res["best_rae"].shape == (2,)
        assert np.all(np.isfinite(res["best_rae"]))
        assert res["best_epoch"].min() >= 1
        # members must differ (different init seeds)
        p0 = ens.member_state(res["best_states"], 0)
        p1 = ens.member_state(res["best_states"], 1)
        diffs = [np.abs(a - b).max() for a, b in zip(
            jax.tree_util.tree_leaves(p0["params"]),
            jax.tree_util.tree_leaves(p1["params"]))]
        assert max(diffs) > 1e-4

        # checkpoint round trip through the standard writer
        from gt_pyg_tpu.checkpoint import (load_model_checkpoint,
                                           save_model_checkpoint)

        path = tmp_path / "member0.ckpt"
        save_model_checkpoint(model, p0, path,
                              best_metric=float(res["best_rae"][0]))
        m2, restored, _ = load_model_checkpoint(path)
        _tree_allclose(restored["params"], p0["params"], rtol=0, atol=0)

    def test_periodic_checkpoint_callback(self, setup):
        model, cfg, ds = setup
        ens = VmapEnsembleTrainer(model, cfg, num_members=2)
        sample = next(iter_batches(ds, 4, node_multiple=32,
                                   edge_multiple=64, num_tasks=2))
        states = ens.init_states(sample)
        calls = []
        ens.fit(states, ds[:8], ds[8:],
                checkpoint_cb=lambda ep, bs, br, be: calls.append(ep),
                checkpoint_every=2)
        # fires on epochs 2, 4 (=end); never before a best state exists
        assert calls == [2, 4]

    def test_eval_every_skips_selection_epochs(self, setup):
        model, cfg, ds = setup
        ens = VmapEnsembleTrainer(model, cfg, num_members=2)
        sample = next(iter_batches(ds, 4, node_multiple=32,
                                   edge_multiple=64, num_tasks=2))
        states = ens.init_states(sample)
        res = ens.fit(states, ds[:8], ds[8:], eval_every=2)
        evald = [h for h in res["history"] if "val_rae" in h]
        assert len(evald) == cfg.epochs // 2
        assert all(h["epoch"] % 2 == 0 for h in evald)

    def test_per_endpoint_selection(self, setup):
        """select_per_endpoint must track, for every (endpoint, member),
        a state whose val RAE on that endpoint is <= the average-selected
        state's (selection over a superset of epochs on the tracked
        metric itself), and the per-endpoint checkpoint callback must
        fire on the same cadence as the member one."""
        model, cfg, ds = setup
        ens = VmapEnsembleTrainer(model, cfg, num_members=2,
                                  member_seeds=[1000, 1001])
        sample = next(iter_batches(ds, 4, node_multiple=32,
                                   edge_multiple=64, num_tasks=2))
        states = ens.init_states(sample)
        calls_e = []
        # val split needs >=3 labeled graphs per endpoint for the
        # per-endpoint official metrics (per_task_metrics n>=3 gate)
        res = ens.fit(states, ds[:6], ds[6:],
                      select_per_endpoint=True,
                      checkpoint_cb=lambda ep, bs, br, be: None,
                      checkpoint_cb_per_endpoint=(
                          lambda ep, bs, br, be: calls_e.append(ep)),
                      checkpoint_every=2)
        assert calls_e == [2, 4]
        bse = res["best_states_per_endpoint"]
        bre = res["best_rae_per_endpoint"]
        bee = res["best_epoch_per_endpoint"]
        n_e, n_m = len(cfg.endpoints), 2
        assert bre.shape == (n_e, n_m)
        assert bee.shape == (n_e, n_m)
        for leaf in jax.tree_util.tree_leaves(bse["params"]):
            assert leaf.shape[:2] == (n_e, n_m)
        assert np.all(np.isfinite(bre))
        # cross-check against the history: the tracked minimum must
        # equal the min of the logged per-endpoint RAEs
        logged = np.array([h["val_rae_per_endpoint"]
                           for h in res["history"]
                           if "val_rae_per_endpoint" in h])  # [k, E, M]
        np.testing.assert_allclose(bre, np.nanmin(logged, axis=0),
                                   rtol=1e-12)
        # per-endpoint best is at least as good as the average-selected
        # epoch's RAE on that endpoint (selection optimality)
        by_epoch = {h["epoch"]: np.array(h["val_rae_per_endpoint"])
                    for h in res["history"]
                    if "val_rae_per_endpoint" in h}
        for k in range(n_m):
            avg_epoch = int(res["best_epoch"][k])
            for e in range(n_e):
                assert bre[e, k] <= by_epoch[avg_epoch][e, k] + 1e-12
        # the stored state for (e, m) must reproduce: evaluating it on
        # the val set gives exactly the tracked best RAE
        dd_va = ens.inner._get_dd(ds[6:])
        from gt_pyg_tpu.data.loader import stack_labels
        from gt_pyg_tpu.train.losses import compute_task_scales
        y_tr, m_tr = stack_labels(ds[:6])
        ts = jnp.asarray(compute_task_scales(y_tr, m_tr))
        for e in range(n_e):
            sel = jax.tree_util.tree_map(lambda x, e=e: x[e], bse)
            per_member, *_ = ens.evaluate(sel, dd_va, ts, cfg.endpoints)
            for k in range(n_m):
                got = per_member[k][cfg.endpoints[e]]["RAE"]
                np.testing.assert_allclose(got, bre[e, k], rtol=1e-5)

    def test_evaluate_per_member_shapes(self, setup):
        model, cfg, ds = setup
        ens = VmapEnsembleTrainer(model, cfg, num_members=3)
        sample = next(iter_batches(ds, 4, node_multiple=32,
                                   edge_multiple=64, num_tasks=2))
        states = ens.init_states(sample)
        dd = ens.inner._get_dd(ds)
        per_member, preds, targets, masks = ens.evaluate(
            states, dd, jnp.ones((2,), jnp.float32), cfg.endpoints)
        assert len(per_member) == 3
        assert preds.shape == (3, len(ds), 2)
        assert targets.shape == (len(ds), 2)
