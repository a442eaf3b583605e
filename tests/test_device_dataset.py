"""Device-resident dataset: on-device materialization must be bit-exact
with the host packer (the contract everything downstream relies on)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gt_pyg_tpu.data import get_tensor_data, pad_graph_batch
from gt_pyg_tpu.data.device_dataset import (
    DeviceDataset, materialize_batch)


@pytest.fixture(scope="module")
def graphs():
    return get_tensor_data(
        ["CCO", "c1ccccc1", "CC(=O)O", "C", "CCN", "CC(=O)Nc1ccc(O)cc1"],
        [[1.0], [2.0], [np.nan], [4.0], [5.0], [6.0]], progress=False)


class TestMaterialization:
    @pytest.mark.parametrize("ids", [[0, 1, 2], [3, 0, 5], [4], [5, 4, 3,
                                                                 2, 1, 0]])
    def test_bit_exact_vs_packer(self, graphs, ids):
        dd = DeviceDataset(graphs)
        ib = dd.index_batch(ids, node_pad=64, edge_pad=64,
                            graph_pad=len(ids) + 1)
        got = materialize_batch(
            dd.device_tree(), jax.tree_util.tree_map(jnp.asarray, ib),
            dd.static_meta())
        want = pad_graph_batch([graphs[i] for i in ids], node_pad=64,
                               edge_pad=64, graph_pad=len(ids) + 1,
                               use_native=False)
        for f in dataclasses.fields(want):
            a = np.asarray(getattr(got, f.name))
            b = np.asarray(getattr(want, f.name))
            if f.name == "edge_perm_src":
                # any stable src-sort permutation is acceptable
                np.testing.assert_array_equal(
                    np.asarray(got.edge_src)[a],
                    np.asarray(want.edge_src)[b])
            else:
                np.testing.assert_array_equal(a, b, err_msg=f.name)

    def test_under_jit(self, graphs):
        dd = DeviceDataset(graphs)
        ib = dd.index_batch([1, 2], node_pad=32, edge_pad=32, graph_pad=2)

        @jax.jit
        def f(tree, ib):
            b = materialize_batch(tree, ib, dd.static_meta())
            return b.node_x.sum(), b.edge_dst

        s, dst = f(dd.device_tree(),
                   jax.tree_util.tree_map(jnp.asarray, ib))
        assert np.isfinite(float(s))
        assert np.all(np.diff(np.asarray(dst).astype(np.int64)) >= 0)

    def test_iter_covers_dataset(self, graphs):
        dd = DeviceDataset(graphs)
        seen = []
        for ib in dd.iter_index_batches(4, shuffle=True,
                                        rng=np.random.default_rng(0),
                                        node_multiple=32, edge_multiple=32):
            ids = np.asarray(ib.graph_ids)
            seen.extend(ids[ids < dd.num_graphs_total].tolist())
        assert sorted(seen) == list(range(len(graphs)))

    def test_overflow_raises(self, graphs):
        dd = DeviceDataset(graphs)
        with pytest.raises(ValueError, match="padding too small"):
            dd.index_batch([0, 1, 2, 3, 4, 5], node_pad=4, edge_pad=64,
                           graph_pad=8)

    def test_label_gather(self, graphs):
        dd = DeviceDataset(graphs)
        ib = dd.index_batch([2, 0], node_pad=32, edge_pad=32, graph_pad=3)
        got = materialize_batch(
            dd.device_tree(), jax.tree_util.tree_map(jnp.asarray, ib),
            dd.static_meta())
        np.testing.assert_array_equal(np.asarray(got.y_mask)[:, 0],
                                      [0.0, 1.0, 0.0])  # NaN label masked


class TestStableTileCount:
    """stable_tile_count pins ONE batch shape across shuffled epochs and
    decorrelated member streams — the vmapped ensemble compiles once
    (round-4 incident: per-step shape wobble = one multi-minute XLA
    compile per distinct shape)."""

    def test_single_unified_shape_across_epochs_and_members(self, graphs):
        gs = graphs * 12                       # 72 graphs, varied sizes
        dd = DeviceDataset(gs, num_tasks=1)
        ft = dd.stable_tile_count(8, 32, tiles_multiple=2,
                                  tile_pack="ffd")
        shapes = set()
        for ep in range(4):
            iters = zip(*[dd.iter_index_batches(
                8, shuffle=True,
                rng=np.random.default_rng(1_000_003 * (s + 1) + ep),
                tile_edges=32, tiles_multiple=2, tile_pack="ffd",
                min_tiles=ft) for s in range(3)])
            for step_ibs in iters:
                u = dd.unify_and_stack(step_ibs)
                shapes.add((u.node_gather.shape, u.edge_gather.shape))
        assert len(shapes) == 1, shapes

    def test_min_tiles_floor_and_cache(self, graphs):
        dd = DeviceDataset(graphs, num_tasks=1)
        ft = dd.stable_tile_count(4, 32, tiles_multiple=2,
                                  tile_pack="ffd")
        assert ft % 2 == 0 and ft >= 2
        assert dd.stable_tile_count(4, 32, tiles_multiple=2,
                                    tile_pack="ffd") == ft  # cached
        ib = dd.index_batch_tiled([0, 1], 32, 4, tiles_multiple=2,
                                  tile_pack="ffd", min_tiles=ft)
        assert ib.node_gather.shape[0] == ft * 128
        assert ib.edge_gather.shape[0] == ft * 32
        # materialization of a floor-padded batch stays valid
        got = dd.materialize(ib)
        ref = pad_graph_batch([graphs[0], graphs[1]], tile_edges=32,
                              graph_pad=4, tiles_multiple=ft,
                              tile_pack="ffd")
        np.testing.assert_allclose(np.asarray(got.node_x),
                                   np.asarray(ref.node_x))
