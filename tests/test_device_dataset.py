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
