"""Native C++ packer: build-on-first-use, bit-exact parity with the
numpy path, and input validation (ADVICE r1 items 1-2).

The shared library is NOT committed; these tests compile it from
``native/packer.cpp`` with portable flags (skipping when no C++
toolchain is present) and compare field-for-field against the numpy
reference implementation in ``pad_graph_batch(use_native=False)``.
"""

import shutil

import numpy as np
import pytest

from gt_pyg_tpu.data import get_tensor_data, pad_graph_batch
from gt_pyg_tpu.data.graph import GraphData

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None and shutil.which("c++") is None,
    reason="no C++ toolchain")


@pytest.fixture(scope="module")
def native():
    from gt_pyg_tpu import native as nat

    if not nat.available():
        pytest.skip("native packer could not be built")
    return nat


@pytest.fixture(scope="module")
def graphs():
    return get_tensor_data(
        ["CCO", "c1ccccc1", "CC(=O)Nc1ccc(O)cc1", "[NH4+]", "CC(C)CC",
         "c1ccncc1", "C", "CCN(CC)CC"],
        [[float(i), float(-i)] for i in range(8)], progress=False)


class TestNativeParity:
    def test_bit_exact_vs_numpy(self, native, graphs):
        a = pad_graph_batch(graphs, node_multiple=64, edge_multiple=64,
                            graph_pad=10, use_native=True)
        b = pad_graph_batch(graphs, node_multiple=64, edge_multiple=64,
                            graph_pad=10, use_native=False)
        for field in ("node_x", "edge_attr", "edge_src", "edge_dst",
                      "node_graph", "edge_perm_src", "node_mask",
                      "edge_mask", "graph_mask", "y", "y_mask"):
            np.testing.assert_array_equal(
                getattr(a, field), getattr(b, field), err_msg=field)
        assert a.num_nodes == b.num_nodes
        assert a.num_edges == b.num_edges
        assert a.num_graphs == b.num_graphs

    def test_bit_exact_no_labels(self, native, graphs):
        bare = [GraphData(x=g.x, edge_index=g.edge_index,
                          edge_attr=g.edge_attr, y=None, y_mask=None)
                for g in graphs]
        a = pad_graph_batch(bare, node_multiple=64, edge_multiple=64,
                            num_tasks=3, use_native=True)
        b = pad_graph_batch(bare, node_multiple=64, edge_multiple=64,
                            num_tasks=3, use_native=False)
        for field in ("node_x", "edge_src", "edge_dst", "node_graph",
                      "y", "y_mask"):
            np.testing.assert_array_equal(
                getattr(a, field), getattr(b, field), err_msg=field)

    def test_dst_sorted_contract(self, native, graphs):
        batch = pad_graph_batch(graphs, node_multiple=64,
                                edge_multiple=64, use_native=True)
        dst = batch.edge_dst[: int(batch.num_edges)]
        assert (np.diff(dst) >= 0).all()


class TestNativeValidation:
    def test_out_of_range_edge_index_raises(self, native, graphs):
        g = graphs[0]
        bad_idx = g.edge_index.copy()
        bad_idx[1, 0] = g.num_nodes + 3  # dst beyond the graph
        bad = GraphData(x=g.x, edge_index=bad_idx, edge_attr=g.edge_attr,
                        y=g.y, y_mask=g.y_mask)
        with pytest.raises(ValueError, match="out of range"):
            native.pack_batch_native([bad], 64, 64, 1, 1)

    def test_negative_edge_index_raises(self, native, graphs):
        g = graphs[0]
        bad_idx = g.edge_index.copy()
        bad_idx[0, 0] = -1
        bad = GraphData(x=g.x, edge_index=bad_idx, edge_attr=g.edge_attr,
                        y=g.y, y_mask=g.y_mask)
        with pytest.raises(ValueError, match="out of range"):
            native.pack_batch_native([bad], 64, 64, 1, 1)

    def test_padding_too_small_raises(self, native, graphs):
        with pytest.raises(ValueError, match="padding"):
            native.pack_batch_native(list(graphs), 4, 4, 1, 1)
