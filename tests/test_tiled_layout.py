"""Tile-packed batch layout: the contract of the fused Pallas attention
kernel (ops/pallas/gt_tile.py).

Invariants (GraphBatch docstring): graphs never straddle a tile
boundary; every edge's endpoints live in its own tile's node range;
<=127 real nodes per tile; padding edges point at the tile's first
padding node row so edge_dst stays globally sorted; model outputs on a
tiled batch match the flat layout exactly (same segments in the same
order, trash rows masked)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gt_pyg_tpu.data import get_tensor_data, pad_graph_batch
from gt_pyg_tpu.data.graph import TILE_NODES, GraphData, plan_tiles
from gt_pyg_tpu.data.device_dataset import DeviceDataset, materialize_batch

TE = 96  # small tile edge budget for tests


@pytest.fixture(scope="module")
def graphs():
    return get_tensor_data(
        ["CCO", "c1ccccc1", "CC(=O)O", "C", "CCN",
         "CC(=O)Nc1ccc(O)cc1", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
         "c1ccc2ccccc2c1", "CCOC(=O)c1ccccc1", "CNC"],
        [[float(i)] for i in range(10)], progress=False)


class TestPlanTiles:
    def test_budgets_respected(self, graphs):
        nc = [g.num_nodes for g in graphs]
        ec = [g.num_edges for g in graphs]
        tiles = plan_tiles(nc, ec, TE)
        seen = [g for t in tiles for g in t]
        assert seen == list(range(len(graphs)))  # order preserved
        for tile in tiles:
            assert sum(nc[i] for i in tile) <= TILE_NODES - 1
            assert sum(ec[i] for i in tile) <= TE

    def test_oversize_graph_raises(self):
        with pytest.raises(ValueError, match="exceeds the tile budget"):
            plan_tiles([200], [10], TE)
        with pytest.raises(ValueError, match="exceeds the tile budget"):
            plan_tiles([10], [TE + 1], TE)


def _check_tiled_invariants(batch, te, nt=None):
    NT = nt if nt is not None else TILE_NODES
    assert getattr(batch, "tile_nodes", TILE_NODES) == NT
    np_, ep = batch.node_x.shape[0], batch.edge_attr.shape[0]
    assert np_ % NT == 0 and ep % te == 0
    n_tiles = np_ // NT
    assert ep // te == n_tiles
    assert batch.tile_edges == te

    src = np.asarray(batch.edge_src)
    dst = np.asarray(batch.edge_dst)
    emask = np.asarray(batch.edge_mask)
    nmask = np.asarray(batch.node_mask)
    gid = np.asarray(batch.node_graph)

    # dst globally sorted (segment-op contract)
    assert (np.diff(dst) >= 0).all()

    for t in range(n_tiles):
        lo, hi = t * NT, (t + 1) * NT
        e = slice(t * te, (t + 1) * te)
        # tile-local endpoints
        assert (src[e] >= lo).all() and (src[e] < hi).all()
        assert (dst[e] >= lo).all() and (dst[e] < hi).all()
        # <=127 real nodes; trash row == first padding row
        fill = int(nmask[lo:hi].sum())
        assert fill <= NT - 1
        pad_edges = emask[e] == 0
        if pad_edges.any():
            assert (dst[e][pad_edges] == lo + fill).all()
        # real node rows are contiguous from the tile base
        assert (nmask[lo:lo + fill] == 1).all()
        # graphs don't straddle: every real node's graph id stays in-tile
        if fill:
            gids = gid[lo:lo + fill]
            for g in np.unique(gids):
                rows = np.where(gid == g)[0]
                assert rows.min() >= lo and rows.max() < hi


class TestTiledPadGraphBatch:
    def test_invariants(self, graphs):
        batch = pad_graph_batch(graphs, tile_edges=TE)
        _check_tiled_invariants(batch, TE)
        assert int(batch.num_nodes) == sum(g.num_nodes for g in graphs)
        assert int(batch.num_edges) == sum(g.num_edges for g in graphs)

    def test_feature_integrity(self, graphs):
        batch = pad_graph_batch(graphs, tile_edges=TE)
        nmask = np.asarray(batch.node_mask) > 0
        got_x = np.asarray(batch.node_x)[nmask]
        want_x = np.concatenate([g.x for g in graphs])
        np.testing.assert_array_equal(got_x, want_x)
        # y alignment by batch slot
        np.testing.assert_array_equal(
            np.asarray(batch.y)[:len(graphs), 0],
            np.arange(len(graphs), dtype=np.float32))

    def test_tiles_multiple_bucketing(self, graphs):
        batch = pad_graph_batch(graphs, tile_edges=TE, tiles_multiple=8)
        assert batch.node_x.shape[0] == 8 * TILE_NODES
        assert batch.edge_attr.shape[0] == 8 * TE
        _check_tiled_invariants(batch, TE)

    def test_tile_edges_is_static_aux(self, graphs):
        batch = pad_graph_batch(graphs, tile_edges=TE)
        jb = jax.tree_util.tree_map(jnp.asarray, batch)
        assert jb.tile_edges == TE  # survives tree_map as aux data
        assert jb.tile_nodes == TILE_NODES

    def test_multigraph_node_tiles_nt256(self, graphs):
        """The round-5 layout: tile_nodes=256 packs ~2x the graphs per
        tile (up to 255 real nodes); all tile invariants hold with the
        bigger node window, and the layout tags ride the pytree aux."""
        many = graphs * 5                      # ~500 nodes, ~1.1k edges
        batch = pad_graph_batch(many, tile_edges=384, tile_nodes=256,
                                tile_pack="ffd")
        _check_tiled_invariants(batch, 384, nt=256)
        assert batch.node_x.shape[0] // 256 >= 2   # multi-tile coverage
        # at least one tile really holds >127 nodes (the whole point)
        nmask = np.asarray(batch.node_mask)
        fills = nmask.reshape(-1, 256).sum(axis=1)
        assert fills.max() > 127
        jb = jax.tree_util.tree_map(jnp.asarray, batch)
        assert jb.tile_nodes == 256 and jb.tile_edges == 384

    def test_nt256_feature_integrity(self, graphs):
        many = graphs * 5
        batch = pad_graph_batch(many, tile_edges=384, tile_nodes=256)
        nmask = np.asarray(batch.node_mask) > 0
        got_x = np.asarray(batch.node_x)[nmask]
        want_x = np.concatenate([g.x for g in many])
        np.testing.assert_array_equal(got_x, want_x)


class TestTiledDeviceDataset:
    def test_matches_host_packer(self, graphs):
        dd = DeviceDataset(graphs)
        ids = [5, 0, 7, 3, 9, 1]
        ib = dd.index_batch_tiled(ids, TE, graph_pad=len(ids))
        got = materialize_batch(
            dd.device_tree(), jax.tree_util.tree_map(jnp.asarray, ib),
            dd.static_meta())
        want = pad_graph_batch([graphs[i] for i in ids], tile_edges=TE,
                               graph_pad=len(ids))
        for name in ("node_x", "edge_attr", "edge_src", "edge_dst",
                     "node_graph", "node_mask", "edge_mask", "graph_mask",
                     "y", "y_mask"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, name)),
                np.asarray(getattr(want, name)), err_msg=name)
        assert got.tile_edges == TE

    def test_iter_tiled(self, graphs):
        dd = DeviceDataset(graphs)
        seen = 0
        for ib in dd.iter_index_batches(4, tile_edges=TE,
                                        tiles_multiple=2):
            assert ib.tile_edges == TE
            assert ib.node_gather.shape[0] % (2 * TILE_NODES) == 0
            seen += int(ib.num_graphs)
        assert seen == len(graphs)


class TestFFDPacking:
    """First-fit-decreasing tile packing (tile_pack="ffd"): tighter
    packing, graphs reordered within the batch, y travels with each
    graph, all tiled-layout invariants preserved."""

    def test_plan_tiles_ffd_valid_and_no_looser(self, graphs):
        nc = [g.num_nodes for g in graphs]
        ec = [g.num_edges for g in graphs]
        tiles = plan_tiles(nc, ec, TE, strategy="ffd")
        seen = sorted(g for t in tiles for g in t)
        assert seen == list(range(len(graphs)))  # each graph exactly once
        for tile in tiles:
            assert sum(nc[i] for i in tile) <= TILE_NODES - 1
            assert sum(ec[i] for i in tile) <= TE
        assert len(tiles) <= len(plan_tiles(nc, ec, TE))

    def test_unknown_strategy_raises(self, graphs):
        with pytest.raises(ValueError, match="strategy"):
            plan_tiles([3], [2], TE, strategy="bogus")

    def test_pad_graph_batch_ffd_invariants_and_y_alignment(self, graphs):
        batch = pad_graph_batch(graphs, tile_edges=TE, tile_pack="ffd")
        _check_tiled_invariants(batch, TE)
        assert int(batch.num_nodes) == sum(g.num_nodes for g in graphs)
        assert int(batch.num_edges) == sum(g.num_edges for g in graphs)
        # every slot's node features must equal the original graph with
        # that slot's y value (y = 0..9 identifies graphs uniquely here)
        gid = np.asarray(batch.node_graph)
        y = np.asarray(batch.y)
        for slot in range(len(graphs)):
            orig = graphs[int(y[slot, 0])]
            rows = np.where(gid == slot)[0]
            assert len(rows) == orig.num_nodes
            np.testing.assert_array_equal(
                np.asarray(batch.node_x)[rows], orig.x)

    def test_device_path_matches_host_ffd(self, graphs):
        dd = DeviceDataset(graphs)
        ids = [5, 0, 7, 3, 9, 1]
        ib = dd.index_batch_tiled(ids, TE, graph_pad=len(ids),
                                  tile_pack="ffd")
        got = materialize_batch(
            dd.device_tree(), jax.tree_util.tree_map(jnp.asarray, ib),
            dd.static_meta())
        _check_tiled_invariants(got, TE)
        # same multiset of graphs (y identifies them), x follows y
        assert (sorted(np.asarray(got.y)[:len(ids), 0].tolist())
                == sorted(float(i) for i in ids))
        gid = np.asarray(got.node_graph)
        for slot in range(len(ids)):
            orig = graphs[int(np.asarray(got.y)[slot, 0])]
            rows = np.where(gid == slot)[0]
            assert len(rows) == orig.num_nodes
            np.testing.assert_array_equal(
                np.asarray(got.node_x)[rows], orig.x)

    def test_model_outputs_match_nextfit_modulo_permutation(self, graphs):
        from gt_pyg_tpu.nn import GraphTransformerNet

        model = GraphTransformerNet(
            node_dim_in=140, edge_dim_in=39, hidden_dim=32,
            num_gt_layers=2, num_heads=4, dropout=0.0, norm="ln",
            gate=True, gt_aggregators=("sum", "mean"),
            aggregators=("sum", "mean"))
        b_nf = pad_graph_batch(graphs, tile_edges=TE)
        b_ffd = pad_graph_batch(graphs, tile_edges=TE, tile_pack="ffd")
        jn = jax.tree_util.tree_map(jnp.asarray, b_nf)
        jf = jax.tree_util.tree_map(jnp.asarray, b_ffd)
        variables = model.init({"params": jax.random.PRNGKey(0)}, jn,
                               deterministic=True)
        p_nf, _ = model.apply(variables, jn, deterministic=True)
        p_ffd, _ = model.apply(variables, jf, deterministic=True)
        n = len(graphs)
        # align by y (unique per graph here): prediction per molecule
        # must not depend on the packing order
        order_nf = np.argsort(np.asarray(b_nf.y)[:n, 0])
        order_ffd = np.argsort(np.asarray(b_ffd.y)[:n, 0])
        np.testing.assert_allclose(
            np.asarray(p_ffd)[:n][order_ffd],
            np.asarray(p_nf)[:n][order_nf], rtol=2e-5, atol=2e-5)


class TestModelParityFlatVsTiled:
    @pytest.mark.parametrize("norm", ["ln", "bn"])
    def test_forward_equal(self, graphs, norm):
        from gt_pyg_tpu.nn import GraphTransformerNet

        model = GraphTransformerNet(
            node_dim_in=140, edge_dim_in=39, hidden_dim=32,
            num_gt_layers=2, num_heads=4, dropout=0.0, norm=norm,
            gate=True, gt_aggregators=("sum", "mean"),
            aggregators=("sum", "mean", "max", "std"))
        flat = pad_graph_batch(graphs, node_multiple=128,
                               edge_multiple=128, use_native=False)
        tiled = pad_graph_batch(graphs, tile_edges=TE)
        fj = jax.tree_util.tree_map(jnp.asarray, flat)
        tj = jax.tree_util.tree_map(jnp.asarray, tiled)
        variables = model.init({"params": jax.random.PRNGKey(0)}, fj,
                               deterministic=True)
        pred_f, lv_f = model.apply(variables, fj, deterministic=True)
        pred_t, lv_t = model.apply(variables, tj, deterministic=True)
        n = len(graphs)
        np.testing.assert_allclose(np.asarray(pred_f)[:n],
                                   np.asarray(pred_t)[:n],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lv_f)[:n],
                                   np.asarray(lv_t)[:n],
                                   rtol=1e-5, atol=1e-5)

    def test_grads_match(self, graphs):
        """Trash rows must not leak gradient: loss on real graphs gives
        identical parameter grads for flat and tiled layouts."""
        from gt_pyg_tpu.nn import GraphTransformerNet

        model = GraphTransformerNet(
            node_dim_in=140, edge_dim_in=39, hidden_dim=32,
            num_gt_layers=1, num_heads=4, dropout=0.0, norm="ln",
            gate=True, gt_aggregators=("sum",))
        flat = pad_graph_batch(graphs, node_multiple=128,
                               edge_multiple=128, use_native=False)
        tiled = pad_graph_batch(graphs, tile_edges=TE)
        fj = jax.tree_util.tree_map(jnp.asarray, flat)
        tj = jax.tree_util.tree_map(jnp.asarray, tiled)
        variables = model.init({"params": jax.random.PRNGKey(0)}, fj,
                               deterministic=True)
        n = len(graphs)

        def loss(params, batch):
            pred, _ = model.apply({"params": params}, batch,
                                  deterministic=True)
            return jnp.sum(pred[:n] ** 2)

        from jax.flatten_util import ravel_pytree

        gf = jax.grad(loss)(variables["params"], fj)
        gt = jax.grad(loss)(variables["params"], tj)
        flat_f, _ = ravel_pytree(gf)
        flat_t, _ = ravel_pytree(gt)
        np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_t),
                                   rtol=1e-4, atol=1e-5)
