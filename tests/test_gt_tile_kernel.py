"""Fused per-tile Pallas attention kernel (ops/pallas/gt_tile.py) vs the
lax reference path — forward and gradients, on tile-packed batches
(interpret mode on CPU; hardware numbers are recorded via bench.py
--attn-impl tile)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gt_pyg_tpu.data import get_tensor_data, pad_graph_batch
from gt_pyg_tpu.ops.attention import gt_attention

TE = 96


@pytest.fixture(scope="module")
def tiled_batch():
    graphs = get_tensor_data(
        ["CCO", "c1ccccc1", "CC(=O)O", "C", "CCN",
         "CC(=O)Nc1ccc(O)cc1", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
         "c1ccc2ccccc2c1", "CCOC(=O)c1ccccc1", "CNC"],
        [[float(i)] for i in range(10)], progress=False)
    return pad_graph_batch(graphs, tile_edges=TE, tiles_multiple=2)


def _inputs(batch, hidden=32, heads=4, gate=True, edge=True, seed=0):
    rng = np.random.default_rng(seed)
    npad = batch.node_x.shape[0]
    ep = batch.edge_attr.shape[0]
    f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    kw = dict(
        q=f(npad, hidden), k=f(npad, hidden), v=f(npad, hidden),
        edge_src=jnp.asarray(batch.edge_src),
        edge_dst=jnp.asarray(batch.edge_dst),
        num_heads=heads,
    )
    if edge:
        kw["e_bias"] = f(ep, heads)
        kw["e_val"] = f(ep, hidden)
    if gate:
        kw["gate_n"] = f(npad, hidden)
        if edge:
            kw["e_gate_logits"] = f(ep, heads)
    return kw


CONFIGS = [
    dict(gate=True, edge=True, aggs=("sum", "mean")),
    dict(gate=False, edge=True, aggs=("sum",)),
    dict(gate=True, edge=False, aggs=("mean",)),
    dict(gate=False, edge=False, aggs=("sum", "mean")),
]


class TestTileKernelForward:
    @pytest.mark.parametrize("cfg", CONFIGS)
    def test_matches_lax(self, tiled_batch, cfg):
        kw = _inputs(tiled_batch, gate=cfg["gate"], edge=cfg["edge"])
        out_l, eij_l = gt_attention(**kw, aggregators=cfg["aggs"],
                                    impl="lax")
        out_t, eij_t = gt_attention(**kw, aggregators=cfg["aggs"],
                                    impl="tile", tile_edges=TE)
        nmask = np.asarray(tiled_batch.node_mask) > 0
        np.testing.assert_allclose(np.asarray(out_t)[nmask],
                                   np.asarray(out_l)[nmask],
                                   rtol=2e-5, atol=2e-5)
        if cfg["edge"]:
            emask = np.asarray(tiled_batch.edge_mask) > 0
            np.testing.assert_allclose(np.asarray(eij_t)[emask],
                                       np.asarray(eij_l)[emask],
                                       rtol=2e-5, atol=2e-5)
        else:
            assert eij_t is None

    def test_matches_lax_at_trained_logit_scale(self, tiled_batch):
        """Regression (round 3): trained models carry pre-softmax logits
        of O(1e4-1e5) via WE_logits on the raw residual edge stream;
        the v3 per-tile softmax shift underflowed every node whose max
        logit sat > ~87 below the tile max (35-47% of nodes on the
        round-2 production checkpoint), zeroing their attention rows.
        The per-node shift must match the lax path at ANY logit scale."""
        kw = _inputs(tiled_batch, gate=True, edge=True)
        # spread e_bias over a trained-scale range: node maxes within a
        # tile differ by thousands
        rng = np.random.default_rng(7)
        ep, heads = kw["e_bias"].shape
        kw["e_bias"] = jnp.asarray(
            rng.normal(size=(ep, heads)) * 3.0
            + rng.uniform(-2e4, 2e4, size=(ep, 1)), jnp.float32)
        out_l, eij_l = gt_attention(**kw, aggregators=("sum", "mean"),
                                    impl="lax")
        out_t, eij_t = gt_attention(**kw, aggregators=("sum", "mean"),
                                    impl="tile", tile_edges=TE)
        nmask = np.asarray(tiled_batch.node_mask) > 0
        np.testing.assert_allclose(np.asarray(out_t)[nmask],
                                   np.asarray(out_l)[nmask],
                                   rtol=2e-4, atol=2e-4)
        # gradients survive the scale too
        nmask_j = jnp.asarray(tiled_batch.node_mask)

        def loss(eb, impl):
            full = dict(kw)
            full["e_bias"] = eb
            out, _ = gt_attention(**full, aggregators=("sum", "mean"),
                                  impl=impl,
                                  tile_edges=TE if impl == "tile" else None)
            return jnp.sum((out * nmask_j[:, None]) ** 2)

        g_l = jax.grad(lambda d: loss(d, "lax"))(kw["e_bias"])
        g_t = jax.grad(lambda d: loss(d, "tile"))(kw["e_bias"])
        np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_l),
                                   rtol=5e-4, atol=5e-4)

    def test_auto_impl_selects_tile(self, tiled_batch):
        kw = _inputs(tiled_batch)
        out_a, _ = gt_attention(**kw, aggregators=("sum",), impl="auto",
                                tile_edges=TE)
        out_t, _ = gt_attention(**kw, aggregators=("sum",), impl="tile",
                                tile_edges=TE)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_t))

    def test_requires_tiled_batch(self, tiled_batch):
        kw = _inputs(tiled_batch)
        with pytest.raises(ValueError, match="tile-packed"):
            gt_attention(**kw, aggregators=("sum",), impl="tile",
                         tile_edges=TE + 32)

    def test_unsupported_aggregator_falls_back(self, tiled_batch):
        kw = _inputs(tiled_batch)
        out_t, _ = gt_attention(**kw, aggregators=("sum", "max"),
                                impl="tile", tile_edges=TE)
        out_l, _ = gt_attention(**kw, aggregators=("sum", "max"),
                                impl="lax")
        np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_l),
                                   rtol=1e-6, atol=1e-6)


class TestTileKernelGrad:
    @pytest.mark.parametrize("cfg", CONFIGS[:2])
    def test_grads_match_lax(self, tiled_batch, cfg):
        kw = _inputs(tiled_batch, gate=cfg["gate"], edge=cfg["edge"])
        nmask = jnp.asarray(tiled_batch.node_mask)
        emask = jnp.asarray(tiled_batch.edge_mask)
        diff_keys = [kn for kn in ("q", "k", "v", "gate_n", "e_bias",
                                   "e_val", "e_gate_logits") if kn in kw]

        def loss(diff, impl):
            full = dict(kw)
            full.update(diff)
            out, eij = gt_attention(**full, aggregators=cfg["aggs"],
                                    impl=impl,
                                    tile_edges=TE if impl == "tile"
                                    else None)
            val = jnp.sum((out * nmask[:, None]) ** 2)
            if eij is not None:
                val = val + jnp.sum((eij * emask[:, None]) ** 2)
            return val

        diff = {kn: kw[kn] for kn in diff_keys}
        g_l = jax.grad(lambda d: loss(d, "lax"))(diff)
        g_t = jax.grad(lambda d: loss(d, "tile"))(diff)
        for kn in diff_keys:
            np.testing.assert_allclose(
                np.asarray(g_t[kn]), np.asarray(g_l[kn]),
                rtol=5e-4, atol=5e-4, err_msg=kn)

    def test_dropout_deterministic_given_key(self, tiled_batch):
        kw = _inputs(tiled_batch)
        key = jax.random.PRNGKey(7)
        a1, _ = gt_attention(**kw, aggregators=("sum",), impl="tile",
                             tile_edges=TE, dropout_rate=0.5,
                             dropout_rng=key)
        a2, _ = gt_attention(**kw, aggregators=("sum",), impl="tile",
                             tile_edges=TE, dropout_rate=0.5,
                             dropout_rng=key)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        # and it matches the lax path with the same key (same mask shape)
        a3, _ = gt_attention(**kw, aggregators=("sum",), impl="lax",
                             dropout_rate=0.5, dropout_rng=key)
        nmask = np.asarray(tiled_batch.node_mask) > 0
        np.testing.assert_allclose(np.asarray(a1)[nmask],
                                   np.asarray(a3)[nmask],
                                   rtol=2e-5, atol=2e-5)


class TestTileKernelBf16:
    """In bf16 the kernel's matmul-dtype policy switches every dot to a
    single bf16 MXU pass (f32 accumulate); outputs must stay within
    bf16-level error of the f32 lax reference, fwd and bwd."""

    def test_forward_close_to_f32_lax(self, tiled_batch):
        kw = _inputs(tiled_batch)
        out_l, eij_l = gt_attention(**kw, aggregators=("sum", "mean"),
                                    impl="lax")
        kwb = {kn: (val.astype(jnp.bfloat16)
                    if isinstance(val, jnp.ndarray)
                    and val.dtype == jnp.float32 else val)
               for kn, val in kw.items()}
        out_t, eij_t = gt_attention(**kwb, aggregators=("sum", "mean"),
                                    impl="tile", tile_edges=TE)
        assert out_t.dtype == jnp.bfloat16
        nmask = np.asarray(tiled_batch.node_mask) > 0
        np.testing.assert_allclose(
            np.asarray(out_t, np.float32)[nmask],
            np.asarray(out_l)[nmask], rtol=0.1, atol=0.1)
        emask = np.asarray(tiled_batch.edge_mask) > 0
        np.testing.assert_allclose(
            np.asarray(eij_t, np.float32)[emask],
            np.asarray(eij_l)[emask], rtol=0.1, atol=0.1)

    def test_grads_close_to_f32_lax(self, tiled_batch):
        kw = _inputs(tiled_batch)
        nmask = jnp.asarray(tiled_batch.node_mask)

        def loss(q, impl, dtype):
            full = dict(kw)
            full = {kn: (val.astype(dtype)
                         if isinstance(val, jnp.ndarray)
                         and val.dtype == jnp.float32 else val)
                    for kn, val in full.items()}
            full["q"] = q.astype(dtype)
            out, _ = gt_attention(**full, aggregators=("sum",),
                                  impl=impl,
                                  tile_edges=TE if impl == "tile"
                                  else None)
            return jnp.sum(((out * nmask[:, None]) ** 2)
                           .astype(jnp.float32))

        g_l = jax.grad(lambda q: loss(q, "lax", jnp.float32))(kw["q"])
        g_t = jax.grad(lambda q: loss(q, "tile", jnp.bfloat16))(kw["q"])
        denom = np.abs(np.asarray(g_l)) + 1.0
        rel = np.abs(np.asarray(g_t) - np.asarray(g_l)) / denom
        assert rel.max() < 0.15, rel.max()


NT256_TE = 480      # lets a tile reach >127 nodes; ≥2 tiles overall


@pytest.fixture(scope="module")
def tiled_batch_nt256():
    """Multi-graph node tiles (round-5 layout): up to 255 real nodes
    per 256-row tile — roughly half the kernel issues per batch at 2x
    the one-hot incidence FLOPs."""
    graphs = get_tensor_data(
        ["CCO", "c1ccccc1", "CC(=O)O", "C", "CCN",
         "CC(=O)Nc1ccc(O)cc1", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
         "c1ccc2ccccc2c1", "CCOC(=O)c1ccccc1", "CNC"] * 5,
        [[float(i)] for i in range(50)], progress=False)
    b = pad_graph_batch(graphs, tile_edges=NT256_TE, tile_nodes=256,
                        tile_pack="ffd")
    assert b.node_x.shape[0] // 256 >= 2
    # the layout must really exercise >127 nodes in one tile
    assert np.asarray(b.node_mask).reshape(-1, 256).sum(axis=1).max() > 127
    return b


class TestTileKernelNT256:
    @pytest.mark.parametrize("cfg", CONFIGS)
    def test_matches_lax(self, tiled_batch_nt256, cfg):
        b = tiled_batch_nt256
        kw = _inputs(b, gate=cfg["gate"], edge=cfg["edge"])
        out_l, eij_l = gt_attention(**kw, aggregators=cfg["aggs"],
                                    impl="lax")
        out_t, eij_t = gt_attention(**kw, aggregators=cfg["aggs"],
                                    impl="tile", tile_edges=NT256_TE,
                                    tile_nodes=256)
        nmask = np.asarray(b.node_mask) > 0
        np.testing.assert_allclose(np.asarray(out_t)[nmask],
                                   np.asarray(out_l)[nmask],
                                   rtol=2e-5, atol=2e-5)
        if cfg["edge"]:
            emask = np.asarray(b.edge_mask) > 0
            np.testing.assert_allclose(np.asarray(eij_t)[emask],
                                       np.asarray(eij_l)[emask],
                                       rtol=2e-5, atol=2e-5)

    def test_grads_match_lax(self, tiled_batch_nt256):
        b = tiled_batch_nt256
        kw = _inputs(b, gate=True, edge=True)
        nmask = jnp.asarray(b.node_mask)
        emask = jnp.asarray(b.edge_mask)
        diff_keys = ["q", "k", "v", "gate_n", "e_bias", "e_val",
                     "e_gate_logits"]

        def loss(diff, impl):
            full = dict(kw)
            full.update(diff)
            out, eij = gt_attention(
                **full, aggregators=("sum", "mean"), impl=impl,
                tile_edges=NT256_TE if impl == "tile" else None,
                tile_nodes=256 if impl == "tile" else None)
            return (jnp.sum((out * nmask[:, None]) ** 2)
                    + jnp.sum((eij * emask[:, None]) ** 2))

        diff = {kn: kw[kn] for kn in diff_keys}
        g_l = jax.grad(lambda d: loss(d, "lax"))(diff)
        g_t = jax.grad(lambda d: loss(d, "tile"))(diff)
        for kn in diff_keys:
            np.testing.assert_allclose(
                np.asarray(g_t[kn]), np.asarray(g_l[kn]),
                rtol=5e-4, atol=5e-4, err_msg=kn)

    def test_trained_logit_scale(self, tiled_batch_nt256):
        """The per-node softmax shift must stay exact with the wider
        node window (a 256-column masked max instead of 128)."""
        b = tiled_batch_nt256
        kw = _inputs(b, gate=True, edge=True)
        rng = np.random.default_rng(7)
        ep, heads = kw["e_bias"].shape
        kw["e_bias"] = jnp.asarray(
            rng.normal(size=(ep, heads)) * 3.0
            + rng.uniform(-2e4, 2e4, size=(ep, 1)), jnp.float32)
        out_l, _ = gt_attention(**kw, aggregators=("sum", "mean"),
                                impl="lax")
        out_t, _ = gt_attention(**kw, aggregators=("sum", "mean"),
                                impl="tile", tile_edges=NT256_TE,
                                tile_nodes=256)
        nmask = np.asarray(b.node_mask) > 0
        np.testing.assert_allclose(np.asarray(out_t)[nmask],
                                   np.asarray(out_l)[nmask],
                                   rtol=2e-4, atol=2e-4)

    def test_model_forward_matches_lax(self, tiled_batch_nt256):
        from gt_pyg_tpu.nn import GraphTransformerNet

        b = tiled_batch_nt256
        kwargs = dict(
            node_dim_in=140, edge_dim_in=39, hidden_dim=32,
            num_gt_layers=2, num_heads=4, dropout=0.0, norm="bn",
            gate=True, gt_aggregators=("sum", "mean"),
            aggregators=("sum", "mean", "max", "std"))
        jb = jax.tree_util.tree_map(jnp.asarray, b)
        m_lax = GraphTransformerNet(**kwargs, attn_impl="lax")
        m_til = GraphTransformerNet(**kwargs, attn_impl="tile")
        variables = m_lax.init({"params": jax.random.PRNGKey(0)}, jb,
                               deterministic=True)
        p_l, _ = m_lax.apply(variables, jb, deterministic=True)
        p_t, _ = m_til.apply(variables, jb, deterministic=True)
        n = int(b.num_graphs)
        np.testing.assert_allclose(np.asarray(p_t)[:n],
                                   np.asarray(p_l)[:n],
                                   rtol=1e-4, atol=1e-4)

    def test_proj_kernel_nt256(self, tiled_batch_nt256):
        """GT_TPU_PROJ=on (v5) must also honor the wider node tiles."""
        import os

        from gt_pyg_tpu.nn import GraphTransformerNet

        b = tiled_batch_nt256
        kwargs = dict(
            node_dim_in=140, edge_dim_in=39, hidden_dim=32,
            num_gt_layers=1, num_heads=4, dropout=0.0, norm="bn",
            gate=True, gt_aggregators=("sum", "mean"),
            aggregators=("sum", "mean"))
        jb = jax.tree_util.tree_map(jnp.asarray, b)
        m_off = GraphTransformerNet(**kwargs, attn_impl="tile",
                                    norm_fold="on")
        variables = m_off.init({"params": jax.random.PRNGKey(0)}, jb,
                               deterministic=True)
        p_off, _ = m_off.apply(variables, jb, deterministic=True)
        old = os.environ.get("GT_TPU_PROJ")
        os.environ["GT_TPU_PROJ"] = "on"
        try:
            p_on, _ = m_off.apply(variables, jb, deterministic=True)
        finally:
            if old is None:
                os.environ.pop("GT_TPU_PROJ", None)
            else:
                os.environ["GT_TPU_PROJ"] = old
        n = int(b.num_graphs)
        np.testing.assert_allclose(np.asarray(p_on)[:n],
                                   np.asarray(p_off)[:n],
                                   rtol=1e-4, atol=1e-4)


class TestModelWithTileKernel:
    def test_model_forward_matches_lax(self, tiled_batch):
        from gt_pyg_tpu.nn import GraphTransformerNet

        kwargs = dict(
            node_dim_in=140, edge_dim_in=39, hidden_dim=32,
            num_gt_layers=2, num_heads=4, dropout=0.0, norm="bn",
            gate=True, gt_aggregators=("sum", "mean"),
            aggregators=("sum", "mean", "max", "std"))
        jb = jax.tree_util.tree_map(jnp.asarray, tiled_batch)
        m_lax = GraphTransformerNet(**kwargs, attn_impl="lax")
        m_til = GraphTransformerNet(**kwargs, attn_impl="tile")
        variables = m_lax.init({"params": jax.random.PRNGKey(0)}, jb,
                               deterministic=True)
        p_l, lv_l = m_lax.apply(variables, jb, deterministic=True)
        p_t, lv_t = m_til.apply(variables, jb, deterministic=True)
        n = int(tiled_batch.num_graphs)
        np.testing.assert_allclose(np.asarray(p_t)[:n],
                                   np.asarray(p_l)[:n],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(lv_t)[:n],
                                   np.asarray(lv_l)[:n],
                                   rtol=1e-4, atol=1e-4)
