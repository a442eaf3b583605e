"""BatchNorm folding + merged projections + padding-row masking.

``norm_fold="on"`` folds each pre-norm's affine (``x*a+b``) into the
following projection kernels (exact up to float rounding), and GTConv
runs Q/K/V(+gate) — and under folding the whole edge projection set —
as single merged matmuls. These tests pin:

* param-tree identity with the unfolded path (checkpoints swap freely);
* forward/gradient parity fold-vs-unfold in f32 (tight) and bf16
  (rounding-level);
* zero padding rows at every layer boundary (the NaN-guard invariant:
  trash-slot garbage must not compound across layers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gt_pyg_tpu.data import get_tensor_data, pad_graph_batch
from gt_pyg_tpu.nn import GraphTransformerNet

SMILES = ["CCO", "c1ccccc1", "CC(=O)Nc1ccc(O)cc1", "CCN(CC)CC",
          "C1CCCCC1", "c1ccncc1", "CC(C)O", "CCCC"] * 4


@pytest.fixture(scope="module")
def tile_batch():
    graphs = get_tensor_data(SMILES, [[1.0]] * len(SMILES), progress=False)
    batch = pad_graph_batch(graphs, tile_edges=64, graph_pad=32,
                            tile_pack="ffd")
    return jax.tree_util.tree_map(jnp.asarray, batch)


def _models(dtype, ffn_impl="fused"):
    kw = dict(node_dim_in=140, edge_dim_in=39, hidden_dim=64,
              num_gt_layers=2, num_heads=4, dropout=0.0, norm="bn",
              gate=True, gt_aggregators=("sum", "mean"),
              aggregators=("sum", "mean", "max", "std"),
              attn_impl="tile", ffn_impl=ffn_impl, dtype=dtype)
    return (GraphTransformerNet(norm_fold="on", **kw),
            GraphTransformerNet(norm_fold="off", **kw))


def test_param_tree_identical(tile_batch):
    m_fold, m_base = _models(jnp.float32, ffn_impl="xla")
    v1 = m_fold.init({"params": jax.random.PRNGKey(0)}, tile_batch,
                     deterministic=True)
    v2 = m_base.init({"params": jax.random.PRNGKey(0)}, tile_batch,
                     deterministic=True)
    assert (jax.tree_util.tree_structure(v1["params"])
            == jax.tree_util.tree_structure(v2["params"]))
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.array_equal(a, b), v1["params"], v2["params"]))


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 5e-5),
                                       (jnp.bfloat16, 6e-2)])
def test_forward_parity(tile_batch, dtype, tol):
    ffn = "xla" if dtype == jnp.float32 else "fused"
    m_fold, m_base = _models(dtype, ffn_impl=ffn)
    v = m_base.init({"params": jax.random.PRNGKey(0)}, tile_batch,
                    deterministic=True)
    rngs = {"dropout": jax.random.PRNGKey(1),
            "reparam": jax.random.PRNGKey(2)}
    (pf, _), upd_f = m_fold.apply(v, tile_batch, deterministic=False,
                                  rngs=rngs, mutable=["batch_stats"])
    (pb, _), upd_b = m_base.apply(v, tile_batch, deterministic=False,
                                  rngs=rngs, mutable=["batch_stats"])
    scale = float(jnp.abs(pb.astype(jnp.float32)).max()) + 1e-6
    diff = float(jnp.abs(pf.astype(jnp.float32)
                         - pb.astype(jnp.float32)).max())
    assert diff / scale < tol, (diff, scale)
    # batch-stats updates must agree too (fold still updates running
    # moments)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(upd_f["batch_stats"]),
            jax.tree_util.tree_leaves_with_path(upd_b["batch_stats"])):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-2, atol=1e-4 if dtype == jnp.float32 else 1e-2,
            err_msg=str(pa))


def test_gradient_parity_f32(tile_batch):
    m_fold, m_base = _models(jnp.float32, ffn_impl="xla")
    v = m_base.init({"params": jax.random.PRNGKey(0)}, tile_batch,
                    deterministic=True)

    def loss(model, params):
        (pred, _), _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            tile_batch, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1),
                  "reparam": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        return (pred.astype(jnp.float32) ** 2).sum()

    gf = jax.grad(lambda p: loss(m_fold, p))(v["params"])
    gb = jax.grad(lambda p: loss(m_base, p))(v["params"])
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gf),
            jax.tree_util.tree_leaves_with_path(gb)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.linalg.norm(b) + 1e-8
        assert np.linalg.norm(a - b) / denom < 2e-4, (
            jax.tree_util.keystr(path), np.linalg.norm(a - b), denom)


@pytest.mark.parametrize("norm_fold", ["on", "off"])
def test_padding_rows_zero_at_layer_boundary(tile_batch, norm_fold):
    """Layer outputs must be exactly zero on padding rows — the
    invariant that stops trash-slot garbage compounding into weight
    gradients (0*inf = NaN after enough steps)."""
    from gt_pyg_tpu.nn.gt_conv import GTConv

    b = tile_batch
    m = GTConv(node_in_dim=64, hidden_dim=64, edge_in_dim=64,
               num_heads=4, gate=True, dropout=0.0, norm="bn",
               aggregators=("sum", "mean"), attn_impl="tile",
               ffn_impl="xla", norm_fold=norm_fold, dtype=jnp.float32)
    rng = jax.random.PRNGKey(3)
    npad, ep = b.node_x.shape[0], b.edge_attr.shape[0]
    x = jax.random.normal(rng, (npad, 64), jnp.float32)
    ea = jax.random.normal(jax.random.PRNGKey(4), (ep, 64), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, b.edge_src,
               b.edge_dst, ea, b.node_mask, b.edge_mask,
               deterministic=True, tile_edges=int(b.tile_edges))
    (x_out, e_out), _ = m.apply(
        v, x, b.edge_src, b.edge_dst, ea, b.node_mask, b.edge_mask,
        deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(5)},
        tile_edges=int(b.tile_edges), mutable=["batch_stats"])
    pad_nodes = np.asarray(b.node_mask) == 0
    pad_edges = np.asarray(b.edge_mask) == 0
    assert pad_nodes.any() and pad_edges.any()
    assert np.abs(np.asarray(x_out)[pad_nodes]).max() == 0.0
    assert np.abs(np.asarray(e_out)[pad_edges]).max() == 0.0


def test_fused_ffn_affine_same_x():
    """fused_ffn(x, None, ..., affine-folded w0/b0) == norm-then-MLP."""
    from gt_pyg_tpu.ops.pallas.ffn import fused_ffn

    rng = np.random.RandomState(0)
    R, D, H = 64, 32, 64
    x = jnp.asarray(rng.randn(R, D), jnp.float32)
    a = jnp.asarray(rng.rand(D) + 0.5, jnp.float32)
    b = jnp.asarray(rng.randn(D), jnp.float32)
    w0 = jnp.asarray(rng.randn(D, H) * 0.1, jnp.float32)
    b0 = jnp.asarray(rng.randn(H) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(H, H) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(H) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(H, D) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(D) * 0.1, jnp.float32)

    out_ref = fused_ffn(x * a + b, x, w0, b0, w1, b1, w2, b2)
    out_fold = fused_ffn(x, None, w0 * a[:, None], b0 + b @ w0,
                         w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out_fold), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)

    # gradient: same-x mode must fold the residual cotangent into x
    def f(xx, fold):
        if fold:
            return (fused_ffn(xx, None, w0 * a[:, None], b0 + b @ w0,
                              w1, b1, w2, b2) ** 2).sum()
        return (fused_ffn(xx * a + b, xx, w0, b0, w1, b1, w2,
                          b2) ** 2).sum()

    g_ref = jax.grad(lambda xx: f(xx, False))(x)
    g_fold = jax.grad(lambda xx: f(xx, True))(x)
    np.testing.assert_allclose(np.asarray(g_fold), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)
