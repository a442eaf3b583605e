"""v5 projection-fused tile kernel parity (fwd + grads) vs the v4
composite path (XLA projections + gt_attention_tile_merged + XLA output
projections), on CPU interpret mode.

The v5 kernel moves the GTConv projections and WO/WOe inside the
attention kernel (ops/pallas/gt_tile.py v5 banner); its math must equal
the composite path at both f32 (tight) and bf16 (rounding-tolerant)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gt_pyg_tpu.ops.pallas.gt_tile import (gt_attention_tile_merged,
                                           gt_attention_tile_proj)

NT = 128
TE = 64
HEADS = 4
DH = 8
HIDDEN = HEADS * DH
DIN = 48
DE = 40
AGGS = ("sum", "mean")
N_TILES = 2


def _random_graph(rng, n_tiles=N_TILES, te=TE):
    """Tile-packed random graph: nodes/edges confined to tiles, edges
    dst-sorted within each tile, some padding rows."""
    npad = n_tiles * NT
    ep = n_tiles * te
    src = np.zeros(ep, np.int32)
    dst = np.zeros(ep, np.int32)
    for t in range(n_tiles):
        n_real = rng.integers(NT // 2, NT - 8)
        e_real = rng.integers(te // 2, te - 4)
        base = t * NT
        s = rng.integers(0, n_real, e_real)
        d = np.sort(rng.integers(0, n_real, e_real))
        trash = n_real  # first padding row of the tile
        src[t * te:t * te + e_real] = base + s
        dst[t * te:t * te + e_real] = base + d
        src[t * te + e_real:(t + 1) * te] = base + trash
        dst[t * te + e_real:(t + 1) * te] = base + trash
    return npad, ep, jnp.asarray(src), jnp.asarray(dst)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    npad, ep, src, dst = _random_graph(rng)
    x = jnp.asarray(rng.normal(0, 1, (npad, DIN)), jnp.float32)
    e = jnp.asarray(rng.normal(0, 1, (ep, DE)), jnp.float32)
    w_e_width = HIDDEN + HEADS * 2  # value | logits | gate
    ws = {
        "wq": rng.normal(0, 0.2, (DIN, 4 * HIDDEN)),
        "bq": rng.normal(0, 0.1, (4 * HIDDEN,)),
        "we": rng.normal(0, 0.2, (DE, w_e_width)),
        "be": rng.normal(0, 0.1, (w_e_width,)),
        "wo": rng.normal(0, 0.2, (HIDDEN * len(AGGS), DIN)),
        "bo": rng.normal(0, 0.1, (DIN,)),
        "woe": rng.normal(0, 0.2, (HIDDEN, DE)),
        "boe": rng.normal(0, 0.1, (DE,)),
    }
    ws = {k: jnp.asarray(v, jnp.float32) for k, v in ws.items()}
    return x, e, ws, src, dst


def _composite(x, e, ws, src, dst, dtype, drop=0.0, rng=None):
    """The v4 path: XLA projections, merged kernel, XLA WO/WOe."""
    qkvg = (jax.lax.dot(x.astype(dtype), ws["wq"].astype(dtype),
                        preferred_element_type=jnp.float32)
            + ws["bq"]).astype(dtype)
    e_all = (jax.lax.dot(e.astype(dtype), ws["we"].astype(dtype),
                         preferred_element_type=jnp.float32)
             + ws["be"]).astype(jnp.float32)
    out, eij = gt_attention_tile_merged(
        qkvg, src, dst, HEADS, HIDDEN, TE, e_all=e_all, has_gate=True,
        aggregators=AGGS, dropout_rate=drop, dropout_rng=rng,
        tiles_per_step=2)
    attn = (jax.lax.dot(out.astype(dtype), ws["wo"].astype(dtype),
                        preferred_element_type=jnp.float32)
            + ws["bo"]).astype(dtype)
    e_attn = (jax.lax.dot(eij.astype(dtype), ws["woe"].astype(dtype),
                          preferred_element_type=jnp.float32)
              + ws["boe"]).astype(dtype)
    return attn, e_attn


def _proj(x, e, ws, src, dst, dtype, drop=0.0, rng=None):
    return gt_attention_tile_proj(
        x.astype(dtype), e.astype(dtype), ws["wq"], ws["bq"], ws["we"],
        ws["be"], ws["wo"], ws["bo"], ws["woe"], ws["boe"], src, dst,
        HEADS, HIDDEN, TE, has_gate=True, aggregators=AGGS,
        dropout_rate=drop, dropout_rng=rng, tiles_per_step=2)


class TestForward:
    def test_f32_forward_matches_composite(self, problem):
        x, e, ws, src, dst = problem
        a_ref, e_ref = _composite(x, e, ws, src, dst, jnp.float32)
        a, e_attn = _proj(x, e, ws, src, dst, jnp.float32)
        np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(e_attn), np.asarray(e_ref),
                                   rtol=2e-4, atol=2e-5)

    def test_bf16_forward_close(self, problem):
        x, e, ws, src, dst = problem
        a_ref, e_ref = _composite(x, e, ws, src, dst, jnp.bfloat16)
        a, e_attn = _proj(x, e, ws, src, dst, jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(a_ref, np.float32),
            rtol=0.05, atol=0.05)
        np.testing.assert_allclose(
            np.asarray(e_attn, np.float32),
            np.asarray(e_ref, np.float32), rtol=0.05, atol=0.05)

    def test_dropout_placement_matches(self, problem):
        """Same rng => same attention-dropout mask in both kernels."""
        x, e, ws, src, dst = problem
        key = jax.random.PRNGKey(3)
        a_ref, e_ref = _composite(x, e, ws, src, dst, jnp.float32,
                                  drop=0.3, rng=key)
        a, e_attn = _proj(x, e, ws, src, dst, jnp.float32, drop=0.3,
                          rng=key)
        np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref),
                                   rtol=2e-4, atol=2e-5)


class TestGradients:
    def test_f32_grads_match_composite(self, problem):
        x, e, ws, src, dst = problem

        def loss_fn(path):
            def f(x_, e_, ws_):
                a, ea = path(x_, e_, ws_, src, dst, jnp.float32)
                return (jnp.sum(jnp.sin(a * 0.1))
                        + jnp.sum(jnp.cos(ea * 0.1)))
            return f

        g_ref = jax.grad(loss_fn(_composite), argnums=(0, 1, 2))(x, e, ws)
        g = jax.grad(loss_fn(_proj), argnums=(0, 1, 2))(x, e, ws)
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g_ref[0]),
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(g[1]), np.asarray(g_ref[1]),
                                   rtol=2e-3, atol=2e-4)
        for k in g_ref[2]:
            np.testing.assert_allclose(
                np.asarray(g[2][k]), np.asarray(g_ref[2][k]),
                rtol=2e-3, atol=2e-4, err_msg=f"weight grad {k}")


class TestGradientsMore:
    def test_f32_grads_with_dropout_match(self, problem):
        """Train-mode: the attention-dropout keep mask must apply at the
        same sites in the fused fwd and its VJP (and match the composite
        path under the same key)."""
        x, e, ws, src, dst = problem
        key = jax.random.PRNGKey(11)

        def loss_fn(path):
            def f(x_, e_, ws_):
                a, ea = path(x_, e_, ws_, src, dst, jnp.float32,
                             drop=0.25, rng=key)
                return (jnp.sum(jnp.sin(a * 0.1))
                        + jnp.sum(jnp.cos(ea * 0.1)))
            return f

        g_ref = jax.grad(loss_fn(_composite), argnums=(0, 2))(x, e, ws)
        g = jax.grad(loss_fn(_proj), argnums=(0, 2))(x, e, ws)
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g_ref[0]),
                                   rtol=2e-3, atol=2e-4)
        for k in g_ref[1]:
            np.testing.assert_allclose(
                np.asarray(g[1][k]), np.asarray(g_ref[1][k]),
                rtol=2e-3, atol=2e-4, err_msg=f"weight grad {k}")

    def test_bf16_grads_close(self, problem):
        """bf16 gradient path (split2 de/dW_eall, bf16 dx): relative L2
        error vs the composite bf16 path stays in bf16-rounding range —
        catches dtype-routing bugs the f32 test cannot."""
        x, e, ws, src, dst = problem

        def loss_fn(path):
            def f(x_, e_, ws_):
                a, ea = path(x_, e_, ws_, src, dst, jnp.bfloat16)
                return (jnp.sum(jnp.sin(a.astype(jnp.float32) * 0.1))
                        + jnp.sum(jnp.cos(ea.astype(jnp.float32) * 0.1)))
            return f

        g_ref = jax.grad(loss_fn(_composite), argnums=(2,))(x, e, ws)[0]
        g = jax.grad(loss_fn(_proj), argnums=(2,))(x, e, ws)[0]
        for k in g_ref:
            a = np.asarray(g[k], np.float64).ravel()
            b = np.asarray(g_ref[k], np.float64).ravel()
            denom = np.linalg.norm(b) + 1e-12
            rel = np.linalg.norm(a - b) / denom
            assert rel < 0.06, f"weight grad {k}: rel L2 {rel:.4f}"


class TestModelLevel:
    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    def test_gtconv_proj_matches_nonproj(self, dtype):
        """GT_TPU_PROJ=on vs off on a full GTConv (fold forced on so the
        f32 case exercises the proj path too)."""
        from gt_pyg_tpu.data import get_tensor_data, pad_graph_batch
        from gt_pyg_tpu.nn import GTConv

        dt = jnp.float32 if dtype == "float32" else jnp.bfloat16
        graphs = get_tensor_data(
            ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "CC(C)O", "CCOC"],
            [1.0] * 6, progress=False)
        batch = pad_graph_batch(graphs, tile_edges=64, tiles_multiple=1,
                                graph_pad=6, num_tasks=1)
        conv = GTConv(node_in_dim=32, hidden_dim=32, edge_in_dim=32,
                      num_heads=4, gate=True, norm="bn", dropout=0.0,
                      aggregators=("sum", "mean"), attn_impl="tile",
                      norm_fold="on", dtype=dt)
        nx = jnp.asarray(
            np.random.default_rng(1).normal(
                0, 1, (batch.node_x.shape[0], 32)), dt)
        ea = jnp.asarray(
            np.random.default_rng(2).normal(
                0, 1, (batch.edge_attr.shape[0], 32)), dt)
        kw = dict(node_mask=batch.node_mask, edge_mask=batch.edge_mask,
                  deterministic=True, tile_edges=64)

        old = os.environ.get("GT_TPU_PROJ")
        try:
            os.environ["GT_TPU_PROJ"] = "off"
            v = conv.init({"params": jax.random.PRNGKey(0)}, nx,
                          batch.edge_src, batch.edge_dst, ea, **kw)
            x_off, e_off = conv.apply(v, nx, batch.edge_src,
                                      batch.edge_dst, ea, **kw)
            os.environ["GT_TPU_PROJ"] = "on"
            # same params must be consumable by the proj path
            x_on, e_on = conv.apply(v, nx, batch.edge_src,
                                    batch.edge_dst, ea, **kw)
        finally:
            if old is None:
                os.environ.pop("GT_TPU_PROJ", None)
            else:
                os.environ["GT_TPU_PROJ"] = old
        tol = dict(rtol=2e-4, atol=2e-5) if dtype == "float32" \
            else dict(rtol=0.06, atol=0.06)
        np.testing.assert_allclose(np.asarray(x_on, np.float32),
                                   np.asarray(x_off, np.float32), **tol)
        np.testing.assert_allclose(np.asarray(e_on, np.float32),
                                   np.asarray(e_off, np.float32), **tol)
