"""Fused Pallas FFN block (ops/pallas/ffn.py + nn/ffn.py).

The fused kernel must be a drop-in for GTConv's FFN tail —
MLP(Din→H→H→Dout) + output dropout + residual add (reference
``gt_pyg/nn/gt_conv.py:317-321,338-341``) — with an interchangeable
parameter tree (checkpoints swap between paths freely; only the
dropout RNG stream differs, docs/DESIGN.md §9).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gt_pyg_tpu.nn.gt_conv import GTConv
from gt_pyg_tpu.ops.pallas.ffn import fused_ffn, _erf_poly


def _mk_args(key, R=64, din=24, h=48, dout=24, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    xn = jax.random.normal(ks[0], (R, din), dtype)
    xres = jax.random.normal(ks[1], (R, dout), dtype)
    w0 = (jax.random.normal(ks[2], (din, h)) * 0.1).astype(jnp.float32)
    b0 = (jax.random.normal(ks[3], (h,)) * 0.1).astype(jnp.float32)
    w1 = (jax.random.normal(ks[4], (h, h)) * 0.1).astype(jnp.float32)
    b1 = (jax.random.normal(ks[5], (h,)) * 0.1).astype(jnp.float32)
    w2 = (jax.random.normal(ks[6], (h, dout)) * 0.1).astype(jnp.float32)
    b2 = (jax.random.normal(ks[7], (dout,)) * 0.1).astype(jnp.float32)
    return xn, xres, w0, b0, w1, b1, w2, b2


def _ref(xn, xres, w0, b0, w1, b1, w2, b2):
    h0 = jax.nn.gelu(xn @ w0 + b0, approximate=False)
    h1 = jax.nn.gelu(h0 @ w1 + b1, approximate=False)
    return xres + h1 @ w2 + b2


def test_erf_poly_matches_lax_erf():
    x = jnp.linspace(-5.0, 5.0, 4001)
    np.testing.assert_allclose(_erf_poly(x), jax.lax.erf(x), atol=1e-6)


def test_forward_matches_unfused_chain():
    args = _mk_args(jax.random.PRNGKey(0))
    out = fused_ffn(*args, act="gelu")
    np.testing.assert_allclose(out, _ref(*args), atol=1e-5, rtol=1e-5)


def test_gradients_match_unfused_chain():
    args = _mk_args(jax.random.PRNGKey(1))

    def loss_fused(a):
        return jnp.sum(jnp.sin(fused_ffn(*a, act="gelu")))

    def loss_ref(a):
        return jnp.sum(jnp.sin(_ref(*a)))

    g1 = jax.grad(loss_fused)(args)
    g2 = jax.grad(loss_ref)(args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)


def test_multi_grid_step_shapes():
    # R=1024 with rows_per_block=512, blocks_per_step=2 exercises the
    # grid > 1 path and the gradient accumulation across grid steps.
    args = _mk_args(jax.random.PRNGKey(2), R=1024)
    out = fused_ffn(*args, act="gelu")
    np.testing.assert_allclose(out, _ref(*args), atol=1e-5, rtol=1e-5)
    g = jax.grad(lambda a: jnp.sum(fused_ffn(*a, act="gelu")))(args)
    gr = jax.grad(lambda a: jnp.sum(_ref(*a)))(args)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(a, b, atol=3e-5, rtol=1e-4)


def test_unsupported_rows_raise():
    args = _mk_args(jax.random.PRNGKey(3), R=24)  # not a multiple of 16
    with pytest.raises(ValueError, match="pad rows"):
        fused_ffn(*args, act="gelu")


def test_dropout_is_unbiased_and_differentiable():
    args = _mk_args(jax.random.PRNGKey(4), R=256)
    rng = jax.random.PRNGKey(7)
    out = fused_ffn(*args, act="gelu", dropout_rate=0.5, dropout_rng=rng)
    base = _ref(*args)
    # different from the deterministic output, same shape, finite
    assert out.shape == base.shape
    assert bool(jnp.any(jnp.abs(out - base) > 1e-3))
    assert bool(jnp.all(jnp.isfinite(out)))
    g = jax.grad(lambda a: jnp.sum(
        fused_ffn(*a, act="gelu", dropout_rate=0.5, dropout_rng=rng)))(args)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in g)
    # dropped rows of the FFN delta must be exactly xres (mask applied
    # after the output projection): check E[out] tracks base loosely
    mean_err = float(jnp.mean(out - base))
    assert abs(mean_err) < 0.2


def _conv_kwargs(ffn_impl):
    return dict(node_in_dim=32, hidden_dim=32, edge_in_dim=16,
                num_heads=4, gate=True, dropout=0.0, norm="ln",
                aggregators=("sum", "mean"), ffn_impl=ffn_impl)


def _graph(key, n=64, e=128):
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (n, 32))
    src = jax.random.randint(ks[1], (e,), 0, n)
    dst = jnp.sort(jax.random.randint(ks[2], (e,), 0, n))
    ea = jax.random.normal(jax.random.fold_in(key, 9), (e, 16))
    return x, src, dst, ea


def test_gtconv_fused_matches_xla_path():
    """Same params, same graph: fused and XLA FFN paths agree."""
    x, src, dst, ea = _graph(jax.random.PRNGKey(5))
    conv_x = GTConv(**_conv_kwargs("xla"))
    conv_f = GTConv(**_conv_kwargs("fused"))
    params = conv_x.init(jax.random.PRNGKey(6), x, src, dst, ea)
    out_x, e_x = conv_x.apply(params, x, src, dst, ea)
    out_f, e_f = conv_f.apply(params, x, src, dst, ea)
    np.testing.assert_allclose(out_f, out_x, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(e_f, e_x, atol=2e-5, rtol=1e-4)


def test_gtconv_param_trees_interchangeable():
    """init() under either impl produces the identical parameter tree."""
    x, src, dst, ea = _graph(jax.random.PRNGKey(8))
    p_x = GTConv(**_conv_kwargs("xla")).init(jax.random.PRNGKey(9),
                                             x, src, dst, ea)
    p_f = GTConv(**_conv_kwargs("fused")).init(jax.random.PRNGKey(9),
                                               x, src, dst, ea)
    flat_x = jax.tree_util.tree_leaves_with_path(p_x)
    flat_f = jax.tree_util.tree_leaves_with_path(p_f)
    paths_x = [jax.tree_util.keystr(p) for p, _ in flat_x]
    paths_f = [jax.tree_util.keystr(p) for p, _ in flat_f]
    assert paths_x == paths_f
    for (_, a), (_, b) in zip(flat_x, flat_f):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_allclose(a, b)


def test_gtconv_fused_gradients_match():
    x, src, dst, ea = _graph(jax.random.PRNGKey(10))
    conv_x = GTConv(**_conv_kwargs("xla"))
    conv_f = GTConv(**_conv_kwargs("fused"))
    params = conv_x.init(jax.random.PRNGKey(11), x, src, dst, ea)

    def loss(p, conv):
        o, e = conv.apply(p, x, src, dst, ea)
        return jnp.sum(o ** 2) + jnp.sum(e ** 2)

    g_x = jax.grad(loss)(params, conv_x)
    g_f = jax.grad(loss)(params, conv_f)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_x),
            jax.tree_util.tree_leaves_with_path(g_f)):
        np.testing.assert_allclose(
            a, b, atol=5e-4, rtol=5e-3,
            err_msg=jax.tree_util.keystr(pa))
