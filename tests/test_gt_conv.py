"""GTConv tests — mirrors the reference's ``nn/tests/test_gt_conv.py``
coverage (shapes, errors, gradients, gating, dropout, pre-norm check,
determinism) plus a golden numeric parity test against an independent
plain-torch implementation of the documented math (BASELINE config 1:
10 nodes / 20 edges / 3 heads)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gt_pyg_tpu.nn import GTConv


def make_graph(rng, n=4, heads=2, node_dim=8, edge_dim=6, cycle=True):
    """A small graph with dst-sorted edges (no padding needed)."""
    if cycle:
        src = np.array([1, 3, 0, 2, 1, 3, 0, 2])
        dst = np.array([0, 0, 1, 1, 2, 2, 3, 3])
        n = 4
    else:
        raise NotImplementedError
    x = rng.standard_normal((n, node_dim)).astype(np.float32)
    e = rng.standard_normal((len(src), edge_dim)).astype(np.float32)
    return (jnp.asarray(x), jnp.asarray(src, jnp.int32),
            jnp.asarray(dst, jnp.int32), jnp.asarray(e))


@pytest.fixture
def graph():
    return make_graph(np.random.default_rng(0))


def init_conv(conv, graph, with_edges=True):
    x, src, dst, e = graph
    return conv.init({"params": jax.random.PRNGKey(0)}, x, src, dst,
                     e if with_edges else None, deterministic=True)


class TestShapes:
    def test_output_shapes(self, graph):
        x, src, dst, e = graph
        conv = GTConv(node_in_dim=8, hidden_dim=8, edge_in_dim=6, num_heads=2)
        v = init_conv(conv, graph)
        xo, eo = conv.apply(v, x, src, dst, e, deterministic=True)
        assert xo.shape == x.shape
        assert eo.shape == e.shape

    def test_no_edge_variant(self, graph):
        x, src, dst, _ = graph
        conv = GTConv(node_in_dim=8, hidden_dim=8, edge_in_dim=None, num_heads=2)
        v = conv.init({"params": jax.random.PRNGKey(0)}, x, src, dst, None,
                      deterministic=True)
        xo, eo = conv.apply(v, x, src, dst, None, deterministic=True)
        assert xo.shape == x.shape
        assert eo is None

    def test_multi_aggregator_shapes(self, graph):
        x, src, dst, e = graph
        conv = GTConv(node_in_dim=8, hidden_dim=8, edge_in_dim=6, num_heads=2,
                      aggregators=("sum", "mean", "max", "std"))
        v = init_conv(conv, graph)
        xo, eo = conv.apply(v, x, src, dst, e, deterministic=True)
        assert xo.shape == x.shape

    def test_edge_attr_required_error(self, graph):
        x, src, dst, e = graph
        conv = GTConv(node_in_dim=8, hidden_dim=8, edge_in_dim=6, num_heads=2)
        v = init_conv(conv, graph)
        with pytest.raises(ValueError, match="edge_attr"):
            conv.apply(v, x, src, dst, None, deterministic=True)


class TestConstructorValidation:
    @pytest.mark.parametrize("kwargs,match", [
        (dict(num_heads=0), "num_heads"),
        (dict(num_heads=3), "divisible"),
        (dict(edge_in_dim=0), "edge_in_dim"),
        (dict(dropout=1.5), "dropout"),
        (dict(aggregators=("bogus",)), "unsupported"),
        (dict(aggregators=()), "at least one"),
    ])
    def test_invalid_args(self, graph, kwargs, match):
        x, src, dst, e = graph
        base = dict(node_in_dim=8, hidden_dim=8, edge_in_dim=6, num_heads=2)
        base.update(kwargs)
        conv = GTConv(**base)
        with pytest.raises(ValueError, match=match):
            init_conv(conv, graph)


class TestBehavior:
    def test_edge_output_depends_on_edge_attr(self, graph):
        x, src, dst, e = graph
        conv = GTConv(node_in_dim=8, hidden_dim=8, edge_in_dim=6, num_heads=2)
        v = init_conv(conv, graph)
        _, e1 = conv.apply(v, x, src, dst, e, deterministic=True)
        _, e2 = conv.apply(v, x, src, dst, e + 1.0, deterministic=True)
        assert not np.allclose(e1, e2)

    def test_gradient_flow(self, graph):
        x, src, dst, e = graph
        conv = GTConv(node_in_dim=8, hidden_dim=8, edge_in_dim=6, num_heads=2)
        v = init_conv(conv, graph)

        def loss(params, x, e):
            xo, eo = conv.apply({"params": params}, x, src, dst, e,
                                deterministic=True)
            return jnp.sum(xo ** 2) + jnp.sum(eo ** 2)

        gp, gx, ge = jax.grad(loss, argnums=(0, 1, 2))(v["params"], x, e)
        assert float(jnp.abs(gx).sum()) > 0
        assert float(jnp.abs(ge).sum()) > 0
        # edge-update path parameters receive gradient
        assert float(jnp.abs(gp["WE_value"]["kernel"]).sum()) > 0
        assert float(jnp.abs(gp["WOe"]["kernel"]).sum()) > 0

    def test_gating_changes_output(self, graph):
        x, src, dst, e = graph
        plain = GTConv(node_in_dim=8, hidden_dim=8, edge_in_dim=6, num_heads=2)
        gated = GTConv(node_in_dim=8, hidden_dim=8, edge_in_dim=6, num_heads=2,
                       gate=True)
        vp = init_conv(plain, graph)
        vg = gated.init({"params": jax.random.PRNGKey(0)}, x, src, dst, e,
                        deterministic=True)
        # copy shared params so the only difference is the gates
        shared = {k: vp["params"][k] for k in vp["params"]}
        merged = dict(vg["params"])
        for k in shared:
            merged[k] = shared[k]
        xo_p, _ = plain.apply(vp, x, src, dst, e, deterministic=True)
        xo_g, _ = gated.apply({"params": merged}, x, src, dst, e,
                              deterministic=True)
        assert not np.allclose(xo_p, xo_g)

    def test_gate_gradients(self, graph):
        x, src, dst, e = graph
        conv = GTConv(node_in_dim=8, hidden_dim=8, edge_in_dim=6, num_heads=2,
                      gate=True)
        v = init_conv(conv, graph)

        def loss(params):
            xo, eo = conv.apply({"params": params}, x, src, dst, e,
                                deterministic=True)
            return jnp.sum(xo ** 2)

        g = jax.grad(loss)(v["params"])
        assert float(jnp.abs(g["n_gate"]["kernel"]).sum()) > 0
        assert float(jnp.abs(g["e_gate"]["kernel"]).sum()) > 0

    def test_dropout_train_vs_eval(self, graph):
        x, src, dst, e = graph
        conv = GTConv(node_in_dim=8, hidden_dim=8, edge_in_dim=6, num_heads=2,
                      dropout=0.5)
        v = init_conv(conv, graph)
        xo_eval, _ = conv.apply(v, x, src, dst, e, deterministic=True)
        xo_tr, _ = conv.apply(v, x, src, dst, e, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(7)})
        assert not np.allclose(xo_eval, xo_tr)

    def test_eval_deterministic(self, graph):
        x, src, dst, e = graph
        conv = GTConv(node_in_dim=8, hidden_dim=8, edge_in_dim=6, num_heads=2,
                      dropout=0.3)
        v = init_conv(conv, graph)
        a, _ = conv.apply(v, x, src, dst, e, deterministic=True)
        b, _ = conv.apply(v, x, src, dst, e, deterministic=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_pre_norm_not_post_normed(self, graph):
        """Pre-norm residual output should NOT look normalized (reference
        test_gt_conv.py:344-372)."""
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32) * 5 + 3)
        _, src, dst, e = graph
        conv = GTConv(node_in_dim=8, hidden_dim=8, edge_in_dim=6, num_heads=2)
        v = conv.init({"params": jax.random.PRNGKey(0)}, x, src, dst, e,
                      deterministic=True)
        xo, _ = conv.apply(v, x, src, dst, e, deterministic=True)
        xo = np.asarray(xo)
        assert not (abs(xo.mean()) < 0.2 and abs(xo.std() - 1) < 0.2)


class TestGoldenParity:
    """Same weights through an independent plain-torch implementation of
    the documented math (SURVEY.md §3.2) must match the lax path."""

    @pytest.mark.parametrize("gate", [False, True])
    def test_allclose_vs_torch(self, gate):
        torch = pytest.importorskip("torch")
        import math

        rng = np.random.default_rng(42)
        n, e_cnt, heads, node_dim, edge_dim, hidden = 10, 20, 3, 7, 5, 12
        # random graph; ensure no self loops, sorted by dst
        src = rng.integers(0, n, size=e_cnt)
        dst = rng.integers(0, n, size=e_cnt)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        order = np.argsort(dst, kind="stable")
        src, dst = src[order], dst[order]
        e_cnt = len(src)
        x = rng.standard_normal((n, node_dim)).astype(np.float32)
        eattr = rng.standard_normal((e_cnt, edge_dim)).astype(np.float32)

        conv = GTConv(node_in_dim=node_dim, hidden_dim=hidden,
                      edge_in_dim=edge_dim, num_heads=heads, gate=gate,
                      dropout=0.0, norm="ln", act="gelu")
        v = conv.init({"params": jax.random.PRNGKey(1)},
                      jnp.asarray(x), jnp.asarray(src, jnp.int32),
                      jnp.asarray(dst, jnp.int32), jnp.asarray(eattr),
                      deterministic=True)
        xo_jax, eo_jax = conv.apply(v, jnp.asarray(x),
                                    jnp.asarray(src, jnp.int32),
                                    jnp.asarray(dst, jnp.int32),
                                    jnp.asarray(eattr), deterministic=True)

        p = jax.tree_util.tree_map(lambda a: torch.tensor(np.asarray(a)),
                                   v["params"])

        def lin(name, t):
            return t @ p[name]["kernel"] + (p[name].get("bias", 0.0)
                                            if "bias" in p[name] else 0.0)

        def ln(name, t):
            mu = t.mean(-1, keepdim=True)
            var = t.var(-1, unbiased=False, keepdim=True)
            return ((t - mu) / torch.sqrt(var + 1e-5)) * p[name]["scale"] \
                + p[name]["bias"]

        def mlp(name, t):
            h = torch.nn.functional.gelu(lin(f"{name}.block_0_linear", t),
                                         approximate="none")
            h = torch.nn.functional.gelu(lin(f"{name}.block_1_linear", h),
                                         approximate="none")
            return lin(f"{name}.output_linear", h)

        # flatten two-level names for MLP access
        flat = {}
        for k, sub in p.items():
            if any(isinstance(vv, dict) for vv in sub.values()):
                for k2, sub2 in sub.items():
                    flat[f"{k}.{k2}"] = sub2
            else:
                flat[k] = sub
        p = flat

        xt = torch.tensor(x)
        et = torch.tensor(eattr)
        src_t = torch.tensor(src, dtype=torch.long)
        dst_t = torch.tensor(dst, dtype=torch.long)
        dh = hidden // heads

        x_norm = ln("norm1", xt)
        Q = lin("WQ", x_norm).view(n, heads, dh)
        K = lin("WK", x_norm).view(n, heads, dh)
        V = lin("WV", x_norm).view(n, heads, dh)
        e_norm = ln("norm0e", et)
        E_val = lin("WE_value", e_norm).view(e_cnt, heads, dh)
        E_bias = lin("WE_logits", et)

        logits_vec = Q[dst_t] * K[src_t] / math.sqrt(dh)
        logits = logits_vec.sum(-1) + E_bias
        Vj = V[src_t] + E_val
        if gate:
            G = lin("n_gate", x_norm).view(n, heads, dh)
            Vj = Vj * torch.sigmoid(G[src_t])
            logits = logits * torch.sigmoid(lin("e_gate", et))
        # segment softmax over incoming edges (dst)
        alpha = torch.zeros_like(logits)
        for node in range(n):
            m = dst_t == node
            if m.any():
                l = logits[m]
                a = torch.softmax(l, dim=0)
                # PyG softmax epsilon variant: exp/(sum+1e-16)
                ex = torch.exp(l - l.max(0, keepdim=True).values)
                a = ex / (ex.sum(0, keepdim=True) + 1e-16)
                alpha[m] = a
        msg = alpha.unsqueeze(-1) * Vj
        out = torch.zeros(n, heads, dh)
        out.index_add_(0, dst_t, msg)
        attn_out = lin("WO", out.reshape(n, hidden))
        x1 = xt + attn_out
        x_out = x1 + mlp("ffn", ln("norm2", x1))

        eij = logits_vec * E_val
        e_attn = lin("WOe", eij.reshape(e_cnt, hidden))
        e1 = et + e_attn
        e_out = e1 + mlp("ffn_e", ln("norm1e", e1))

        np.testing.assert_allclose(np.asarray(xo_jax), x_out.numpy(),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(eo_jax), e_out.numpy(),
                                   rtol=2e-4, atol=2e-5)
