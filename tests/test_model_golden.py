"""Whole-model golden parity: GraphTransformerNet forward vs an
independent plain-torch implementation of the reference math, sharing
weights — covers embeddings, the GTConv stack, multi-aggregator pooling
(sum/mean/max/std with PyG's std formula), readout norm, and both heads."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gt_pyg_tpu.data import get_tensor_data, pad_graph_batch
from gt_pyg_tpu.nn import GraphTransformerNet


@pytest.fixture(scope="module")
def setup():
    torch = pytest.importorskip("torch")
    ds = get_tensor_data(["CCO", "c1ccccc1", "CC(=O)O", "C"],
                         [1.0, 2.0, 3.0, 4.0], progress=False)
    batch = pad_graph_batch(ds, node_multiple=16, edge_multiple=32,
                            graph_pad=4)
    model = GraphTransformerNet(
        node_dim_in=140, edge_dim_in=39, hidden_dim=24, num_gt_layers=2,
        num_heads=3, dropout=0.0, norm="ln", gate=True,
        gt_aggregators=("sum", "mean"),
        aggregators=("sum", "mean", "max", "std"))
    v = model.init({"params": jax.random.PRNGKey(3)}, batch,
                   deterministic=True)
    return torch, model, v, batch, ds


def torch_forward(torch, params, batch, ds, hidden=24, heads=3, layers=2):
    """Independent reference-math forward on the REAL (unpadded) graph."""
    dh = hidden // heads

    def t(x):
        return torch.tensor(np.asarray(x))

    def flatten(p, prefix=""):
        out = {}
        for k, v in p.items():
            if isinstance(v, dict) and any(isinstance(x, dict)
                                           for x in v.values()):
                out.update(flatten(v, prefix + k + "."))
            else:
                out[prefix + k] = v
        return out

    p = {k: {kk: t(vv) for kk, vv in v.items()}
         for k, v in flatten(params).items()}

    def lin(name, x):
        w = p[name]["kernel"]
        b = p[name].get("bias")
        return x @ w + (b if b is not None else 0.0)

    def ln(name, x):
        mu = x.mean(-1, keepdim=True)
        var = x.var(-1, unbiased=False, keepdim=True)
        return (x - mu) / torch.sqrt(var + 1e-5) * p[name]["scale"] \
            + p[name]["bias"]

    def mlp(name, x):
        h = torch.nn.functional.gelu(lin(f"{name}.block_0_linear", x),
                                     approximate="none")
        h = torch.nn.functional.gelu(lin(f"{name}.block_1_linear", h),
                                     approximate="none")
        return lin(f"{name}.output_linear", h)

    def head(name, x):
        h = torch.nn.functional.gelu(lin(f"{name}.block_0_linear", x),
                                     approximate="none")
        return lin(f"{name}.output_linear", h)

    # real (unpadded) graph arrays
    n = int(batch.num_nodes)
    e_cnt = int(batch.num_edges)
    x = t(batch.node_x[:n])
    eattr = t(batch.edge_attr[:e_cnt])
    src = torch.tensor(batch.edge_src[:e_cnt].astype(np.int64))
    dst = torch.tensor(batch.edge_dst[:e_cnt].astype(np.int64))
    graph_id = torch.tensor(batch.node_graph[:n].astype(np.int64))
    B = int(batch.num_graphs)

    h = lin("node_emb", x)
    h = ln("input_norm", h)
    e = lin("edge_emb", eattr)

    for li in range(layers):
        g = f"gt_layer_{li}."
        x_norm = ln(g + "norm1", h)
        Q = lin(g + "WQ", x_norm).view(n, heads, dh)
        K = lin(g + "WK", x_norm).view(n, heads, dh)
        V = lin(g + "WV", x_norm).view(n, heads, dh)
        G = lin(g + "n_gate", x_norm).view(n, heads, dh)
        e_norm = ln(g + "norm0e", e)
        E_val = lin(g + "WE_value", e_norm).view(e_cnt, heads, dh)
        E_bias = lin(g + "WE_logits", e)

        logits_vec = Q[dst] * K[src] / math.sqrt(dh)
        logits = logits_vec.sum(-1) + E_bias
        Vj = (V[src] + E_val) * torch.sigmoid(G[src])
        logits = logits * torch.sigmoid(lin(g + "e_gate", e))
        alpha = torch.zeros_like(logits)
        for node in range(n):
            m = dst == node
            if m.any():
                l = logits[m]
                ex = torch.exp(l - l.max(0, keepdim=True).values)
                alpha[m] = ex / (ex.sum(0, keepdim=True) + 1e-16)
        msg = alpha.unsqueeze(-1) * Vj
        agg_sum = torch.zeros(n, heads, dh)
        agg_sum.index_add_(0, dst, msg)
        cnt = torch.zeros(n)
        cnt.index_add_(0, dst, torch.ones(e_cnt))
        agg_mean = agg_sum / cnt.clamp(min=1.0).view(n, 1, 1)
        out = torch.cat([agg_sum, agg_mean], dim=-1).reshape(n, hidden * 2)
        x1 = h + lin(g + "WO", out)
        h = x1 + mlp(g + "ffn", ln(g + "norm2", x1))

        eij = (logits_vec * E_val).reshape(e_cnt, hidden)
        e1 = e + lin(g + "WOe", eij)
        e = e1 + mlp(g + "ffn_e", ln(g + "norm1e", e1))

    # multi-aggregator global pooling: sum/mean/max/std over nodes/graph
    pools = []
    for b in range(B):
        rows = h[graph_id == b]
        s = rows.sum(0)
        m = rows.mean(0)
        mx = rows.max(0).values
        var = (rows * rows).mean(0) - m * m
        std = torch.sqrt(torch.relu(var) + 1e-5)
        pools.append(torch.cat([s, m, mx, std]))
    g_pool = torch.stack(pools)

    latent = ln("readout_norm", g_pool)
    mu = head("mu_mlp", latent)
    log_var = head("log_var_mlp", latent).clamp(-10, 10)
    return mu, log_var, latent


class TestFullModelGolden:
    def test_forward_allclose(self, setup):
        torch, model, v, batch, ds = setup
        pred, log_var, latent = model.apply(v, batch, deterministic=True,
                                            return_latent=True)
        mu_t, lv_t, latent_t = torch_forward(torch, v["params"], batch, ds)
        B = int(batch.num_graphs)
        np.testing.assert_allclose(np.asarray(pred[:B]), mu_t.numpy(),
                                   rtol=5e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(log_var[:B]), lv_t.numpy(),
                                   rtol=5e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(latent[:B]),
                                   latent_t.numpy(), rtol=5e-4, atol=5e-5)

    def test_pallas_model_matches_lax_model(self, setup):
        torch, model, v, batch, ds = setup
        from jax.experimental.pallas import tpu as pltpu

        pred_lax, _ = model.apply(v, batch, deterministic=True)
        model_pl = model.from_config(model.get_config(),
                                     attn_impl="pallas",
                                     gt_aggregators=("sum", "mean"),
                                     aggregators=("sum", "mean", "max",
                                                  "std"))
        with pltpu.force_tpu_interpret_mode():
            pred_pl, _ = model_pl.apply(v, batch, deterministic=True)
        np.testing.assert_allclose(np.asarray(pred_lax),
                                   np.asarray(pred_pl), rtol=1e-4,
                                   atol=1e-5)
