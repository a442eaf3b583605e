"""Golden parity against the reference's ACTUAL source code.

Imports the unmodified ``GTConv`` / ``GraphTransformerNet`` from
``/root/reference/gt_pyg/nn`` (via the pure-torch PyG shim in
``pyg_shim.py``), transfers this framework's initialized weights into
them, and asserts forward allclose — closing the round-2 VERDICT gap
that ``test_model_golden.py`` only checked against a torch
re-implementation *written by the builder* (a shared misreading of
``gt_conv.py:345-393`` would have passed there).

Covers BASELINE config 1 (single GTConv, 10 nodes / 20 edges / 3 heads)
and the 4-molecule whole-model batch, in LayerNorm eval mode and
BatchNorm train mode (masked padded moments vs torch's unpadded ones).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gt_pyg_tpu.data import get_tensor_data, pad_graph_batch
from gt_pyg_tpu.nn import GTConv as JaxGTConv
from gt_pyg_tpu.nn import GraphTransformerNet

torch = pytest.importorskip("torch")

from pyg_shim import load_reference_nn  # noqa: E402

ref_model_mod = load_reference_nn()
RefGTConv = ref_model_mod.GTConv
RefNet = ref_model_mod.GraphTransformerNet

_NORM_NAMES = {"norm1", "norm2", "norm0e", "norm1e", "input_norm",
               "readout_norm"}


# ---------------------------------------------------------------------------
# flax params -> torch state_dict for the reference modules
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + k + "."))
        else:
            out[prefix + k] = np.asarray(v)
    return out


def _rename_component(p: str) -> str:
    """flax module-path component -> torch reference component."""
    if p.startswith("gt_layer_"):
        return "gt_layers." + p[len("gt_layer_"):]
    if p.startswith("block_") and p.endswith("_linear"):
        return f"blocks.{p[len('block_'):-len('_linear')]}.0"
    if p == "output_linear":
        return "output_layer"
    return p


def flax_to_torch_state(params, batch_stats=None):
    flat = [(k, v, False) for k, v in _flatten(params).items()]
    if batch_stats:
        flat += [(k, v, True) for k, v in _flatten(batch_stats).items()]
    state = {}
    for key, val, is_stats in flat:
        parts = key.split(".")
        mod_path = [_rename_component(p) for p in parts[:-1]]
        parent = parts[-2] if len(parts) > 1 else ""
        pname = parts[-1]
        tmod = ".".join(mod_path)
        if parent in _NORM_NAMES:
            name = ({"mean": "running_mean", "var": "running_var"}
                    if is_stats else
                    {"scale": "weight", "bias": "bias"})[pname]
            state[f"{tmod}.{name}"] = torch.tensor(val.copy())
        elif pname == "kernel":
            state[f"{tmod}.weight"] = torch.tensor(
                np.ascontiguousarray(val.T))
        elif pname == "bias":
            state[f"{tmod}.bias"] = torch.tensor(val.copy())
        else:
            raise KeyError(f"unmapped flax param {key}")
    return state


def _load(ref_module, params, batch_stats=None):
    state = flax_to_torch_state(params, batch_stats)
    missing, unexpected = ref_module.load_state_dict(state, strict=False)
    assert not unexpected, f"unexpected keys: {unexpected}"
    bad = [m for m in missing if not m.endswith("num_batches_tracked")]
    assert not bad, f"missing keys: {bad}"


# ---------------------------------------------------------------------------
# BASELINE config 1: single GTConv, 10 nodes / 20 edges / 3 heads
# ---------------------------------------------------------------------------

def _random_graph(n=10, e=20, node_dim=12, edge_dim=7, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=e)
    dst = rng.integers(0, n, size=e)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    x = rng.normal(size=(n, node_dim)).astype(np.float32)
    eattr = rng.normal(size=(e, edge_dim)).astype(np.float32)
    return x, src.astype(np.int32), dst.astype(np.int32), eattr


@pytest.mark.parametrize("gate", [False, True])
@pytest.mark.parametrize("aggrs", [("sum",), ("sum", "mean")])
def test_gtconv_vs_reference_source(gate, aggrs):
    node_dim, edge_dim, heads = 12, 12, 3
    x, src, dst, eattr = _random_graph(node_dim=node_dim,
                                       edge_dim=edge_dim, seed=1)
    jconv = JaxGTConv(node_in_dim=node_dim, hidden_dim=node_dim,
                      edge_in_dim=edge_dim, num_heads=heads, gate=gate,
                      dropout=0.0, norm="ln", aggregators=aggrs)
    v = jconv.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                   jnp.asarray(src), jnp.asarray(dst), jnp.asarray(eattr),
                   deterministic=True)
    x_out, e_out = jconv.apply(v, jnp.asarray(x), jnp.asarray(src),
                               jnp.asarray(dst), jnp.asarray(eattr),
                               deterministic=True)

    rconv = RefGTConv(node_in_dim=node_dim, hidden_dim=node_dim,
                      edge_in_dim=edge_dim, num_heads=heads, gate=gate,
                      dropout=0.0, norm="ln", aggregators=list(aggrs))
    _load(rconv, v["params"])
    rconv.eval()
    edge_index = torch.tensor(np.stack([src, dst]).astype(np.int64))
    with torch.no_grad():
        x_t, e_t = rconv(torch.tensor(x), edge_index, torch.tensor(eattr))

    np.testing.assert_allclose(np.asarray(x_out), x_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e_out), e_t.numpy(),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# whole model on a real 4-molecule batch
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mol_batch():
    ds = get_tensor_data(["CCO", "c1ccccc1", "CC(=O)O", "C"],
                         [1.0, 2.0, 3.0, 4.0], progress=False)
    batch = pad_graph_batch(ds, node_multiple=16, edge_multiple=32,
                            graph_pad=4)
    return ds, batch


def _torch_inputs(batch):
    n, e = int(batch.num_nodes), int(batch.num_edges)
    x = torch.tensor(np.asarray(batch.node_x[:n]))
    eattr = torch.tensor(np.asarray(batch.edge_attr[:e]))
    edge_index = torch.tensor(np.stack([
        np.asarray(batch.edge_src[:e]),
        np.asarray(batch.edge_dst[:e])]).astype(np.int64))
    gid = torch.tensor(np.asarray(batch.node_graph[:n]).astype(np.int64))
    return x, edge_index, eattr, gid


def _make_pair(norm, batch):
    model = GraphTransformerNet(
        node_dim_in=140, edge_dim_in=39, hidden_dim=24, num_gt_layers=2,
        num_heads=3, dropout=0.0, norm=norm, gate=True,
        gt_aggregators=("sum", "mean"),
        aggregators=("sum", "mean", "max", "std"))
    v = model.init({"params": jax.random.PRNGKey(3)}, batch,
                   deterministic=True)
    rnet = RefNet(node_dim_in=140, edge_dim_in=39, hidden_dim=24,
                  num_gt_layers=2, num_heads=3, dropout=0.0, norm=norm,
                  gate=True, gt_aggregators=["sum", "mean"],
                  aggregators=["sum", "mean", "max", "std"])
    return model, v, rnet


def test_model_vs_reference_source_ln(mol_batch):
    ds, batch = mol_batch
    model, v, rnet = _make_pair("ln", batch)
    pred, log_var, latent = model.apply(v, batch, deterministic=True,
                                        return_latent=True)
    _load(rnet, v["params"])
    rnet.eval()
    x, edge_index, eattr, gid = _torch_inputs(batch)
    with torch.no_grad():
        mu_t, lv_t, lat_t = rnet(x, edge_index, eattr, gid,
                                 return_latent=True)
    B = int(batch.num_graphs)
    np.testing.assert_allclose(np.asarray(pred[:B]), mu_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(log_var[:B]), lv_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(latent[:B]), lat_t.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_model_vs_reference_source_bn_train_mode(mol_batch):
    """BatchNorm TRAIN-mode parity: this framework computes masked
    moments over the padded layout; the reference computes them over the
    real rows — they must agree (reference model.py:374-385 semantics
    are exercised separately in the freeze tests)."""
    ds, batch = mol_batch
    model, v, rnet = _make_pair("bn", batch)
    pred, log_var = model.apply(
        v, batch, deterministic=False, zero_var=True,
        rngs={"dropout": jax.random.PRNGKey(0),
              "reparam": jax.random.PRNGKey(1)},
        mutable=["batch_stats"])[0]
    _load(rnet, v["params"], v.get("batch_stats"))
    rnet.train()
    x, edge_index, eattr, gid = _torch_inputs(batch)
    mu_t, lv_t = rnet(x, edge_index, eattr, gid, zero_var=True)
    B = int(batch.num_graphs)
    np.testing.assert_allclose(np.asarray(pred[:B]),
                               mu_t.detach().numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(log_var[:B]),
                               lv_t.detach().numpy(),
                               rtol=2e-4, atol=2e-5)
