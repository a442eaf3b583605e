"""GraphTransformerNet tests — mirrors the reference's
``nn/tests/test_model.py`` coverage: variational contract, latent return,
config round-trip, head-dropout resolution, masking correctness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gt_pyg_tpu.data import get_tensor_data, pad_graph_batch
from gt_pyg_tpu.nn import GraphTransformerNet, num_parameters


@pytest.fixture(scope="module")
def batch():
    ds = get_tensor_data(["CCO", "c1ccccc1", "C", "CC(=O)O"],
                         [1.0, 2.0, 3.0, 4.0], progress=False)
    b = pad_graph_batch(ds, node_multiple=32, edge_multiple=32, graph_pad=8)
    return jax.tree_util.tree_map(jnp.asarray, b)


@pytest.fixture(scope="module")
def model():
    return GraphTransformerNet(node_dim_in=140, edge_dim_in=39,
                               hidden_dim=32, num_gt_layers=2, num_heads=4,
                               dropout=0.1)


@pytest.fixture(scope="module")
def variables(model, batch):
    return model.init({"params": jax.random.PRNGKey(0)}, batch,
                      deterministic=True)


class TestForward:
    def test_shapes(self, model, batch, variables):
        pred, log_var = model.apply(variables, batch, deterministic=True)
        assert pred.shape == (8, 1)
        assert log_var.shape == (8, 1)

    def test_log_var_clamped(self, model, batch, variables):
        _, log_var = model.apply(variables, batch, deterministic=True)
        assert float(log_var.min()) >= -10.0
        assert float(log_var.max()) <= 10.0

    def test_param_count_positive(self, variables):
        assert num_parameters(variables["params"]) > 10_000

    def test_padding_invariance(self, model, variables):
        """Predictions for real graphs must not depend on padding size."""
        ds = get_tensor_data(["CCO", "c1ccccc1"], [1.0, 2.0], progress=False)
        b1 = jax.tree_util.tree_map(jnp.asarray, pad_graph_batch(
            ds, node_multiple=16, edge_multiple=32, graph_pad=4))
        b2 = jax.tree_util.tree_map(jnp.asarray, pad_graph_batch(
            ds, node_multiple=64, edge_multiple=64, graph_pad=8))
        v = model.init({"params": jax.random.PRNGKey(0)}, b1,
                       deterministic=True)
        p1, _ = model.apply(v, b1, deterministic=True)
        p2, _ = model.apply(v, b2, deterministic=True)
        np.testing.assert_allclose(np.asarray(p1[:2]), np.asarray(p2[:2]),
                                   rtol=1e-4, atol=1e-5)


class TestVariationalContract:
    """Reference test_model.py:220-265."""

    def test_training_samples_differ(self, model, batch, variables):
        kwargs = dict(deterministic=False, mutable=["batch_stats"])
        (p1, _), _ = model.apply(variables, batch,
                                 rngs={"dropout": jax.random.PRNGKey(0),
                                       "reparam": jax.random.PRNGKey(1)},
                                 **kwargs)
        (p2, _), _ = model.apply(variables, batch,
                                 rngs={"dropout": jax.random.PRNGKey(0),
                                       "reparam": jax.random.PRNGKey(2)},
                                 **kwargs)
        assert not np.allclose(p1, p2)

    def test_eval_deterministic_equals_mu(self, model, batch, variables):
        p1, lv1 = model.apply(variables, batch, deterministic=True)
        p2, lv2 = model.apply(variables, batch, deterministic=True)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def test_zero_var_deterministic_in_training(self, model, batch, variables):
        kwargs = dict(deterministic=False, zero_var=True,
                      mutable=["batch_stats"])
        (p1, _), _ = model.apply(variables, batch,
                                 rngs={"dropout": jax.random.PRNGKey(5),
                                       "reparam": jax.random.PRNGKey(1)},
                                 **kwargs)
        (p2, _), _ = model.apply(variables, batch,
                                 rngs={"dropout": jax.random.PRNGKey(5),
                                       "reparam": jax.random.PRNGKey(2)},
                                 **kwargs)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def test_log_var_still_returned_with_zero_var(self, model, batch,
                                                  variables):
        _, lv = model.apply(variables, batch, zero_var=True,
                            deterministic=True)
        assert lv.shape == (8, 1)


class TestLatent:
    def test_return_latent_shape(self, model, batch, variables):
        pred, lv, latent = model.apply(variables, batch, deterministic=True,
                                       return_latent=True)
        assert latent.shape == (8, 32)  # num_aggrs(1) * hidden_dim

    def test_default_two_outputs(self, model, batch, variables):
        out = model.apply(variables, batch, deterministic=True)
        assert len(out) == 2


class TestConfig:
    def test_config_round_trip(self):
        m = GraphTransformerNet(node_dim_in=140, edge_dim_in=39,
                                hidden_dim=64, num_gt_layers=3, num_heads=8,
                                gate=True, norm="bn",
                                gt_aggregators=("sum", "mean"),
                                aggregators=("sum", "max"))
        cfg = m.get_config()
        assert cfg["hidden_dim"] == 64
        assert cfg["gt_aggregators"] == ["sum", "mean"]
        m2 = GraphTransformerNet.from_config(cfg)
        assert m2.get_config() == cfg

    def test_head_dropout_resolution(self):
        m = GraphTransformerNet(node_dim_in=4, dropout=0.3)
        assert m.resolved_head_dropout == 0.3
        m = GraphTransformerNet(node_dim_in=4, dropout=0.3, head_dropout=0.1)
        assert m.resolved_head_dropout == 0.1
        assert m.get_config()["head_dropout"] == 0.1

    @pytest.mark.parametrize("kwargs,match", [
        (dict(num_tasks=0), "num_tasks"),
        (dict(num_gt_layers=-1), "num_gt_layers"),
        (dict(dropout=2.0), "dropout"),
        (dict(norm="bogus"), "norm"),
        (dict(aggregators=("nope",)), "unsupported"),
    ])
    def test_invalid_config(self, batch, kwargs, match):
        base = dict(node_dim_in=140, edge_dim_in=39, hidden_dim=16,
                    num_gt_layers=1, num_heads=2)
        base.update(kwargs)
        m = GraphTransformerNet(**base)
        with pytest.raises(ValueError, match=match):
            m.init({"params": jax.random.PRNGKey(0)}, batch,
                   deterministic=True)


class TestBatchNormMasking:
    def test_bn_ignores_padding(self):
        """Masked BN statistics must not change when padding grows."""
        ds = get_tensor_data(["CCO", "c1ccccc1"], [1.0, 2.0], progress=False)
        model = GraphTransformerNet(node_dim_in=140, edge_dim_in=39,
                                    hidden_dim=16, num_gt_layers=1,
                                    num_heads=2, norm="bn", dropout=0.0)
        b1 = jax.tree_util.tree_map(jnp.asarray, pad_graph_batch(
            ds, node_multiple=16, edge_multiple=32, graph_pad=2))
        b2 = jax.tree_util.tree_map(jnp.asarray, pad_graph_batch(
            ds, node_multiple=128, edge_multiple=128, graph_pad=2))
        v = model.init({"params": jax.random.PRNGKey(0)}, b1,
                       deterministic=True)
        rngs = {"dropout": jax.random.PRNGKey(0),
                "reparam": jax.random.PRNGKey(0)}
        (p1, _), s1 = model.apply(v, b1, deterministic=False, zero_var=True,
                                  rngs=rngs, mutable=["batch_stats"])
        (p2, _), s2 = model.apply(v, b2, deterministic=False, zero_var=True,
                                  rngs=rngs, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(p1[:2]), np.asarray(p2[:2]),
                                   rtol=1e-4, atol=1e-5)
        m1 = s1["batch_stats"]["input_norm"]["mean"]
        m2 = s2["batch_stats"]["input_norm"]["mean"]
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                                   rtol=1e-5, atol=1e-6)
