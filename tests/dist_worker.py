"""Worker + shared harness for the 2-process jax.distributed test.

Run standalone as one process of a 2-process CPU cluster (4 virtual
devices each → 8 global devices):

    python tests/dist_worker.py <process_id> <coordinator_port> <outfile>

``tests/test_distributed.py`` imports the same harness functions to
compute the single-process reference on its own 8-device mesh, so the
multi-process loss is compared against the identical computation.

SURVEY.md §2.3 / §5: the reference has no distributed communication
backend at all; this exercises the TPU-native one (jax.distributed +
GSPMD collectives over a process-spanning mesh) end to end on the CPU
Gloo backend — the same code path a real multi-host TPU pod takes via
``gt_pyg_tpu.parallel.distributed``.
"""

import json
import sys


def build_inputs():
    """Deterministic tiny problem: 8 molecules, 8 single-graph shards."""
    from gt_pyg_tpu.data import get_tensor_data
    from gt_pyg_tpu.parallel.data_parallel import make_stacked_shards

    smiles = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "CCCC", "CC(C)O",
              "CCOC", "c1ccncc1"]
    y = [float(i) * 0.5 for i in range(len(smiles))]
    graphs = get_tensor_data(smiles, y, progress=False)
    batch = make_stacked_shards(graphs, num_shards=8, shard_batch_size=1,
                                num_tasks=1, node_multiple=32,
                                edge_multiple=64)
    return batch


def make_model_and_step(mesh):
    import optax

    from gt_pyg_tpu.nn import GraphTransformerNet
    from gt_pyg_tpu.parallel.data_parallel import make_dp_train_step
    from gt_pyg_tpu.train.losses import mae_loss

    model = GraphTransformerNet(node_dim_in=140, edge_dim_in=39,
                                hidden_dim=16, num_gt_layers=1,
                                num_heads=2, dropout=0.1, norm="bn",
                                gate=True, bn_axis_name="data",
                                num_tasks=1)
    tx = optax.adamw(1e-3)
    step = make_dp_train_step(
        model, tx,
        loss_fn=lambda pred, y, mask, ts, rng: mae_loss(pred, y, mask),
        mesh=mesh)
    return model, tx, step


def run_one_step(mesh):
    """One DP train step over ``mesh``; returns the (replicated) loss.

    Works identically on a single-process 8-device mesh and on a
    2-process global mesh: all inputs are built as GLOBAL jax.Arrays via
    make_array_from_callback from host data that every process computes
    identically.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch = build_inputs()
    model, tx, step = make_model_and_step(mesh)

    # host-side init (identical on every process: same key, same math)
    one = jax.tree_util.tree_map(lambda x: jnp.asarray(x[0]), batch)
    variables = model.init({"params": jax.random.PRNGKey(0)}, one,
                           deterministic=True)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    def to_global(tree, spec_fn):
        def leaf(x):
            x = np.asarray(x)
            sh = NamedSharding(mesh, spec_fn(x))
            return jax.make_array_from_callback(
                x.shape, sh, lambda idx: x[idx])

        return jax.tree_util.tree_map(leaf, tree)

    g_params = to_global(params, lambda x: P())
    g_bstats = to_global(bstats, lambda x: P())
    g_opt = to_global(opt_state, lambda x: P())
    g_batch = to_global(batch, lambda x: P("data") if x.ndim else P())
    lr = to_global(np.float32(1e-3), lambda x: P())
    ts = to_global(np.ones((1,), np.float32), lambda x: P())
    rng = to_global(np.asarray(jax.random.PRNGKey(7)), lambda x: P())

    _, _, _, loss = step(g_params, g_bstats, g_opt, g_batch, lr, ts, rng)
    return float(np.asarray(loss))


def main():
    import os

    process_id = int(sys.argv[1])
    port = sys.argv[2]
    outfile = sys.argv[3]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gt_pyg_tpu.parallel.distributed import (global_mesh,
                                                 initialize_distributed)

    initialize_distributed(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=process_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8

    mesh = global_mesh("data")
    assert mesh.devices.size == 8

    loss = run_one_step(mesh)
    with open(outfile, "w") as f:
        json.dump({"process_id": process_id,
                   "process_count": jax.process_count(),
                   "global_devices": jax.device_count(),
                   "loss": loss}, f)
    print(f"worker {process_id}: loss={loss}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    main()
