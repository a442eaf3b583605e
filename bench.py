"""Benchmark: edges/s/chip on batched GraphTransformerNet fwd+bwd.

Runs the flagship production configuration (hidden 128 / 4 GT layers /
8 heads / bn+gate / multi-aggregators — train_logd.ipynb cells 2 & 6) on
one chip with a realistic molecular batch featurized from the OpenADMET
training CSV (synthetic fallback when absent), and measures the full
training step: forward + composite loss + backward + AdamW update.

Prints ONE JSON line:
  {"metric": "edge_layer_throughput_fwdbwd", "value": <edges*layers/s>,
   "unit": "edge-layer/s/chip", "vs_baseline": <value / A100-PyG est.>}

The reference publishes no throughput numbers (SURVEY.md §6); the
baseline constant below is the upper band of PyG GTConv-style
gather/scatter models on A100 (~2e7 edge-layer/s), the "5x over A100
PyG" target's denominator in BASELINE.json.
"""

import functools
import json
import sys
import time

A100_PYG_EDGE_LAYER_PER_S = 2.0e7

BATCH_GRAPHS = 1024
NUM_LAYERS = 4
TIMED_STEPS = 100


def build_batch():
    from gt_pyg_tpu.data import get_tensor_data, pad_graph_batch

    csv = ("/root/reference/examples/data/train-set/"
           "expansion_log_data_train.csv")
    smiles = None
    try:
        import pandas as pd

        df = pd.read_csv(csv)
        smiles = df["SMILES"].tolist()[:BATCH_GRAPHS]
        y = df[["LogD"]].values.tolist()[:BATCH_GRAPHS]
    except Exception:
        base = ["CCO", "c1ccccc1", "CC(=O)Nc1ccc(O)cc1",
                "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "c1ccc2ccccc2c1",
                "CCN(CC)CC", "C1CCCCC1", "c1ccncc1"]
        smiles = (base * (BATCH_GRAPHS // len(base) + 1))[:BATCH_GRAPHS]
        y = [[1.0]] * len(smiles)

    graphs = get_tensor_data(smiles, y, progress=False)
    batch = pad_graph_batch(graphs, node_multiple=1024, edge_multiple=2048,
                            graph_pad=BATCH_GRAPHS)
    return batch


def main():
    import jax
    import jax.numpy as jnp
    import optax

    # NOTE: jax persistent compilation cache is intentionally NOT enabled
    # here — it stalls under the axon remote-compile path.
    # Expose the cpu backend next to the accelerator so un-jitted
    # model.init runs on the host (seconds instead of minutes of remote
    # op-by-op dispatch).
    try:
        cur = jax.config.jax_platforms or ""
        if cur and "cpu" not in cur:
            jax.config.update("jax_platforms", cur + ",cpu")
    except Exception:
        pass

    from gt_pyg_tpu.nn import GraphTransformerNet
    from gt_pyg_tpu.train.losses import custom_loss

    t_setup = time.time()
    batch = build_batch()
    real_edges = int(batch.num_edges)

    model = GraphTransformerNet(
        node_dim_in=140, edge_dim_in=39, hidden_dim=128,
        num_gt_layers=NUM_LAYERS, num_heads=8, dropout=0.3, norm="bn",
        gate=True, gt_aggregators=("sum", "mean"),
        aggregators=("sum", "mean", "max", "std"),
        dtype=jnp.bfloat16,
    )
    from gt_pyg_tpu.train.trainer import init_on_host

    variables = init_on_host(model, batch, jax.random.PRNGKey(0))
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adamw(1e-3, weight_decay=1e-5))
    opt_state = tx.init(variables["params"])
    task_scale = jnp.ones((1,), jnp.float32)

    loss_fn = functools.partial(custom_loss, w_rae=1.0, w_huber=0.25,
                                w_corr=0.25, w_tau=0.1, w_r2=0.1,
                                huber_delta=0.5, tau_temp=2.0)

    @jax.jit
    def train_step(params, bstats, opt_state, batch, rng):
        rd, rr, rl = jax.random.split(rng, 3)

        def f(p):
            (pred, _), upd = model.apply(
                {"params": p, "batch_stats": bstats}, batch,
                deterministic=False,
                rngs={"dropout": rd, "reparam": rr},
                mutable=["batch_stats"])
            pred = pred.astype(jnp.float32)
            valid = batch.y_mask * jnp.isfinite(batch.y).astype(jnp.float32)
            return loss_fn(pred, batch.y, valid, task_scale=task_scale,
                           rng=rl), upd["batch_stats"]

        (loss, nb), grads = jax.value_and_grad(f, has_aux=True)(params)
        updates, no = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), nb, no, loss

    params, bstats = variables["params"], variables.get("batch_stats", {})
    # rbg keys are the framework default: threefry key derivation measured
    # ~11 ms/step of the 62.5 ms flagship step on v5e (RESULTS.md)
    rng = jax.random.key(0, impl="rbg")

    # warmup / compile (value fetch forces real completion — on remote
    # backends block_until_ready alone does not)
    print(f"# setup {time.time()-t_setup:.1f}s; compiling...",
          file=sys.stderr, flush=True)
    params, bstats, opt_state, loss = train_step(params, bstats, opt_state,
                                                 jb, rng)
    t_c0 = time.time()
    loss_val = float(loss)
    t_compile = time.time() - t_setup
    print(f"# compile+first {t_compile:.1f}s (first fetch "
          f"{time.time()-t_c0:.1f}s)", file=sys.stderr, flush=True)

    def run_steps(n, params, bstats, opt_state, rng):
        t0 = time.time()
        for i in range(n):
            rng = jax.random.fold_in(rng, i)
            params, bstats, opt_state, loss = train_step(
                params, bstats, opt_state, jb, rng)
        val = float(loss)  # forced round trip
        return time.time() - t0, val, params, bstats, opt_state, rng

    # tunnel fetch latency is fat-tailed (first post-warmup fetch has been
    # observed to stall ~100s), so time two long runs and take the faster:
    # per-step = min(t_i)/N with one amortized fetch each
    n = TIMED_STEPS
    t_a, loss_val, params, bstats, opt_state, rng = run_steps(
        n, params, bstats, opt_state, rng)
    print(f"# run1 {n} steps: {t_a:.1f}s", file=sys.stderr, flush=True)
    t_b, loss_val, params, bstats, opt_state, rng = run_steps(
        n, params, bstats, opt_state, rng)
    print(f"# run2 {n} steps: {t_b:.1f}s", file=sys.stderr, flush=True)
    dt = min(t_a, t_b) / n
    loss = loss_val

    edge_layer_per_s = real_edges * NUM_LAYERS / dt
    result = {
        "metric": "edge_layer_throughput_fwdbwd",
        "value": round(edge_layer_per_s, 1),
        "unit": "edge-layer/s/chip",
        "vs_baseline": round(edge_layer_per_s / A100_PYG_EDGE_LAYER_PER_S, 3),
        "detail": {
            "batch_graphs": BATCH_GRAPHS,
            "real_edges": real_edges,
            "real_nodes": int(batch.num_nodes),
            "padded_nodes": int(batch.node_x.shape[0]),
            "padded_edges": int(batch.edge_attr.shape[0]),
            "num_gt_layers": NUM_LAYERS,
            "step_time_ms": round(dt * 1000, 2),
            "compile_s": round(t_compile, 1),
            "loss": loss,
            "device": str((__import__("jax")).devices()[0]),
            "dtype": "bfloat16",
            "prng": "rbg",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
