"""Edge-partitioned execution of one giant batched graph (GSPMD mode).

The graph analog of sequence/context parallelism (SURVEY.md §5): the
concatenated node/edge sets of a large batch are sharded across the mesh
— node features, edge features, and the sorted edge lists all split along
their leading dimension. Gathers of remote K/V rows and cross-shard
segment reductions lower to XLA collectives (all-to-all / psum) over ICI;
we annotate shardings and let GSPMD place the communication, per the
scaling-book recipe (pick a mesh → annotate → let XLA insert collectives).

Use when single molecules are no longer the right granularity (huge
batches or graphs larger than one chip's HBM); for ordinary molecular
workloads prefer :mod:`gt_pyg_tpu.parallel.data_parallel`.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.graph import GraphBatch


def edge_partition_spec(axis: str = "data") -> GraphBatch:
    """PartitionSpec tree for a flat GraphBatch: nodes and edges sharded
    along their leading dim, per-graph arrays replicated."""
    return GraphBatch(
        node_x=P(axis, None),
        edge_attr=P(axis, None),
        edge_src=P(axis),
        edge_dst=P(axis),
        node_graph=P(axis),
        edge_perm_src=P(axis),
        node_mask=P(axis),
        edge_mask=P(axis),
        graph_mask=P(),
        y=P(), y_mask=P(),
        num_nodes=P(), num_edges=P(), num_graphs=P(),
    )


def shard_flat_batch(batch: GraphBatch, mesh: Mesh,
                     axis: str = "data") -> GraphBatch:
    """Device-put a flat GraphBatch with the edge-partition layout.

    Padded node/edge counts must be divisible by the mesh axis size
    (``pad_graph_batch``'s multiples handle this).
    """
    spec = edge_partition_spec(axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        batch, spec)


def make_edge_partitioned_apply(model, mesh: Mesh, axis: str = "data",
                                deterministic: bool = True):
    """jit-compiled forward over an edge-partitioned batch. GSPMD chooses
    the collective schedule; outputs are replicated per-graph arrays."""

    def fwd(params, batch_stats, batch: GraphBatch):
        variables = {"params": params, "batch_stats": batch_stats}
        return model.apply(variables, batch, deterministic=deterministic)

    in_shardings = (
        NamedSharding(mesh, P()),
        NamedSharding(mesh, P()),
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s),
                               edge_partition_spec(axis)),
    )
    out_shardings = NamedSharding(mesh, P())
    return jax.jit(fwd, in_shardings=in_shardings,
                   out_shardings=out_shardings)


def make_edge_partitioned_train_step(model, tx, loss_fn, mesh: Mesh,
                                     axis: str = "data",
                                     zero_var: bool = False):
    """Full training step (loss + backward + optimizer) over an
    edge-partitioned batch.

    The step body is the plain single-device program; only the argument
    shardings differ — GSPMD propagates the node/edge partitioning
    through the gathers and segment reductions (fwd AND bwd) and inserts
    the all-to-all/psum collectives. Gradient equality vs single-device
    therefore holds up to float reassociation and is asserted in
    ``tests/test_edge_partition_train.py``.

    ``loss_fn(pred, y, mask, task_scale, rng) -> scalar``. Returns a
    jitted ``step(params, batch_stats, opt_state, batch, lr, task_scale,
    rng) -> (params, batch_stats, opt_state, loss)`` with replicated
    state in/out and NaN-loss skip semantics.
    """
    import jax.numpy as jnp
    import optax

    def step(params, batch_stats, opt_state, batch: GraphBatch, lr,
             task_scale, rng):
        rng_drop, rng_rep, rng_loss = jax.random.split(rng, 3)

        def f(p):
            variables = {"params": p, "batch_stats": batch_stats}
            (pred, _), updates = model.apply(
                variables, batch, deterministic=False, zero_var=zero_var,
                rngs={"dropout": rng_drop, "reparam": rng_rep},
                mutable=["batch_stats"])
            y, mask = batch.y, batch.y_mask
            valid = mask * jnp.isfinite(y).astype(mask.dtype)
            # pred rides the aux into the returned ok (finiteness check +
            # keeps pred live as a program output — see the wrong-code
            # note in train/trainer.py:_train_step_impl)
            return loss_fn(pred, y, valid, task_scale, rng_loss), \
                (updates.get("batch_stats", batch_stats), pred)

        (loss, (new_bstats, pred)), grads = jax.value_and_grad(
            f, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        ok = (jnp.isfinite(loss) & jnp.isfinite(pred).all()
              & jnp.isfinite(optax.global_norm(grads)))
        sel = lambda a, b: jax.tree_util.tree_map(
            lambda x, y: jnp.where(ok, x, y), a, b)
        return (sel(new_params, params), sel(new_bstats, batch_stats),
                sel(new_opt, opt_state), loss)

    rep = NamedSharding(mesh, P())
    batch_shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), edge_partition_spec(axis))
    return jax.jit(
        step,
        in_shardings=(rep, rep, rep, batch_shardings, rep, rep, rep),
        out_shardings=(rep, rep, rep, rep))
