"""Data-parallel training over a device mesh (shard_map + psum).

Molecule-level sharding (SURVEY.md §5 "Long-context"): every chip owns a
self-contained padded sub-batch (whole molecules — no halo), computes
loss/grads locally, and gradients are all-reduced over the ``data`` mesh
axis on ICI. BatchNorm statistics sync across replicas through the same
axis (``bn_axis_name="data"`` on the model).

This is the TPU-native replacement for the reference's absent
DDP/NCCL layer (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..data.graph import GraphBatch, pad_graph_batch


def stack_shards(batches: Sequence[GraphBatch]) -> GraphBatch:
    """Stack D per-device GraphBatches into one [D, ...] batch (all shards
    must share padded shapes)."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)


def shard_graphs(graphs, num_shards: int, shard_batch_size: int,
                 node_pad: int, edge_pad: int, num_tasks: int) -> GraphBatch:
    """Split a list of graphs round-robin into ``num_shards`` padded
    sub-batches and stack them for shard_map consumption."""
    shards = []
    for d in range(num_shards):
        chunk = list(graphs[d::num_shards])[:shard_batch_size]
        if not chunk:
            chunk = [graphs[0]]
        shards.append(pad_graph_batch(
            chunk, node_pad=node_pad, edge_pad=edge_pad,
            graph_pad=shard_batch_size, num_tasks=num_tasks))
    return stack_shards(shards)


def make_stacked_shards(graphs, num_shards: int, shard_batch_size: int,
                        num_tasks: int,
                        node_multiple: int = 1024,
                        edge_multiple: int = 2048,
                        tile_edges=None,
                        tiles_multiple: int = 8,
                        tile_pack: str = "nextfit") -> GraphBatch:
    """Round-robin shard a global minibatch into ``num_shards`` padded
    sub-batches with COMMON shapes (max over shards, bucketed) and stack
    them [D, ...] for shard_map. Supports the tile-packed layout."""
    from ..data.graph import _round_up, plan_tiles

    chunks = []
    for d in range(num_shards):
        chunk = list(graphs[d::num_shards])[:shard_batch_size]
        if not chunk:
            chunk = [graphs[0]]
        chunks.append(chunk)

    shards = []
    if tile_edges is not None:
        n_tiles = max(
            len(plan_tiles([g.num_nodes for g in c],
                           [g.num_edges for g in c], tile_edges,
                           strategy=tile_pack))
            for c in chunks)
        n_tiles = max(_round_up(n_tiles, tiles_multiple), tiles_multiple)
        for c in chunks:
            shards.append(pad_graph_batch(
                c, tile_edges=tile_edges, tiles_multiple=n_tiles,
                graph_pad=shard_batch_size, num_tasks=num_tasks,
                tile_pack=tile_pack))
    else:
        nn = max(sum(g.num_nodes for g in c) for c in chunks)
        ne = max(sum(g.num_edges for g in c) for c in chunks)
        node_pad = max(_round_up(nn, node_multiple), node_multiple)
        edge_pad = max(_round_up(ne, edge_multiple), edge_multiple)
        for c in chunks:
            shards.append(pad_graph_batch(
                c, node_pad=node_pad, edge_pad=edge_pad,
                graph_pad=shard_batch_size, num_tasks=num_tasks,
                use_native=False))
    return stack_shards(shards)


def make_dp_train_step(
    model,
    tx,
    loss_fn: Callable,
    mesh: Mesh,
    axis: str = "data",
    zero_var: bool = False,
    tile_edges=None,
):
    """Build a pjit-compiled data-parallel train step.

    ``loss_fn(pred, y, mask, task_scale, rng) -> scalar``. The returned
    step takes (state, stacked_batch [D, ...], lr, task_scale, rng) with
    params/opt state replicated and the batch sharded on its leading axis.
    """

    def per_device_step(params, batch_stats, opt_state, batch: GraphBatch,
                        lr, task_scale, rng):
        # inside shard_map the sharded leading axis remains with local
        # size 1 — strip it to recover the per-device GraphBatch shape
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        rng_drop, rng_rep, rng_loss = jax.random.split(rng, 3)

        def local_loss(p):
            variables = {"params": p, "batch_stats": batch_stats}
            (pred, _), updates = model.apply(
                variables, batch, deterministic=False, zero_var=zero_var,
                rngs={"dropout": rng_drop, "reparam": rng_rep},
                mutable=["batch_stats"])
            y, mask = batch.y, batch.y_mask
            valid = mask * jnp.isfinite(y).astype(mask.dtype)
            return loss_fn(pred, y, valid, task_scale, rng_loss), \
                updates.get("batch_stats", batch_stats)

        (loss, new_bstats), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params)
        # gradient all-reduce over ICI
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        # batch_stats running estimates already see global moments when the
        # model syncs BN through bn_axis_name; otherwise average them
        new_bstats = jax.lax.pmean(new_bstats, axis)

        updates, new_opt = tx.update(grads, opt_state, params)
        import optax

        new_params = optax.apply_updates(params, updates)
        ok = jnp.isfinite(loss)
        sel = lambda a, b: jax.tree_util.tree_map(
            lambda x, y: jnp.where(ok, x, y), a, b)
        return sel(new_params, params), sel(new_bstats, batch_stats), \
            sel(new_opt, opt_state), loss

    batch_spec = jax.tree_util.tree_map(
        lambda _: P(axis), _graphbatch_structure(tile_edges))
    smapped = shard_map(
        per_device_step, mesh=mesh,
        in_specs=(P(), P(), P(), batch_spec, P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
    )
    return jax.jit(smapped)


def _graphbatch_structure(tile_edges=None):
    """A GraphBatch-shaped pytree of placeholders (for building specs).
    ``tile_edges`` must match the batches' static aux tag so the spec
    tree's structure equals the input tree's."""
    z = np.zeros((1,), np.float32)
    zi = np.int32(0)
    return GraphBatch(
        node_x=z, edge_attr=z, edge_src=z, edge_dst=z, node_graph=z,
        edge_perm_src=z,
        node_mask=z, edge_mask=z, graph_mask=z, y=z, y_mask=z,
        num_nodes=zi, num_edges=zi, num_graphs=zi,
        tile_edges=tile_edges)


def make_dp_eval_step(model, mesh: Mesh, axis: str = "data",
                      tile_edges=None):
    """Data-parallel deterministic forward: returns stacked per-device
    (pred, log_var)."""

    def per_device(params, batch_stats, batch: GraphBatch):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        variables = {"params": params, "batch_stats": batch_stats}
        pred, log_var = model.apply(variables, batch, deterministic=True)
        return pred[None], log_var[None]

    batch_spec = jax.tree_util.tree_map(
        lambda _: P(axis), _graphbatch_structure(tile_edges))
    smapped = shard_map(per_device, mesh=mesh,
                        in_specs=(P(), P(), batch_spec),
                        out_specs=(P(axis), P(axis)))
    return jax.jit(smapped)
