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
