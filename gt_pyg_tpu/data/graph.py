"""Graph containers: per-molecule ``GraphData`` and padded ``GraphBatch``.

``GraphData`` replaces PyG's ``Data`` (reference ``gt_pyg/data/utils.py:
526-540``) as plain numpy arrays. ``GraphBatch`` replaces
``Batch.from_data_list`` with a TPU-friendly fixed-shape layout:

* nodes/edges concatenated (disjoint union) then padded to bucketed sizes;
* edges sorted by destination node (CSR-like segments) so segment
  softmax/aggregation run on sorted indices;
* padding edges point at a trash node slot (index ``num_nodes``), padding
  nodes at a trash graph slot (index ``num_graphs``), so jit-compiled
  segment ops use ``num_segments = size + 1`` and slice the trash off.

The batch is a pytree and can be donated to jit-compiled steps directly.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

# Node rows per tile in the tile-packed layout (see ``pad_graph_batch``
# with ``tile_edges`` set). Matches the TPU 128-lane register width and
# the model's ``max_nodes_per_graph`` contract.
TILE_NODES = 128


@dataclasses.dataclass
class GraphData:
    """One molecular graph (host-side, numpy)."""

    x: np.ndarray            # [N, F] float32
    edge_index: np.ndarray   # [2, E] int64 (COO, both directions)
    edge_attr: np.ndarray    # [E, D] float32
    y: Optional[np.ndarray] = None       # [1, T] float32
    y_mask: Optional[np.ndarray] = None  # [1, T] float32
    smiles: Optional[str] = None
    compound_id: object = None

    @property
    def num_nodes(self) -> int:
        return int(self.x.shape[0])

    @property
    def num_edges(self) -> int:
        return int(self.edge_index.shape[1])


@dataclasses.dataclass
class GraphBatch:
    """Fixed-shape padded batch of graphs (device-ready pytree).

    Shapes: Np = padded node count, Ep = padded edge count, Bp = padded
    graph count, F/D/T = node/edge/task feature dims.
    """

    node_x: np.ndarray       # [Np, F]
    edge_attr: np.ndarray    # [Ep, D]
    edge_src: np.ndarray     # [Ep] int32 — source node (gather index)
    edge_dst: np.ndarray     # [Ep] int32 — destination node, non-decreasing;
                             #   padding edges have dst == Np (trash slot)
    node_graph: np.ndarray   # [Np] int32 — graph id; padding nodes == Bp
    edge_perm_src: np.ndarray  # [Ep] int32 — permutation that reorders the
                             #   edge arrays by SOURCE node (stable);
                             #   backward-pass reductions over src use it
                             #   to stay on the sorted-segment fast path
    node_mask: np.ndarray    # [Np] float32 (1 = real)
    edge_mask: np.ndarray    # [Ep] float32
    graph_mask: np.ndarray   # [Bp] float32
    y: np.ndarray            # [Bp, T]
    y_mask: np.ndarray       # [Bp, T]
    num_nodes: np.ndarray    # [] int32 — real node count
    num_edges: np.ndarray    # [] int32
    num_graphs: np.ndarray   # [] int32
    # static layout tags (pytree aux data, not arrays): edge rows and
    # node rows per tile in the tile-packed layout (``tile_edges`` is
    # None for the flat layout). Tile-packed batches guarantee, for
    # every tile t:
    #   * nodes [t*NT, (t+1)*NT) and edges [t*TE, (t+1)*TE) belong to
    #     whole graphs (no graph straddles a tile boundary);
    #   * every edge's src/dst lie inside its own tile's node range;
    #   * <= NT-1 real nodes per tile; padding edges point at the tile's
    #     first padding node row (keeps edge_dst globally sorted).
    # ``tile_nodes`` defaults to 128 (the TPU lane width); 256 packs
    # ~2x the graphs per tile — fewer, larger kernel issues at 2x the
    # one-hot incidence FLOPs (the round-5 layout experiment).
    tile_edges: Optional[int] = None
    tile_nodes: int = TILE_NODES

    _ARRAY_FIELDS = ("node_x", "edge_attr", "edge_src", "edge_dst",
                     "node_graph", "edge_perm_src", "node_mask",
                     "edge_mask", "graph_mask", "y", "y_mask",
                     "num_nodes", "num_edges", "num_graphs")


try:  # register as a JAX pytree when jax is importable
    import jax

    jax.tree_util.register_pytree_node(
        GraphBatch,
        lambda b: (tuple(getattr(b, f) for f in GraphBatch._ARRAY_FIELDS),
                   (b.tile_edges, getattr(b, "tile_nodes", TILE_NODES))),
        # aux was a bare tile_edges before tile_nodes existed — accept
        # both forms so old serialized trees keep loading
        lambda aux, vals: GraphBatch(
            *vals,
            tile_edges=aux[0] if isinstance(aux, tuple) else aux,
            tile_nodes=(aux[1] if isinstance(aux, tuple)
                        else TILE_NODES)),
    )
except Exception:  # pragma: no cover
    pass


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def batch_degree_stats(batch: GraphBatch) -> dict:
    """Host-side segment-size stats: max in-degree / out-degree / nodes
    per graph. The ELL segment-op fast path (ops/segment.py) silently
    truncates segments beyond its static bound — validate against the
    model's ``max_in_degree`` / ``max_nodes_per_graph`` before training."""
    emask = np.asarray(batch.edge_mask) > 0
    nmask = np.asarray(batch.node_mask) > 0
    ne = int(emask.sum())
    nn = int(nmask.sum())
    dst = np.asarray(batch.edge_dst)[emask]
    src = np.asarray(batch.edge_src)[emask]
    gid = np.asarray(batch.node_graph)[nmask]
    return {
        "max_in_degree": int(np.bincount(dst).max()) if ne else 0,
        "max_out_degree": int(np.bincount(src).max()) if ne else 0,
        "max_nodes_per_graph": int(np.bincount(gid).max()) if nn else 0,
    }


def check_batch_limits(batch: GraphBatch, max_in_degree: int,
                       max_nodes_per_graph: int) -> None:
    """Raise when the batch violates the model's static segment bounds."""
    stats = batch_degree_stats(batch)
    if stats["max_in_degree"] > max_in_degree:
        raise ValueError(
            f"batch max in-degree {stats['max_in_degree']} exceeds the "
            f"model's max_in_degree={max_in_degree}; raise the limit")
    if stats["max_nodes_per_graph"] > max_nodes_per_graph:
        raise ValueError(
            f"batch max nodes/graph {stats['max_nodes_per_graph']} exceeds "
            f"max_nodes_per_graph={max_nodes_per_graph}; raise the limit")


def plan_tiles(node_counts: Sequence[int], edge_counts: Sequence[int],
               tile_edges: int,
               tile_nodes: int = TILE_NODES,
               strategy: str = "nextfit") -> List[List[int]]:
    """Assign graphs to fixed-size tiles.

    Each tile holds whole graphs, at most ``tile_nodes - 1`` real nodes
    (one row is reserved so padding edges always have an in-tile trash
    node) and at most ``tile_edges`` edges.

    ``strategy="nextfit"`` preserves input order (graphs stream into the
    current tile; a new tile opens when it overflows), so node and edge
    arrays stay sorted by graph / destination.

    ``strategy="ffd"`` is first-fit-decreasing: graphs sorted by node
    count (then edge count) descending, each placed in the first open
    tile with room. Packs markedly tighter on molecular size
    distributions (~95% vs ~87% node fill, and it makes small
    ``tile_edges`` budgets viable, shrinking padded edge rows ~30%) but
    REORDERS graphs — callers must re-number graphs in placement order
    (both packers here do) and must not assume batch graph order matches
    the input list order.
    """
    cap = tile_nodes - 1
    nc = np.asarray(node_counts, np.int64)
    ec = np.asarray(edge_counts, np.int64)
    bad = np.nonzero((nc > cap) | (ec > tile_edges))[0]
    if bad.size:
        gi = int(bad[0])
        raise ValueError(
            f"graph {gi} ({int(nc[gi])} nodes / {int(ec[gi])} edges) "
            f"exceeds the tile budget ({cap} nodes / {tile_edges} edges)")

    if strategy == "nextfit":
        tiles: List[List[int]] = []
        cur: List[int] = []
        n = e = 0
        for gi, (gn, ge) in enumerate(zip(nc, ec)):
            if cur and (n + gn > cap or e + ge > tile_edges):
                tiles.append(cur)
                cur, n, e = [], 0, 0
            cur.append(gi)
            n += int(gn)
            e += int(ge)
        if cur:
            tiles.append(cur)
        return tiles
    if strategy != "ffd":
        raise ValueError(f"unknown tile packing strategy: {strategy!r}")

    order = np.lexsort((-ec, -nc))
    # vectorized first-fit: remaining capacity per open tile
    n_rem = np.empty(len(nc), np.int64)
    e_rem = np.empty(len(ec), np.int64)
    n_open = 0
    tiles = []
    for gi in order:
        gn, ge = int(nc[gi]), int(ec[gi])
        fit = np.nonzero((n_rem[:n_open] >= gn)
                         & (e_rem[:n_open] >= ge))[0]
        if fit.size:
            t = int(fit[0])
        else:
            t = n_open
            n_rem[t], e_rem[t] = cap, tile_edges
            tiles.append([])
            n_open += 1
        n_rem[t] -= gn
        e_rem[t] -= ge
        tiles[t].append(int(gi))
    return tiles


def pad_graph_batch(
    graphs: Sequence[GraphData],
    node_pad: Optional[int] = None,
    edge_pad: Optional[int] = None,
    graph_pad: Optional[int] = None,
    node_multiple: int = 128,
    edge_multiple: int = 128,
    num_tasks: Optional[int] = None,
    use_native: bool = True,
    tile_edges: Optional[int] = None,
    tiles_multiple: int = 1,
    tile_pack: str = "nextfit",
    tile_nodes: int = TILE_NODES,
) -> GraphBatch:
    """Disjoint-union batch with padding to fixed shapes.

    With ``node_pad``/``edge_pad``/``graph_pad`` unset, sizes are rounded up
    to ``*_multiple`` (bucketing keeps the number of distinct compiled
    shapes small).

    With ``tile_edges`` set, the batch uses the tile-packed layout
    (:class:`GraphBatch` docs): graphs are bin-packed into aligned
    128-node / ``tile_edges``-edge tiles whose edges stay tile-local —
    the layout contract of the fused Pallas attention kernel
    (:mod:`gt_pyg_tpu.ops.pallas.gt_tile`). ``node_pad``/``edge_pad``/
    ``node_multiple``/``edge_multiple`` are ignored in that mode; the
    tile count is rounded up to ``tiles_multiple``. ``tile_pack="ffd"``
    packs tiles first-fit-decreasing (tighter, but graphs are REORDERED
    within the batch — per-graph outputs no longer align with the input
    list; y/y_mask travel with each graph, so training and batch-local
    evaluation are unaffected).
    """
    B = len(graphs)
    if B == 0:
        raise ValueError("cannot batch zero graphs")
    F = graphs[0].x.shape[1]
    D = graphs[0].edge_attr.shape[1]

    if tile_edges is not None:
        return _pad_graph_batch_tiled(graphs, tile_edges, graph_pad,
                                      num_tasks, tiles_multiple,
                                      tile_pack, tile_nodes)

    tot_nodes = sum(g.num_nodes for g in graphs)
    tot_edges = sum(g.num_edges for g in graphs)
    Np = node_pad if node_pad is not None else max(_round_up(tot_nodes, node_multiple), node_multiple)
    Ep = edge_pad if edge_pad is not None else max(_round_up(tot_edges, edge_multiple), edge_multiple)
    Bp = graph_pad if graph_pad is not None else B
    if Np < tot_nodes or Ep < tot_edges or Bp < B:
        raise ValueError(
            f"padding too small: nodes {tot_nodes}>{Np} or edges {tot_edges}>{Ep} "
            f"or graphs {B}>{Bp}")

    if graphs[0].y is not None:
        T = graphs[0].y.shape[1]
    else:
        T = num_tasks or 1

    if use_native:
        # Narrow catch (ADVICE r1): only library-availability failures
        # fall back to numpy; a ValueError from the packer means invalid
        # input (bad edge indices) and must propagate, not silently
        # produce a different batch via the fallback.
        try:
            from ..native import pack_batch_native

            fields = pack_batch_native(graphs, Np, Ep, Bp, T)
        except (ImportError, OSError) as e:
            logger.warning("native packer unavailable (%s); "
                           "using the numpy path", e)
            fields = None
        if fields is not None:
            return GraphBatch(**fields)

    node_x = np.zeros((Np, F), dtype=np.float32)
    edge_attr = np.zeros((Ep, D), dtype=np.float32)
    edge_src = np.full((Ep,), Np, dtype=np.int32)
    edge_dst = np.full((Ep,), Np, dtype=np.int32)
    node_graph = np.full((Np,), Bp, dtype=np.int32)
    y = np.zeros((Bp, T), dtype=np.float32)
    y_mask = np.zeros((Bp, T), dtype=np.float32)

    n_off = 0
    e_off = 0
    for gi, g in enumerate(graphs):
        n, e = g.num_nodes, g.num_edges
        node_x[n_off:n_off + n] = g.x
        node_graph[n_off:n_off + n] = gi
        if e:
            src = g.edge_index[0].astype(np.int64)
            dst = g.edge_index[1].astype(np.int64)
            # stable sort by destination -> per-node contiguous segments
            order = np.argsort(dst, kind="stable")
            edge_src[e_off:e_off + e] = (src[order] + n_off).astype(np.int32)
            edge_dst[e_off:e_off + e] = (dst[order] + n_off).astype(np.int32)
            edge_attr[e_off:e_off + e] = g.edge_attr[order]
        if g.y is not None:
            y[gi] = g.y[0]
            y_mask[gi] = g.y_mask[0]
        n_off += n
        e_off += e

    node_mask = (np.arange(Np) < tot_nodes).astype(np.float32)
    edge_mask = (np.arange(Ep) < tot_edges).astype(np.float32)
    graph_mask = (np.arange(Bp) < B).astype(np.float32)
    edge_perm_src = np.argsort(edge_src, kind="stable").astype(np.int32)

    return GraphBatch(
        node_x=node_x, edge_attr=edge_attr,
        edge_src=edge_src, edge_dst=edge_dst,
        node_graph=node_graph, edge_perm_src=edge_perm_src,
        node_mask=node_mask, edge_mask=edge_mask, graph_mask=graph_mask,
        y=y, y_mask=y_mask,
        num_nodes=np.int32(tot_nodes), num_edges=np.int32(tot_edges),
        num_graphs=np.int32(B),
    )


def _pad_graph_batch_tiled(graphs: Sequence[GraphData], tile_edges: int,
                           graph_pad: Optional[int],
                           num_tasks: Optional[int],
                           tiles_multiple: int,
                           tile_pack: str = "nextfit",
                           tile_nodes: int = TILE_NODES) -> GraphBatch:
    """Tile-packed layout (see ``pad_graph_batch`` / ``GraphBatch``)."""
    B = len(graphs)
    NT, TE = int(tile_nodes), tile_edges
    F = graphs[0].x.shape[1]
    D = graphs[0].edge_attr.shape[1]
    Bp = graph_pad if graph_pad is not None else B
    if Bp < B:
        raise ValueError(f"graph_pad {Bp} < {B} graphs")
    if graphs[0].y is not None:
        T = graphs[0].y.shape[1]
    else:
        T = num_tasks or 1

    tiles = plan_tiles([g.num_nodes for g in graphs],
                       [g.num_edges for g in graphs], TE,
                       tile_nodes=NT, strategy=tile_pack)
    n_tiles = max(_round_up(len(tiles), tiles_multiple), tiles_multiple)
    Np, Ep = n_tiles * NT, n_tiles * TE

    node_x = np.zeros((Np, F), dtype=np.float32)
    edge_attr = np.zeros((Ep, D), dtype=np.float32)
    # padding edges default to each tile's node base (overwritten below
    # with base + fill so edge_dst stays globally non-decreasing)
    tile_base = (np.arange(Ep) // TE * NT).astype(np.int32)
    edge_src = tile_base.copy()
    edge_dst = tile_base.copy()
    node_graph = np.full((Np,), Bp, dtype=np.int32)
    y = np.zeros((Bp, T), dtype=np.float32)
    y_mask = np.zeros((Bp, T), dtype=np.float32)
    node_mask = np.zeros((Np,), dtype=np.float32)
    edge_mask = np.zeros((Ep,), dtype=np.float32)

    gi_global = 0
    for t, tile in enumerate(tiles):
        n_off = t * NT
        e_off = t * TE
        for gi in tile:
            g = graphs[gi]
            n, e = g.num_nodes, g.num_edges
            node_x[n_off:n_off + n] = g.x
            node_graph[n_off:n_off + n] = gi_global
            node_mask[n_off:n_off + n] = 1.0
            if e:
                src = g.edge_index[0].astype(np.int64)
                dst = g.edge_index[1].astype(np.int64)
                order = np.argsort(dst, kind="stable")
                edge_src[e_off:e_off + e] = (src[order] + n_off).astype(
                    np.int32)
                edge_dst[e_off:e_off + e] = (dst[order] + n_off).astype(
                    np.int32)
                edge_attr[e_off:e_off + e] = g.edge_attr[order]
                edge_mask[e_off:e_off + e] = 1.0
            if g.y is not None:
                y[gi_global] = g.y[0]
                y_mask[gi_global] = g.y_mask[0]
            n_off += n
            e_off += e
            gi_global += 1
        # trash slot: first padding node row of this tile (fill < NT by
        # the <=127 capacity); >= every real dst in the tile and < the
        # next tile's base, so edge_dst stays sorted
        fill_n = n_off - t * NT
        edge_src[e_off:(t + 1) * TE] = t * NT + fill_n
        edge_dst[e_off:(t + 1) * TE] = t * NT + fill_n

    tot_nodes = int(node_mask.sum())
    tot_edges = int(edge_mask.sum())
    graph_mask = (np.arange(Bp) < B).astype(np.float32)
    edge_perm_src = np.argsort(edge_src, kind="stable").astype(np.int32)

    return GraphBatch(
        node_x=node_x, edge_attr=edge_attr,
        edge_src=edge_src, edge_dst=edge_dst,
        node_graph=node_graph, edge_perm_src=edge_perm_src,
        node_mask=node_mask, edge_mask=edge_mask, graph_mask=graph_mask,
        y=y, y_mask=y_mask,
        num_nodes=np.int32(tot_nodes), num_edges=np.int32(tot_edges),
        num_graphs=np.int32(B), tile_edges=TE, tile_nodes=NT,
    )
