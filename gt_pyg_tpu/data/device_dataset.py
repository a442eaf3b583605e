"""Device-resident dataset with on-device batch materialization.

Motivation: per-step host→device transfers of the padded batch (~6.5 MB)
are both bandwidth and — on tunnelled runtimes — a *host memory leak*
(the axon client pins every transferred buffer; a 2000-epoch run leaks
>100 GB and gets OOM-killed). The TPU-native fix is to ship the
featurized dataset to HBM once and assemble each shuffled minibatch on
device from small gather-index arrays (~100 KB/batch):

    flat features  [N_tot, F], [E_tot, D]      (one transfer, resident)
    per batch:     node_gather [Np], edge_gather [Ep], graph ids [Bp]
    on device:     node_x = flat_x[node_gather]  (zero row for padding)
                   edge_src/dst = flat_local[edge_gather] + per-graph offset
                   masks from index-vs-size compares

Per-graph edges are stored destination-sorted, so concatenation by graph
order preserves the global sorted-by-dst contract of ``pad_graph_batch``.

With ``tile_edges`` set, recipes use the tile-packed layout (see
:class:`gt_pyg_tpu.data.graph.GraphBatch`): the gather index arrays carry
per-tile alignment gaps, and padding edges resolve on device to each
tile's first padding node row.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional, Sequence

import numpy as np

from .graph import (GraphBatch, GraphData, TILE_NODES, _round_up,
                    plan_tiles)

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class IndexBatch:
    """Host-side minibatch recipe (small arrays; the only per-step
    transfer)."""

    node_gather: np.ndarray   # [Np] int32 into flat nodes (N_tot == pad)
    edge_gather: np.ndarray   # [Ep] int32 into flat edges (E_tot == pad)
    graph_ids: np.ndarray     # [Bp] int32 into dataset graphs (G == pad)
    node_offset: np.ndarray   # [Bp+1] int32 padded-layout node start of
                              #   each batch graph (end sentinel == Np)
    edge_offset: np.ndarray   # [Bp+1] int32 padded-layout edge start
    num_nodes: np.ndarray     # [] int32
    num_edges: np.ndarray     # [] int32
    num_graphs: np.ndarray    # [] int32
    # static (pytree aux): edge rows per 128-node tile, or None for flat
    tile_edges: Optional[int] = None

    _ARRAY_FIELDS = ("node_gather", "edge_gather", "graph_ids",
                     "node_offset", "edge_offset", "num_nodes",
                     "num_edges", "num_graphs")


try:
    import jax

    jax.tree_util.register_pytree_node(
        IndexBatch,
        lambda b: (tuple(getattr(b, f) for f in IndexBatch._ARRAY_FIELDS),
                   b.tile_edges),
        lambda aux, vals: IndexBatch(*vals, tile_edges=aux),
    )
except Exception:  # pragma: no cover
    pass


class DeviceDataset:
    """Featurized graphs resident on device, batched by index."""

    def __init__(self, graphs: Sequence[GraphData],
                 num_tasks: Optional[int] = None):
        import jax.numpy as jnp

        G = len(graphs)
        if G == 0:
            raise ValueError("empty dataset")
        F = graphs[0].x.shape[1]
        D = graphs[0].edge_attr.shape[1]
        has_y = graphs[0].y is not None
        T = graphs[0].y.shape[1] if has_y else (num_tasks or 1)

        node_cnt = np.array([g.num_nodes for g in graphs], np.int32)
        edge_cnt = np.array([g.num_edges for g in graphs], np.int32)
        node_off = np.concatenate([[0], np.cumsum(node_cnt)]).astype(np.int32)
        edge_off = np.concatenate([[0], np.cumsum(edge_cnt)]).astype(np.int32)
        n_tot, e_tot = int(node_off[-1]), int(edge_off[-1])

        flat_x = np.zeros((n_tot + 1, F), np.float32)       # +1 zero row
        flat_e = np.zeros((e_tot + 1, D), np.float32)
        loc_src = np.zeros(e_tot + 1, np.int32)
        loc_dst = np.zeros(e_tot + 1, np.int32)
        y = np.zeros((G + 1, T), np.float32)                # +1 zero row
        y_mask = np.zeros((G + 1, T), np.float32)

        for gi, g in enumerate(graphs):
            a, b = node_off[gi], node_off[gi + 1]
            flat_x[a:b] = g.x
            ea, eb = edge_off[gi], edge_off[gi + 1]
            if g.num_edges:
                src = g.edge_index[0].astype(np.int64)
                dst = g.edge_index[1].astype(np.int64)
                order = np.argsort(dst, kind="stable")
                loc_src[ea:eb] = src[order]
                loc_dst[ea:eb] = dst[order]
                flat_e[ea:eb] = g.edge_attr[order]
            if has_y:
                y[gi] = g.y[0]
                y_mask[gi] = g.y_mask[0]

        self.num_graphs_total = G
        self.n_tot, self.e_tot = n_tot, e_tot
        self.node_cnt, self.edge_cnt = node_cnt, edge_cnt
        self.node_off, self.edge_off = node_off, edge_off
        # device-resident tensors (single transfer each)
        self.flat_x = jnp.asarray(flat_x)
        self.flat_e = jnp.asarray(flat_e)
        self.loc_src = jnp.asarray(loc_src)
        self.loc_dst = jnp.asarray(loc_dst)
        self.y = jnp.asarray(y)
        self.y_mask = jnp.asarray(y_mask)

    # ---- host side: minibatch recipes ----
    def index_batch(self, graph_ids: Sequence[int], node_pad: int,
                    edge_pad: int, graph_pad: int) -> IndexBatch:
        """Flat-layout recipe (nodes/edges packed contiguously)."""
        ids = np.asarray(graph_ids, np.int32)
        B = len(ids)
        nn = int(self.node_cnt[ids].sum())
        ne = int(self.edge_cnt[ids].sum())
        if nn > node_pad or ne > edge_pad or B > graph_pad:
            raise ValueError(f"padding too small: {nn}>{node_pad} or "
                             f"{ne}>{edge_pad} or {B}>{graph_pad}")

        starts = [(k, int(self.node_cnt[gi]), int(self.edge_cnt[gi]))
                  for k, gi in enumerate(ids)]
        place_n = np.concatenate([[0], np.cumsum(
            [s[1] for s in starts])]).astype(np.int32)
        place_e = np.concatenate([[0], np.cumsum(
            [s[2] for s in starts])]).astype(np.int32)
        return self._build_recipe(ids, place_n, place_e, node_pad,
                                  edge_pad, graph_pad, tile_edges=None)

    def index_batch_tiled(self, graph_ids: Sequence[int], tile_edges: int,
                          graph_pad: int,
                          tiles_multiple: int = 1,
                          tile_pack: str = "nextfit",
                          min_tiles: int = 0) -> IndexBatch:
        """Tile-packed recipe: packing of the batch graphs into aligned
        128-node / ``tile_edges``-edge tiles. With ``tile_pack="ffd"``
        graph slots are re-ordered into placement order (the
        materializer's searchsorted slot lookup needs ascending
        offsets), so per-slot outputs follow the packed order, not
        ``graph_ids`` order; y/y_mask follow the same order."""
        ids = np.asarray(graph_ids, np.int32)
        B = len(ids)
        if B > graph_pad:
            raise ValueError(f"{B} graphs > graph_pad {graph_pad}")
        tiles = plan_tiles(self.node_cnt[ids], self.edge_cnt[ids],
                           tile_edges, strategy=tile_pack)
        if tile_pack != "nextfit":
            # re-number into placement order: slot k = k-th placed graph
            placement = [k for tile in tiles for k in tile]
            ids = ids[placement]
            pos = 0
            for tile in tiles:
                tile[:] = range(pos, pos + len(tile))
                pos += len(tile)
        if min_tiles and len(tiles) > min_tiles:
            # the stable_tile_count floor is a probed heuristic bound
            # (the caller's actual shuffle streams may differ from the
            # probe streams) — make the resulting one-off recompile
            # attributable instead of silent (ADVICE r4)
            logger.warning(
                "batch needs %d tiles > stable floor %d: this step gets "
                "a larger shape (one extra XLA compile)", len(tiles),
                min_tiles)
        n_tiles = max(_round_up(len(tiles), tiles_multiple), tiles_multiple,
                      int(min_tiles))
        node_pad = n_tiles * TILE_NODES
        edge_pad = n_tiles * tile_edges

        place_n = np.full(B + 1, node_pad, np.int32)
        place_e = np.full(B + 1, edge_pad, np.int32)
        for t, tile in enumerate(tiles):
            no, eo = t * TILE_NODES, t * tile_edges
            for k in tile:
                place_n[k] = no
                place_e[k] = eo
                no += int(self.node_cnt[ids[k]])
                eo += int(self.edge_cnt[ids[k]])
        return self._build_recipe(ids, place_n, place_e, node_pad,
                                  edge_pad, graph_pad,
                                  tile_edges=tile_edges)

    def _build_recipe(self, ids, place_n, place_e, node_pad, edge_pad,
                      graph_pad, tile_edges):
        B = len(ids)
        node_gather = np.full(node_pad, self.n_tot, np.int32)
        edge_gather = np.full(edge_pad, self.e_tot, np.int32)
        node_offset = np.full(graph_pad + 1, node_pad, np.int32)
        edge_offset = np.full(graph_pad + 1, edge_pad, np.int32)
        for k, gi in enumerate(ids):
            a, b = self.node_off[gi], self.node_off[gi + 1]
            node_gather[place_n[k]:place_n[k] + (b - a)] = np.arange(
                a, b, dtype=np.int32)
            ea, eb = self.edge_off[gi], self.edge_off[gi + 1]
            edge_gather[place_e[k]:place_e[k] + (eb - ea)] = np.arange(
                ea, eb, dtype=np.int32)
            node_offset[k] = place_n[k]
            edge_offset[k] = place_e[k]
        gids = np.full(graph_pad, self.num_graphs_total, np.int32)
        gids[:B] = ids
        return IndexBatch(
            node_gather=node_gather, edge_gather=edge_gather,
            graph_ids=gids, node_offset=node_offset,
            edge_offset=edge_offset,
            num_nodes=np.int32(int(self.node_cnt[ids].sum())),
            num_edges=np.int32(int(self.edge_cnt[ids].sum())),
            num_graphs=np.int32(B), tile_edges=tile_edges)

    def stable_tile_count(self, batch_size: int, tile_edges: int,
                          tiles_multiple: int = 8,
                          tile_pack: str = "nextfit",
                          probes: int = 8, slack: int = 1) -> int:
        """A tile count that (with high probability) upper-bounds every
        shuffled batch of ``batch_size`` graphs: max over ``probes``
        simulated shuffle epochs, plus ``slack`` extra multiples, rounded
        to ``tiles_multiple``.

        Padding every training batch to this fixed count keeps the step
        shape CONSTANT across steps/epochs/members — one XLA compile
        instead of one per distinct shape. This matters enormously for
        the vmapped ensemble, whose 9-member program costs minutes per
        compile on the remote toolchain (round-4 incident: the
        decorrelated retrain spent >1 h in a compile storm because each
        step's unified max-of-9 shape wobbled between tile multiples).
        A rare larger batch still works — index_batch_tiled just grows
        past ``min_tiles`` and pays one extra compile."""
        key = ("stc", batch_size, tile_edges, tiles_multiple, tile_pack,
               probes, slack)
        cache = getattr(self, "_stc_cache", None)
        if cache is None:
            cache = self._stc_cache = {}
        if key in cache:
            return cache[key]
        worst = 0
        rng = np.random.default_rng(0xC0FFEE)
        n = self.num_graphs_total
        for _ in range(probes):
            order = rng.permutation(n)
            for s in range(0, n, batch_size):
                ids = order[s:s + batch_size]
                tiles = plan_tiles(self.node_cnt[ids], self.edge_cnt[ids],
                                   tile_edges, strategy=tile_pack)
                worst = max(worst, len(tiles))
        out = _round_up(worst + slack * tiles_multiple, tiles_multiple)
        cache[key] = out
        return out

    def repad(self, ib: IndexBatch, node_pad: int,
              edge_pad: int) -> IndexBatch:
        """Extend a recipe to larger node/edge pads (same graph_pad).

        Used to unify per-member recipes onto one shape before stacking
        them for a vmapped ensemble step. The extension rows are pure
        padding (gather index == n_tot/e_tot ⇒ zero feature row, mask 0);
        offset sentinels that pointed at the old pad are remapped to the
        new pad. For the tiled layout both pads grow by whole tiles
        (node_pad = n_tiles·128, edge_pad = n_tiles·tile_edges), so the
        materializer's per-tile trash rows stay consistent."""
        old_np = ib.node_gather.shape[0]
        old_ep = ib.edge_gather.shape[0]
        if node_pad == old_np and edge_pad == old_ep:
            return ib
        if node_pad < old_np or edge_pad < old_ep:
            raise ValueError("repad only extends")
        if ib.tile_edges is not None:
            if (node_pad % TILE_NODES or edge_pad % ib.tile_edges
                    or node_pad // TILE_NODES != edge_pad // ib.tile_edges):
                raise ValueError("tiled repad must grow by whole tiles")
        ng = np.concatenate([ib.node_gather,
                             np.full(node_pad - old_np, self.n_tot,
                                     np.int32)])
        eg = np.concatenate([ib.edge_gather,
                             np.full(edge_pad - old_ep, self.e_tot,
                                     np.int32)])
        no = np.where(ib.node_offset == old_np, node_pad,
                      ib.node_offset).astype(np.int32)
        eo = np.where(ib.edge_offset == old_ep, edge_pad,
                      ib.edge_offset).astype(np.int32)
        return IndexBatch(node_gather=ng, edge_gather=eg,
                          graph_ids=ib.graph_ids, node_offset=no,
                          edge_offset=eo, num_nodes=ib.num_nodes,
                          num_edges=ib.num_edges,
                          num_graphs=ib.num_graphs,
                          tile_edges=ib.tile_edges)

    def unify_and_stack(self, ibs: Sequence[IndexBatch]) -> IndexBatch:
        """Stack M same-step recipes into one [M, ...] recipe, repadding
        to the max node/edge pad first (vmapped members need one shape)."""
        npad = max(b.node_gather.shape[0] for b in ibs)
        epad = max(b.edge_gather.shape[0] for b in ibs)
        ibs = [self.repad(b, npad, epad) for b in ibs]
        te = ibs[0].tile_edges
        if any(b.tile_edges != te for b in ibs):
            raise ValueError("mixed tile_edges across members")
        arrs = [np.stack([getattr(b, f) for b in ibs])
                for f in IndexBatch._ARRAY_FIELDS]
        return IndexBatch(*arrs, tile_edges=te)

    def iter_index_batches(self, batch_size: int, shuffle: bool = False,
                           rng: Optional[np.random.Generator] = None,
                           node_multiple: int = 1024,
                           edge_multiple: int = 2048,
                           tile_edges: Optional[int] = None,
                           tiles_multiple: int = 8,
                           tile_pack: str = "nextfit",
                           min_tiles: int = 0):
        order = np.arange(self.num_graphs_total)
        if shuffle:
            (rng or np.random.default_rng()).shuffle(order)
        for s in range(0, len(order), batch_size):
            ids = order[s:s + batch_size]
            if tile_edges is not None:
                yield self.index_batch_tiled(ids, tile_edges, batch_size,
                                             tiles_multiple=tiles_multiple,
                                             tile_pack=tile_pack,
                                             min_tiles=min_tiles)
                continue
            nn = int(self.node_cnt[ids].sum())
            ne = int(self.edge_cnt[ids].sum())
            yield self.index_batch(
                ids,
                node_pad=max(_round_up(nn, node_multiple), node_multiple),
                edge_pad=max(_round_up(ne, edge_multiple), edge_multiple),
                graph_pad=batch_size)

    # ---- device side: materialization (call inside jit) ----
    def device_tree(self) -> dict:
        """The device-resident arrays as a pytree — pass this as a jit
        ARGUMENT (closing over large arrays would bake them into the
        compiled program as constants)."""
        return {
            "flat_x": self.flat_x, "flat_e": self.flat_e,
            "loc_src": self.loc_src, "loc_dst": self.loc_dst,
            "y": self.y, "y_mask": self.y_mask,
        }

    def static_meta(self) -> tuple:
        return (self.n_tot, self.e_tot, self.num_graphs_total)

    def materialize(self, ib: IndexBatch) -> GraphBatch:
        return materialize_batch(self.device_tree(), ib, self.static_meta())


def materialize_batch(tree: dict, ib: IndexBatch, meta: tuple) -> GraphBatch:
    """Assemble a GraphBatch on device from the resident arrays and an
    IndexBatch recipe. jit-friendly: `tree` are traced args, `meta`
    static python ints (n_tot, e_tot, num_graphs_total)."""
    import jax.numpy as jnp

    n_tot, e_tot, g_tot = meta
    flat_x, flat_e = tree["flat_x"], tree["flat_e"]
    loc_src_f, loc_dst_f = tree["loc_src"], tree["loc_dst"]

    node_pad = ib.node_gather.shape[0]
    edge_pad = ib.edge_gather.shape[0]
    graph_pad = ib.graph_ids.shape[0]

    node_x = flat_x[ib.node_gather]
    edge_attr = flat_e[ib.edge_gather]
    node_mask = (ib.node_gather < n_tot).astype(jnp.float32)
    edge_mask = (ib.edge_gather < e_tot).astype(jnp.float32)

    # batch graph slot of each node/edge position via the padded-layout
    # start offsets (gap positions resolve to the previous graph but are
    # masked out below)
    pos = jnp.arange(edge_pad, dtype=jnp.int32)
    eslot = jnp.clip(jnp.searchsorted(ib.edge_offset[:-1], pos,
                                      side="right") - 1,
                     0, graph_pad - 1).astype(jnp.int32)
    off_per_edge = ib.node_offset[eslot]
    loc_s = loc_src_f[ib.edge_gather]
    loc_d = loc_dst_f[ib.edge_gather]

    if ib.tile_edges is not None:
        # per-tile trash: the tile's first padding node row (keeps dst
        # sorted and tile-local)
        n_tiles = node_pad // TILE_NODES
        fill = node_mask.reshape(n_tiles, TILE_NODES).sum(
            axis=1).astype(jnp.int32)                      # [n_tiles]
        tile_of_edge = pos // ib.tile_edges
        trash = tile_of_edge * TILE_NODES + fill[tile_of_edge]
    else:
        trash = node_pad
    edge_src = jnp.where(edge_mask > 0, loc_s + off_per_edge, trash)
    edge_dst = jnp.where(edge_mask > 0, loc_d + off_per_edge, trash)

    # node -> batch graph slot
    npos = jnp.arange(node_pad, dtype=jnp.int32)
    nslot = jnp.clip(
        jnp.searchsorted(ib.node_offset[:-1], npos, side="right") - 1,
        0, graph_pad - 1).astype(jnp.int32)
    node_graph = jnp.where(node_mask > 0, nslot, graph_pad)

    perm = jnp.argsort(edge_src, stable=True).astype(jnp.int32)

    y = tree["y"][ib.graph_ids]
    y_mask = tree["y_mask"][ib.graph_ids]
    graph_mask = (ib.graph_ids < g_tot).astype(jnp.float32)

    return GraphBatch(
        node_x=node_x, edge_attr=edge_attr,
        edge_src=edge_src.astype(jnp.int32),
        edge_dst=edge_dst.astype(jnp.int32),
        node_graph=node_graph.astype(jnp.int32),
        edge_perm_src=perm,
        node_mask=node_mask, edge_mask=edge_mask,
        graph_mask=graph_mask, y=y, y_mask=y_mask,
        num_nodes=ib.num_nodes, num_edges=ib.num_edges,
        num_graphs=ib.num_graphs, tile_edges=ib.tile_edges)
