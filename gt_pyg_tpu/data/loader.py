"""Host-side batch iteration over featurized graphs.

Replaces the reference's ``DataLoader(collate_fn=Batch.from_data_list)``
(train_logd.ipynb cell 5) with bucketed fixed-shape padding: batch sizes
are padded up to multiples so the number of distinct compiled shapes stays
small across an epoch (recompilation-storm avoidance, SURVEY.md §7).
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np

from .graph import GraphData, GraphBatch, pad_graph_batch


def iter_batches(
    graphs: Sequence[GraphData],
    batch_size: int,
    shuffle: bool = False,
    rng: Optional[np.random.Generator] = None,
    node_multiple: int = 1024,
    edge_multiple: int = 2048,
    num_tasks: Optional[int] = None,
    drop_last: bool = False,
    tile_edges: Optional[int] = None,
    tiles_multiple: int = 8,
    tile_pack: str = "nextfit",
) -> Iterator[GraphBatch]:
    """Yield padded :class:`GraphBatch` chunks of ``batch_size`` graphs.

    Every batch is padded to ``batch_size`` graphs (the last one included)
    so the graph dimension is a single compiled shape; node/edge dims are
    bucketed to the given multiples. With ``tile_edges`` set, batches use
    the tile-packed layout (fused-kernel contract) with the tile count
    bucketed to ``tiles_multiple``.
    """
    order = np.arange(len(graphs))
    if shuffle:
        (rng or np.random.default_rng()).shuffle(order)
    for start in range(0, len(order), batch_size):
        idx = order[start:start + batch_size]
        if drop_last and len(idx) < batch_size:
            return
        chunk = [graphs[i] for i in idx]
        if tile_edges is not None:
            yield pad_graph_batch(chunk, tile_edges=tile_edges,
                                  tiles_multiple=tiles_multiple,
                                  graph_pad=batch_size,
                                  num_tasks=num_tasks,
                                  tile_pack=tile_pack)
            continue
        yield pad_graph_batch(
            chunk,
            node_multiple=node_multiple,
            edge_multiple=edge_multiple,
            graph_pad=batch_size,
            num_tasks=num_tasks,
        )


def full_batch(graphs: Sequence[GraphData],
               num_tasks: Optional[int] = None,
               node_multiple: int = 128,
               edge_multiple: int = 128) -> GraphBatch:
    return pad_graph_batch(graphs, node_multiple=node_multiple,
                           edge_multiple=edge_multiple, num_tasks=num_tasks)


def stack_labels(graphs: Sequence[GraphData]):
    """(y [N,T], y_mask [N,T]) across a dataset (for task scales etc.)."""
    y = np.concatenate([g.y for g in graphs], axis=0)
    m = np.concatenate([g.y_mask for g in graphs], axis=0)
    return y, m
