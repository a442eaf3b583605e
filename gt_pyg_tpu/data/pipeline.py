"""Host-side async featurization & prefetch pipeline.

The reference featurizes single-threaded under tqdm
(``gt_pyg/data/utils.py:474``). Here featurization fans out over a
process pool (RDKit-free chemistry kernel is pure Python — real
parallelism needs processes), and device feeding is decoupled with a
double-buffered prefetch iterator so the TPU never waits on the host
(SURVEY.md §7 "Host featurization throughput").
"""

from __future__ import annotations

import logging
import os
import queue
import threading
from concurrent.futures import ProcessPoolExecutor
from typing import Iterable, Iterator, List, Optional, Sequence

logger = logging.getLogger(__name__)


def _featurize_chunk(args):
    smiles, y, ids, standardize = args
    from .featurize import get_tensor_data

    return get_tensor_data(smiles, y, standardize=standardize, ids=ids,
                           progress=False)


def get_tensor_data_parallel(
    x_smiles: List[str],
    y: Optional[List] = None,
    standardize: bool = False,
    ids: Optional[List] = None,
    num_workers: Optional[int] = None,
    chunk_size: int = 256,
    progress: bool = True,
):
    """Parallel ``get_tensor_data`` over a process pool.

    Preserves order and the skip-on-bad-charges semantics (skips happen
    inside each worker chunk). Falls back to the serial path for small
    inputs or when ``num_workers <= 1``.
    """
    from .featurize import get_tensor_data

    if num_workers is None:
        num_workers = min(os.cpu_count() or 1, 8)
    if num_workers <= 1 or len(x_smiles) <= chunk_size:
        return get_tensor_data(x_smiles, y, standardize=standardize,
                               ids=ids, progress=progress)

    n = len(x_smiles)
    y_list = y if y is not None else [None] * n
    ids_list = ids if ids is not None else list(range(n))
    chunks = []
    for s in range(0, n, chunk_size):
        e = s + chunk_size
        chunks.append((x_smiles[s:e],
                       y_list[s:e] if y is not None else None,
                       ids_list[s:e], standardize))

    results: List = []
    with ProcessPoolExecutor(max_workers=num_workers) as pool:
        it = pool.map(_featurize_chunk, chunks)
        if progress:
            try:
                from tqdm.auto import tqdm

                it = tqdm(it, total=len(chunks), desc="Featurizing")
            except ImportError:
                pass
        for part in it:
            results.extend(part)
    return results


class PrefetchIterator:
    """Wrap a batch iterator with a background thread + bounded queue so
    host-side packing overlaps device compute.

    The worker's puts poll a stop flag, so a consumer that abandons the
    iterator mid-epoch (exception in the train loop) can :meth:`close`
    it and the thread exits promptly instead of blocking forever on a
    full queue — without close(), each abandoned epoch would leak a
    daemon thread plus up to ``prefetch + 1`` packed batches for the
    life of the process (ADVICE r4). Supports ``with`` for scoped use."""

    _SENTINEL = object()
    _POLL_S = 0.25

    def __init__(self, it: Iterable, prefetch: int = 2):
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._err: Optional[BaseException] = None
        self._done = False
        self._stop = threading.Event()

        def _put(item) -> bool:
            """Blocking put that aborts when the consumer closed us."""
            while not self._stop.is_set():
                try:
                    self._queue.put(item, timeout=self._POLL_S)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in it:
                    if not _put(item):
                        return      # closed: skip the sentinel too
            except BaseException as e:  # propagate to consumer
                self._err = e
            finally:
                _put(self._SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        # the sentinel is enqueued exactly once — remember exhaustion so
        # a post-exhaustion next() raises instead of blocking forever
        if self._done:
            raise StopIteration
        item = self._queue.get()
        if item is self._SENTINEL:
            self._done = True
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self) -> None:
        """Release the worker thread (idempotent; safe mid-iteration)."""
        self._stop.set()
        try:                         # unblock a put stuck pre-stop
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)
        self._done = True

    def __enter__(self) -> "PrefetchIterator":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def prefetch_batches(graphs: Sequence, batch_size: int, prefetch: int = 2,
                     **iter_kwargs):
    """Prefetching wrapper around :func:`gt_pyg_tpu.data.loader.
    iter_batches`."""
    from .loader import iter_batches

    return PrefetchIterator(
        iter_batches(graphs, batch_size, **iter_kwargs), prefetch=prefetch)
