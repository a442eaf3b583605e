"""Host featurization pipeline tests (data/pipeline.py): order
preservation and skip semantics under the process pool, worker-exception
propagation, and PrefetchIterator exhaustion / re-raise behavior.

This IS the production featurization path (cli.py, trainer eval,
multitask_ensemble) — the reference's equivalent is the single-threaded
tqdm loop at ``gt_pyg/data/utils.py:474``.
"""

import numpy as np
import pytest

from gt_pyg_tpu.data.pipeline import (PrefetchIterator,
                                      get_tensor_data_parallel,
                                      prefetch_batches)
from gt_pyg_tpu.data import get_tensor_data

SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "CCCC", "CC(C)O",
          "CCOC", "c1ccncc1", "CCS", "CCCl"]
BAD_GASTEIGER = "F[Au](F)F"  # unparameterized metal -> skipped w/ warning


def _graphs_equal(a, b):
    assert len(a) == len(b)
    for ga, gb in zip(a, b):
        np.testing.assert_array_equal(ga.x, gb.x)
        np.testing.assert_array_equal(ga.edge_index, gb.edge_index)
        np.testing.assert_array_equal(ga.edge_attr, gb.edge_attr)
        if ga.y is None:
            assert gb.y is None
        else:
            np.testing.assert_array_equal(ga.y, gb.y)
            np.testing.assert_array_equal(ga.y_mask, gb.y_mask)


class TestParallelFeaturize:
    def test_pooled_equals_serial_in_order(self):
        y = [[float(i)] for i in range(len(SMILES))]
        serial = get_tensor_data(SMILES, y, progress=False)
        pooled = get_tensor_data_parallel(SMILES, y, chunk_size=3,
                                          num_workers=2, progress=False)
        _graphs_equal(serial, pooled)
        # order check: labels come back in input order
        got = [float(g.y[0, 0]) for g in pooled]
        assert got == [float(i) for i in range(len(SMILES))]

    def test_small_input_uses_serial_path(self):
        pooled = get_tensor_data_parallel(SMILES[:3], chunk_size=256,
                                          progress=False)
        serial = get_tensor_data(SMILES[:3], progress=False)
        _graphs_equal(serial, pooled)

    def test_skip_on_chunk_boundary_preserves_alignment(self):
        """The bad-Gasteiger compound sits exactly at a chunk boundary;
        the skip must not shift labels of later chunks (reference skip
        semantics, data/utils.py:496-520)."""
        smiles = SMILES[:3] + [BAD_GASTEIGER] + SMILES[3:6]
        y = [[10.0], [11.0], [12.0], [99.0], [13.0], [14.0], [15.0]]
        pooled = get_tensor_data_parallel(smiles, y, chunk_size=2,
                                          num_workers=2, progress=False)
        assert len(pooled) == 6  # Au complex skipped
        got = [float(g.y[0, 0]) for g in pooled]
        assert got == [10.0, 11.0, 12.0, 13.0, 14.0, 15.0]

    def test_worker_exception_propagates(self):
        """A parse failure inside a worker chunk must raise in the
        caller, not be swallowed by the pool."""
        smiles = SMILES[:4] + ["(("] + SMILES[4:8]
        with pytest.raises(ValueError):
            get_tensor_data_parallel(smiles, chunk_size=2, num_workers=2,
                                     progress=False)

    def test_ids_thread_through_chunks(self):
        """Explicit compound ids must follow their rows into worker
        chunks (they appear in skip warnings and downstream bookkeeping),
        and inference mode (y=None) must work pooled."""
        ids = [f"mol-{i}" for i in range(len(SMILES))]
        pooled = get_tensor_data_parallel(SMILES, ids=ids, chunk_size=3,
                                          num_workers=2, progress=False)
        serial = get_tensor_data(SMILES, ids=ids, progress=False)
        _graphs_equal(serial, pooled)
        assert all(g.y is None for g in pooled)


class TestPrefetchIterator:
    def test_yields_all_in_order_and_stops(self):
        it = PrefetchIterator(iter(range(20)), prefetch=2)
        assert list(it) == list(range(20))
        with pytest.raises(StopIteration):
            next(it)

    def test_exception_reraised_at_point_of_failure(self):
        def gen():
            yield 1
            yield 2
            raise RuntimeError("worker blew up")

        it = PrefetchIterator(gen(), prefetch=1)
        assert next(it) == 1
        assert next(it) == 2
        with pytest.raises(RuntimeError, match="worker blew up"):
            next(it)

    def test_empty_iterator(self):
        assert list(PrefetchIterator(iter(()))) == []

    def test_close_releases_abandoned_worker(self):
        """A consumer that abandons mid-iteration can close() and the
        worker thread exits instead of blocking forever on the full
        queue (ADVICE r4: each abandoned epoch leaked a daemon thread
        plus prefetch+1 packed batches)."""
        it = PrefetchIterator(iter(range(1000)), prefetch=1)
        assert next(it) == 0        # worker is now blocked on put()
        it.close()
        assert not it._thread.is_alive()
        with pytest.raises(StopIteration):
            next(it)

    def test_close_idempotent_and_context_manager(self):
        with PrefetchIterator(iter(range(5)), prefetch=2) as it:
            assert next(it) == 0
        it.close()                  # second close is a no-op
        assert not it._thread.is_alive()

    def test_close_after_exhaustion_is_safe(self):
        it = PrefetchIterator(iter(range(3)), prefetch=2)
        assert list(it) == [0, 1, 2]
        it.close()
        assert not it._thread.is_alive()

    def test_prefetch_batches_integration(self):
        graphs = get_tensor_data(SMILES, [1.0] * len(SMILES),
                                 progress=False)
        batches = list(prefetch_batches(graphs, batch_size=4,
                                        node_multiple=32,
                                        edge_multiple=64))
        assert len(batches) == 3
        assert sum(int(b.num_graphs) for b in batches) == len(SMILES)
