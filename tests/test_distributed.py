"""2-process jax.distributed exercise of gt_pyg_tpu.parallel.distributed.

The reference has NO distributed backend (SURVEY.md §2.3); ours is
``jax.distributed.initialize`` + a process-spanning mesh + GSPMD
collectives. Real multi-host TPU hardware is not available here, so this
drives the identical code path on the CPU Gloo backend: two OS processes
(4 virtual devices each) join a coordinator, build one 8-device global
mesh, and run a full data-parallel train step (psum'ed grads, synced BN)
whose loss must equal the single-process 8-device run bit-for-bit-ish.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

from gt_pyg_tpu.parallel.distributed import (local_batch_slice,
                                             scaling_efficiency)

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestHelpers:
    def test_scaling_efficiency(self):
        assert scaling_efficiency(100.0, 170.0, 2) == pytest.approx(0.85)
        assert scaling_efficiency(0.0, 10.0, 2) == 0.0
        assert scaling_efficiency(100.0, 200.0, 0) == 0.0

    def test_local_batch_slice_single_process(self):
        # single-process: slice must cover everything for process 0
        data = list(range(10))
        assert local_batch_slice(data) == data
        assert local_batch_slice(data, per_host=4) == data[:4]


@pytest.mark.slow
class TestTwoProcess:
    def test_two_process_dp_step_matches_single_process(self, tmp_path):
        """Spawn a real 2-process CPU cluster and assert the DP train
        step's loss equals the single-process 8-device run."""
        from dist_worker import run_one_step

        # ---- single-process reference on this process's 8 devices ----
        from gt_pyg_tpu.parallel.mesh import make_mesh

        mesh = make_mesh({"data": 8})
        ref_loss = run_one_step(mesh)
        assert np.isfinite(ref_loss)

        # ---- 2-process run ----
        port = _free_port()
        outs = [tmp_path / f"w{i}.json" for i in range(2)]
        procs = [
            subprocess.Popen(
                [sys.executable, str(REPO / "tests" / "dist_worker.py"),
                 str(i), str(port), str(outs[i])],
                cwd=REPO, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True)
            for i in range(2)
        ]
        logs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            logs.append(out)
        for i, p in enumerate(procs):
            assert p.returncode == 0, (
                f"worker {i} failed:\n{logs[i][-4000:]}")

        results = [json.loads(o.read_text()) for o in outs]
        for r in results:
            assert r["process_count"] == 2
            assert r["global_devices"] == 8
        # both processes observe the same replicated loss
        assert results[0]["loss"] == pytest.approx(results[1]["loss"],
                                                   rel=1e-6)
        # and it equals the single-process 8-device computation
        assert results[0]["loss"] == pytest.approx(ref_loss, rel=1e-5), (
            f"2-process loss {results[0]['loss']} != single-process "
            f"{ref_loss}")
