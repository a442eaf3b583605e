"""Multi-host initialization (jax.distributed) and pod-slice meshes.

The reference has no communication backend (SURVEY.md §2.3). TPU-natively:
``jax.distributed.initialize`` joins the hosts, every process sees the
global device set, and meshes span the slice — collectives ride ICI
within the slice and DCN across slices, placed by GSPMD from the sharding
annotations (scaling-book recipe).
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join a multi-host run. On TPU pods all args are auto-detected from
    the environment; pass them explicitly for CPU/GPU clusters. Safe to
    call when already initialized."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        logger.info("jax.distributed initialized: process %d/%d, "
                    "%d local / %d global devices",
                    jax.process_index(), jax.process_count(),
                    jax.local_device_count(), jax.device_count())
    except RuntimeError as e:
        if "already initialized" in str(e):
            logger.debug("jax.distributed already initialized")
        else:
            raise


def global_mesh(axis: str = "data"):
    """1-D data mesh over ALL devices across hosts."""
    from .mesh import make_mesh

    return make_mesh({axis: jax.device_count()})


def local_batch_slice(global_graphs: Sequence, per_host: Optional[int] = None):
    """This host's share of a globally-ordered dataset (contiguous split;
    each host featurizes/feeds only its slice)."""
    p = jax.process_index()
    n = jax.process_count()
    per = per_host or (len(global_graphs) + n - 1) // n
    return list(global_graphs[p * per:(p + 1) * per])


def scaling_efficiency(edges_per_s_1: float, edges_per_s_n: float,
                       n: int) -> float:
    """throughput(n devices) / (n * throughput(1 device)) — the BASELINE
    >=85% 2-host target metric."""
    if edges_per_s_1 <= 0 or n <= 0:
        return 0.0
    return edges_per_s_n / (n * edges_per_s_1)
