"""Gaussian Network Model positional encodings.

Diagonal of the Kirchhoff (graph Laplacian) pseudoinverse — reference
``gt_pyg/data/utils.py:267-285``.
"""

from __future__ import annotations

import numpy as np


def get_gnm_encodings(adjacency: np.ndarray) -> np.ndarray:
    """Diagonal of pinv(D - A) for adjacency ``A`` ([N, N] -> [N])."""
    n = adjacency.shape[0]
    if n <= 1:
        return np.zeros(n, dtype=float)
    degree = np.diag(adjacency.sum(axis=1))
    kirchhoff = degree - adjacency
    return np.diag(np.linalg.pinv(kirchhoff))
