"""Version resolution for gt_pyg_tpu.

Mirrors the reference's provenance strategy (``gt_pyg/_version.py:1-11``,
``gt_pyg/_version_utils.py:18-62``): try ``git describe`` first, then
installed package metadata, then fall back to ``"0+unknown"``.
"""

from .version_utils import get_version

__version__ = get_version()
