#!/usr/bin/env python
"""Production KSOL (LogS) recipe — same as train_logd with endpoint LogS
(= log10((KSOL+1)*1e-6); reference ``examples/train_ksol.ipynb`` and
``examples/src/utils.py:10``)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from train_logd import run  # noqa: E402

if __name__ == "__main__":
    sys.exit(run("LogS"))
