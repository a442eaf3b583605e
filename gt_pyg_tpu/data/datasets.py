"""ADMET dataset utilities: endpoint conversion table, CSV loading,
splits, submission post-processing.

Library form of the reference's ``examples/src/utils.py`` (9-endpoint
assay conversion with log-scale flags + multipliers;
``inverse_log_transform_assay_data`` :24-59) and the notebook data-prep
cells (shuffle seed 42 / 80-20 split — train_logd.ipynb cell 3; test-time
clipping to the train range — cell 16).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# Assay -> (log_scale, multiplier, log column name)
# (examples/src/utils.py:6-19)
ASSAY_CONVERSIONS: Dict[str, Tuple[bool, float, str]] = {
    "LogD": (False, 1.0, "LogD"),
    "KSOL": (True, 1e-6, "LogS"),
    "HLM CLint": (True, 1.0, "Log_HLM_CLint"),
    "MLM CLint": (True, 1.0, "Log_MLM_CLint"),
    "Caco-2 Permeability Papp A>B": (True, 1e-6, "Log_Caco_Papp_AB"),
    "Caco-2 Permeability Efflux": (True, 1.0, "Log_Caco_ER"),
    "MPPB": (True, 1.0, "Log_Mouse_PPB"),
    "MBPB": (True, 1.0, "Log_Mouse_BPB"),
    "MGMB": (True, 1.0, "Log_Mouse_MPB"),
}

# the 9 log-endpoint columns of the expansion training CSV
LOG_ENDPOINTS: List[str] = [v[2] for v in ASSAY_CONVERSIONS.values()]

ID_COLS = ("SMILES", "Molecule Name")


def inverse_log_transform_assay_data(df):
    """Recover original assay values from log columns:
    ``orig = clip((10**x) / multiplier - 1, 0)`` for log-scale assays
    (examples/src/utils.py:24-59). Returns (output_df, reverse_dict)."""
    import pandas as pd

    reverse = {log_name: (assay, log_scale, mult)
               for assay, (log_scale, mult, log_name)
               in ASSAY_CONVERSIONS.items()}
    out = df[list(ID_COLS)].copy()
    for col in df.columns[2:]:
        if col == "dataset":
            continue
        if col not in reverse:
            print(f"Skipping unrecognized column: {col}")
            continue
        assay, log_scale, mult = reverse[col]
        vals = df[col].astype(float)
        if log_scale:
            vals = ((10.0 ** vals) * (1.0 / mult) - 1).clip(lower=0)
        out[assay] = vals
    return out, reverse


def log_transform_assay_data(df):
    """Forward transform: raw assay columns → log endpoint columns
    (``Log_name = log10((orig + 1) * multiplier)`` for log-scale assays;
    LogD passthrough). Inverse of ``inverse_log_transform_assay_data``;
    used to evaluate predictions against raw-valued test CSVs."""
    import pandas as pd

    out = df.copy()
    for assay, (log_scale, mult, log_name) in ASSAY_CONVERSIONS.items():
        if assay not in df.columns or log_name in df.columns:
            continue
        vals = df[assay].astype(float)
        if log_scale:
            with np.errstate(divide="ignore", invalid="ignore"):
                out[log_name] = np.log10((vals + 1.0) * mult)
        else:
            out[log_name] = vals
    return out


def load_admet_csv(path, endpoints: Optional[Sequence[str]] = None):
    """Load an OpenADMET-format CSV → (smiles, y, ids, df).

    ``y`` is a list of per-row label lists over ``endpoints`` (NaN kept
    for masking)."""
    import pandas as pd

    df = pd.read_csv(path)
    if endpoints is None:
        endpoints = [c for c in LOG_ENDPOINTS if c in df.columns]
    missing = [c for c in endpoints if c not in df.columns]
    if missing:
        raise ValueError(f"CSV {path} is missing endpoint columns {missing}")
    smiles = df["SMILES"].tolist()
    ids = (df["Molecule Name"].tolist() if "Molecule Name" in df.columns
           else list(range(len(df))))
    y = df[list(endpoints)].values.tolist()
    return smiles, y, ids, df


def shuffle_split(df, train_frac: float = 0.8, seed: int = 42,
                  num_train: Optional[int] = None,
                  num_val: Optional[int] = None):
    """Notebook split semantics (train_logd.ipynb cell 3): global shuffle
    with ``random_state=seed`` then head/tail split."""
    df = df.sample(frac=1, random_state=seed).reset_index(drop=True)
    if num_train is not None and num_val is not None:
        return df.iloc[:num_train].copy(), \
            df.iloc[num_train:num_train + num_val].copy()
    n_train = int(train_frac * len(df))
    return df.iloc[:n_train].copy(), df.iloc[n_train:].copy()


def clip_to_train_range(preds: np.ndarray, train_mins, train_maxs,
                        delta: float = 0.0) -> np.ndarray:
    """Test-time clipping to [min - d*range, max + d*range]
    (train_logd.ipynb cell 16, DELTA=0)."""
    preds = np.asarray(preds, dtype=float).copy()
    mins = np.asarray(train_mins, dtype=float)
    maxs = np.asarray(train_maxs, dtype=float)
    rng = maxs - mins
    return np.clip(preds, mins - delta * rng, maxs + delta * rng)


def build_submission(test_df, preds: np.ndarray,
                     endpoints: Sequence[str], train_mins, train_maxs,
                     delta: float = 0.0):
    """Clip, inverse-transform, and assemble a submission DataFrame."""
    import pandas as pd

    preds = clip_to_train_range(preds, train_mins, train_maxs, delta)
    out = test_df[list(ID_COLS)].copy()
    for i, ep in enumerate(endpoints):
        out[ep] = preds[:, i]
    submission, _ = inverse_log_transform_assay_data(out)
    return submission
