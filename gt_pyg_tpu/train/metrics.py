"""Evaluation metrics + bootstrap machinery (host-side numpy).

Implements the reference notebooks' metric stack as library code
(SURVEY.md §5 "Metrics"): ``safe_metrics`` / ``official_metrics``
(train_logd.ipynb cell 8), per-task + macro averaging, and the bootstrap
mean±std / pairwise-significance evaluator (OpenADMET-LogD.ipynb cell 24,
compare_predictions.ipynb cells 3/9).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
from scipy.stats import kendalltau, spearmanr

OFFICIAL_KEYS = ["MAE", "RAE", "R2", "Spearman R", "Kendall's Tau"]


def _r2_score(y, p):
    ss_res = np.sum((y - p) ** 2)
    ss_tot = np.sum((y - np.mean(y)) ** 2)
    if ss_tot == 0:
        return np.nan
    return 1.0 - ss_res / ss_tot


def safe_metrics(y_true, y_pred) -> Dict[str, float]:
    """mse/mae/r2/spearman_rho/kendall_tau with degenerate-input guards."""
    y = np.asarray(y_true).ravel()
    p = np.asarray(y_pred).ravel()
    mse = float(np.mean((y - p) ** 2))
    mae = float(np.mean(np.abs(y - p)))
    r2 = float(_r2_score(y, p)) if len(np.unique(y)) > 1 else np.nan
    rho = float(spearmanr(y, p)[0])
    tau = float(kendalltau(y, p)[0])
    return {"mse": mse, "mae": mae, "r2": r2,
            "spearman_rho": rho, "kendall_tau": tau}


def official_metrics(y_true_1d, y_pred_1d) -> Dict[str, float]:
    """The benchmark's official metric set with nan-safety rules."""
    y = np.asarray(y_true_1d).ravel()
    p = np.asarray(y_pred_1d).ravel()
    m = np.isfinite(y) & np.isfinite(p)
    y, p = y[m], p[m]
    if y.size == 0:
        return {k: np.nan for k in OFFICIAL_KEYS}
    mae = float(np.mean(np.abs(y - p)))
    denom = np.mean(np.abs(y - np.mean(y)))
    rae = float(mae / denom) if denom and np.isfinite(denom) and denom > 0 else np.nan
    r2 = float(_r2_score(y, p)) if np.nanstd(y) > 0 else np.nan
    if np.nanstd(p) < 1e-4:
        spr, ktau = np.nan, np.nan
    else:
        spr = float(spearmanr(y, p)[0])
        ktau = float(kendalltau(y, p)[0])
    return {"MAE": mae, "RAE": rae, "R2": r2, "Spearman R": spr,
            "Kendall's Tau": ktau}


def per_task_metrics(y_true_2d, y_pred_2d, mask_2d,
                     names: Sequence[str]) -> Dict[str, Dict[str, float]]:
    out: Dict[str, Dict[str, float]] = {}
    for t, name in enumerate(names):
        m = np.asarray(mask_2d)[:, t].astype(bool)
        if m.sum() < 3:
            out[name] = {"mse": np.nan, "mae": np.nan, "r2": np.nan,
                         "spearman_rho": np.nan, "kendall_tau": np.nan,
                         "n": int(m.sum())}
            continue
        mt = safe_metrics(np.asarray(y_true_2d)[m, t],
                          np.asarray(y_pred_2d)[m, t])
        mt["n"] = int(m.sum())
        mt.update(official_metrics(np.asarray(y_true_2d)[m, t],
                                   np.asarray(y_pred_2d)[m, t]))
        out[name] = mt
    return out


def _nanmean(vals) -> float:
    """np.nanmean without the "Mean of empty slice" RuntimeWarning when
    every entry is NaN (routine for endpoints absent from a split)."""
    v = np.asarray(vals, dtype=float)
    v = v[np.isfinite(v)]
    return float(v.mean()) if v.size else float("nan")


def macro_official_avg(metrics_dict: Dict[str, Dict[str, float]]) -> Dict[str, float]:
    vals: Dict[str, List[float]] = {k: [] for k in OFFICIAL_KEYS}
    for ep, md in metrics_dict.items():
        if ep == "Average":
            continue
        for k in OFFICIAL_KEYS:
            vals[k].append(md.get(k, np.nan))
    return {k: (_nanmean(v) if len(v) else np.nan)
            for k, v in vals.items()}


def evaluate_predictions(y_true_2d, y_pred_2d, mask_2d,
                         names: Sequence[str]) -> Dict[str, Dict[str, float]]:
    """Per-endpoint official metrics + 'Average' macro row (the notebook
    ``evaluate`` aggregation, train_logd.ipynb cell 9)."""
    task_metrics = per_task_metrics(y_true_2d, y_pred_2d, mask_2d, names)
    per_key: Dict[str, List[float]] = {k: [] for k in OFFICIAL_KEYS}
    for i, ep in enumerate(names):
        m = np.asarray(mask_2d)[:, i].astype(bool)
        official = (official_metrics(np.asarray(y_true_2d)[m, i],
                                     np.asarray(y_pred_2d)[m, i])
                    if m.sum() > 0 else {k: np.nan for k in OFFICIAL_KEYS})
        for k in OFFICIAL_KEYS:
            per_key[k].append(official[k])
    task_metrics["Average"] = {k: _nanmean(per_key[k])
                               for k in OFFICIAL_KEYS}
    return task_metrics


def bootstrap_metrics(
    y_true, y_pred, n_boot: int = 1000,
    seed: int = 0, metric_fn=official_metrics,
) -> Dict[str, Dict[str, float]]:
    """Bootstrap mean±std for each official metric
    (OpenADMET-LogD.ipynb cell 24)."""
    y = np.asarray(y_true).ravel()
    p = np.asarray(y_pred).ravel()
    m = np.isfinite(y) & np.isfinite(p)
    y, p = y[m], p[m]
    rng = np.random.default_rng(seed)
    samples: Dict[str, List[float]] = {}
    n = len(y)
    for _ in range(n_boot):
        idx = rng.integers(0, n, size=n)
        mt = metric_fn(y[idx], p[idx])
        for k, v in mt.items():
            samples.setdefault(k, []).append(v)
    return {k: {"mean": float(np.nanmean(v)), "std": float(np.nanstd(v))}
            for k, v in samples.items()}


def bootstrap_significance(
    y_true, preds_a, preds_b, metric: str = "MAE",
    n_boot: int = 1000, seed: int = 0,
) -> Dict[str, float]:
    """Paired-bootstrap comparison of two models on the same samples
    (compare_predictions.ipynb cell 9): P(model A better than B)."""
    y = np.asarray(y_true).ravel()
    a = np.asarray(preds_a).ravel()
    b = np.asarray(preds_b).ravel()
    m = np.isfinite(y) & np.isfinite(a) & np.isfinite(b)
    y, a, b = y[m], a[m], b[m]
    rng = np.random.default_rng(seed)
    n = len(y)
    wins, diffs = 0, []
    bigger_is_better = metric in ("R2", "Spearman R", "Kendall's Tau")
    for _ in range(n_boot):
        idx = rng.integers(0, n, size=n)
        ma = official_metrics(y[idx], a[idx])[metric]
        mb = official_metrics(y[idx], b[idx])[metric]
        d = ma - mb
        diffs.append(d)
        better = d > 0 if bigger_is_better else d < 0
        wins += int(better)
    return {"p_a_better": wins / n_boot,
            "diff_mean": float(np.nanmean(diffs)),
            "diff_std": float(np.nanstd(diffs))}
