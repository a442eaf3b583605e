#!/usr/bin/env python
"""Model comparison with bootstrap CIs and pairwise significance (script
form of ``examples/compare_predictions.ipynb``): evaluates two prediction
CSVs against ground truth on the all / leaderboard / private splits with
1000-resample bootstrap mean±std and paired significance per metric."""

import argparse
import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gt_pyg_tpu.train.metrics import (  # noqa: E402
    bootstrap_metrics, bootstrap_significance, OFFICIAL_KEYS)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--truth-csv", required=True,
                   help="test CSV with endpoint columns + is_leaderboard")
    p.add_argument("--pred-a", required=True, help="prediction CSV A")
    p.add_argument("--pred-b", default=None, help="prediction CSV B")
    p.add_argument("--endpoint", default="LogD")
    p.add_argument("--n-boot", type=int, default=1000)
    args = p.parse_args(argv)

    truth = pd.read_csv(args.truth_csv)
    a = pd.read_csv(args.pred_a)

    splits = {"All": np.ones(len(truth), bool)}
    if "is_leaderboard" in truth.columns:
        lb = truth["is_leaderboard"].astype(bool).values
        splits["LB"] = lb
        splits["Private"] = ~lb

    def aligned(pred_df):
        merged = truth[["SMILES", args.endpoint]].merge(
            pred_df[["SMILES", args.endpoint]], on="SMILES",
            suffixes=("_true", "_pred"))
        return (merged[f"{args.endpoint}_true"].values,
                merged[f"{args.endpoint}_pred"].values)

    y, pa = aligned(a)
    report = {}
    for name, m in splits.items():
        mask = m[:len(y)] & np.isfinite(y)
        report[name] = {
            "n": int(mask.sum()),
            "A": bootstrap_metrics(y[mask], pa[mask], n_boot=args.n_boot),
        }
        if args.pred_b:
            b = pd.read_csv(args.pred_b)
            _, pb = aligned(b)
            report[name]["B"] = bootstrap_metrics(y[mask], pb[mask],
                                                  n_boot=args.n_boot)
            report[name]["significance"] = {
                k: bootstrap_significance(y[mask], pa[mask], pb[mask],
                                          metric=k, n_boot=args.n_boot)
                for k in OFFICIAL_KEYS}
    print(json.dumps(report, indent=1, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
