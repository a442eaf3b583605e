#!/usr/bin/env python
"""Per-member diagnostics for a multitask-ensemble run: individual test
MAEs on one endpoint, residual correlations between members, and the
ensemble-gain decomposition — distinguishes "members are individually
weak" (recipe-level gap) from "members are too correlated" (diversity
gap) on the reference's unbeaten LogD ensemble row
(/root/reference/examples/compare_predictions.ipynb cell 5).

CPU-friendly (pass --platform cpu to keep the chip free).

Usage: python tools/ensemble_member_diag.py --dir runs/mt_ens_r5 \
          [--endpoint LogD] [--selection per_endpoint|avg]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TEST_CSV = ("/root/reference/examples/data/test-set/"
            "expansion_data_test_full_lb_flag.csv")
TRAIN_CSV = ("/root/reference/examples/data/train-set/"
             "expansion_log_data_train.csv")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dir", required=True)
    p.add_argument("--endpoint", default="LogD")
    p.add_argument("--selection", default="per_endpoint",
                   choices=["per_endpoint", "avg"])
    p.add_argument("--platform", default=None)
    p.add_argument("--n-boot", type=int, default=1000)
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import pandas as pd

    from examples.multitask_ensemble import _ensemble_predict
    from gt_pyg_tpu.data.datasets import (LOG_ENDPOINTS, clip_to_train_range,
                                          log_transform_assay_data)
    from gt_pyg_tpu.data.pipeline import get_tensor_data_parallel
    from gt_pyg_tpu.train.metrics import bootstrap_metrics

    run = Path(args.dir)
    tr_df = pd.read_csv(TRAIN_CSV)
    endpoints = [c for c in LOG_ENDPOINTS if c in tr_df.columns]
    e = endpoints.index(args.endpoint)
    te_df = log_transform_assay_data(pd.read_csv(TEST_CSV))
    te_df = te_df[np.isfinite(te_df[args.endpoint].values)] \
        .reset_index(drop=True)
    graphs = get_tensor_data_parallel(
        te_df["SMILES"].tolist(),
        te_df[[args.endpoint]].values.tolist(), progress=False)
    y = np.array([g.y[0, 0] for g in graphs])

    suffix = (f".{args.endpoint}.ckpt" if args.selection == "per_endpoint"
              else ".ckpt")
    ckpts = sorted((c for c in run.glob(f"model_*{suffix}")
                    if (args.selection == "per_endpoint"
                        or c.stem.split("_")[1].isdigit())),
                   key=lambda c: int(c.stem.split("_")[1].split(".")[0]))
    if not ckpts:
        print("no checkpoints found"); return 1

    _, all_preds = _ensemble_predict(ckpts, graphs, endpoints)
    lo, hi = (np.nanmin(tr_df[args.endpoint].values),
              np.nanmax(tr_df[args.endpoint].values))
    member = np.stack([np.clip(p[:, e], lo, hi) for p in all_preds])

    maes = np.abs(member - y[None]).mean(axis=1)
    ens = member.mean(axis=0)
    bs = bootstrap_metrics(y, ens, n_boot=args.n_boot)
    resid = member - y[None]
    corr = np.corrcoef(resid)
    off = corr[np.triu_indices(len(ckpts), 1)]

    out = {
        "selection": args.selection,
        "member_mae": maes.tolist(),
        "member_mae_mean": float(maes.mean()),
        "member_mae_min": float(maes.min()),
        "ensemble_mae": float(np.abs(ens - y).mean()),
        "ensemble_mae_boot": bs["MAE"],
        "resid_corr_mean": float(off.mean()),
        "resid_corr_min": float(off.min()),
        "resid_corr_max": float(off.max()),
        # the classic decomposition: with residual correlation rho and
        # per-member error E, an M-ensemble's error scales like
        # E * sqrt((1 + (M-1)*rho) / M) in the MSE sense
        "note": ("ensemble gain over mean member = "
                 f"{float(maes.mean() - np.abs(ens - y).mean()):.4f} MAE; "
                 "high resid_corr => diversity-limited, high member_mae "
                 "=> recipe-limited"),
    }
    path = run / f"member_diag_{args.endpoint}_{args.selection}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
