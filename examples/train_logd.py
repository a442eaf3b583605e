#!/usr/bin/env python
"""Production LogD single-task recipe (script form of the reference's
``examples/train_logd.ipynb``): composite loss (RAE+Huber+corr+tau+R2),
AdamW 1e-3 + warmup-cosine, batch 256, 2000 epochs, bn+gate,
multi-aggregators, best-by-val-RAE selection, submission with train-range
clipping + inverse log transform.

Usage:
    python examples/train_logd.py --data-dir <dir-with-train/test-csvs> \
        --out runs/logd [--epochs 2000] [--debug]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gt_pyg_tpu.cli import main as cli_main

DEFAULT_DATA = "/root/reference/examples/data"


def run(endpoint: str = "LogD", argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default=DEFAULT_DATA)
    p.add_argument("--out", default=f"runs/{endpoint.lower()}")
    p.add_argument("--epochs", type=int, default=2000)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    train_csv = f"{args.data_dir}/train-set/expansion_log_data_train.csv"
    test_csv = (f"{args.data_dir}/test-set/"
                "expansion_data_test_full_lb_flag.csv")

    train_args = [
        "train", "--csv", train_csv, "--endpoint", endpoint,
        "--epochs", str(50 if args.debug else args.epochs),
        "--out", args.out,
    ]
    if args.debug:
        train_args += ["--num-train", "200", "--num-val", "100",
                       "--hidden-dim", "64", "--num-layers", "2",
                       "--num-heads", "4", "--dropout", "0.1",
                       "--batch-size", "32", "--log-every", "5"]
    if args.platform:
        train_args = ["--platform", args.platform] + train_args
    rc = cli_main(train_args)
    if rc:
        return rc

    predict_args = [
        "predict", "--ckpt", f"{args.out}/best.ckpt", "--csv", test_csv,
        "--out", f"{args.out}/submission_{endpoint.lower()}_st.csv",
    ]
    if args.platform:
        predict_args = ["--platform", args.platform] + predict_args
    return cli_main(predict_args)


if __name__ == "__main__":
    sys.exit(run("LogD"))
