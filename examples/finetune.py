#!/usr/bin/env python
"""Fine-tune from a pretrained backbone with head reinit (script form of
``examples/train_logd_finetune.ipynb`` / ``train_ksol_finetune.ipynb``):
loads a golem-style torch ``.pt`` or native ``.ckpt`` backbone, drops the
mu/log_var heads, and runs the production recipe with dropout 0.2 /
head_dropout 0.2 / num_head_layers 1 — a full fine-tune (the reference
does NOT freeze the backbone, finetune notebook cell 6)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gt_pyg_tpu.cli import main as cli_main

DEFAULT_DATA = "/root/reference/examples/data"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained", required=True,
                   help="backbone checkpoint (.pt torch or .ckpt native)")
    p.add_argument("--endpoint", default="LogS")
    p.add_argument("--data-dir", default=DEFAULT_DATA)
    p.add_argument("--out", default="runs/finetune")
    p.add_argument("--epochs", type=int, default=2000)
    p.add_argument("--freeze-backbone", action="store_true",
                   help="optionally freeze everything but the heads "
                        "(the reference fine-tunes fully)")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    train_csv = f"{args.data_dir}/train-set/expansion_log_data_train.csv"
    cli_args = [
        "train", "--csv", train_csv, "--endpoint", args.endpoint,
        "--epochs", str(args.epochs), "--out", args.out,
        "--init-from", args.pretrained, "--reinit-heads",
        "--model-from-ckpt",
        "--dropout", "0.2", "--head-dropout", "0.2",
        "--num-head-layers", "1",
    ]
    if args.freeze_backbone:
        cli_args += ["--freeze", "all", "--freeze-exclude", "heads"]
    if args.platform:
        cli_args = ["--platform", args.platform] + cli_args
    return cli_main(cli_args)


if __name__ == "__main__":
    sys.exit(main())
