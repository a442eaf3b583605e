#!/usr/bin/env python
"""Multi-task 9-endpoint ADMET training + ensemble evaluation (BASELINE
config 4; the reference's "beardy-polonium" 9-model multi-task ensemble,
compare_predictions.ipynb).

Trains N multi-task models (different seeds) on all 9 log endpoints with
y-mask missing-label handling, then ensembles by mean prediction and
evaluates per endpoint.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_DATA = "/root/reference/examples/data"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default=DEFAULT_DATA)
    p.add_argument("--out", default="runs/mt_ensemble")
    p.add_argument("--n-models", type=int, default=9)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import pandas as pd

    from gt_pyg_tpu.data.datasets import (
        load_admet_csv, shuffle_split, LOG_ENDPOINTS)
    from gt_pyg_tpu.data.pipeline import get_tensor_data_parallel
    from gt_pyg_tpu.data.loader import iter_batches
    from gt_pyg_tpu.nn import GraphTransformerNet
    from gt_pyg_tpu.train import Trainer, TrainConfig
    from gt_pyg_tpu.train.metrics import evaluate_predictions
    from gt_pyg_tpu.checkpoint import save_model_checkpoint

    train_csv = f"{args.data_dir}/train-set/expansion_log_data_train.csv"
    df = pd.read_csv(train_csv)
    endpoints = [c for c in LOG_ENDPOINTS if c in df.columns]
    tr_df, va_df = shuffle_split(df)
    if args.debug:
        tr_df, va_df = tr_df.iloc[:200], va_df.iloc[:100]
        args.n_models, args.epochs = 2, 10

    tr_ds = get_tensor_data_parallel(tr_df["SMILES"].tolist(),
                                     tr_df[endpoints].values.tolist())
    va_ds = get_tensor_data_parallel(va_df["SMILES"].tolist(),
                                     va_df[endpoints].values.tolist())

    hidden, layers, heads = (64, 2, 4) if args.debug else (128, 4, 8)
    all_preds = []
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    for mi in range(args.n_models):
        model = GraphTransformerNet(
            node_dim_in=140, edge_dim_in=39, hidden_dim=hidden,
            num_gt_layers=layers, num_heads=heads, dropout=0.3, norm="bn",
            gate=True, gt_aggregators=("sum", "mean"),
            aggregators=("sum", "mean", "max", "std"),
            num_tasks=len(endpoints))
        cfg = TrainConfig(endpoints=tuple(endpoints), epochs=args.epochs,
                          batch_train=64 if args.debug else 256,
                          seed=1000 + mi, log_every=max(args.epochs // 5, 1),
                          t_max=min(500, args.epochs))
        trainer = Trainer(model, cfg)
        sample = next(iter_batches(tr_ds, cfg.batch_train,
                                   node_multiple=cfg.node_multiple,
                                   edge_multiple=cfg.edge_multiple,
                                   num_tasks=len(endpoints)))
        state = trainer.init_state(sample,
                                   rng=jax.random.PRNGKey(1000 + mi))
        result = trainer.fit(state, tr_ds, va_ds)
        best = result["best"]["state"] or {
            "params": result["state"]["params"],
            "batch_stats": result["state"]["batch_stats"]}
        save_model_checkpoint(model, best, out_dir / f"model_{mi}.ckpt",
                              best_metric=result["best"]["val_rae"],
                              extra={"endpoints": endpoints})
        preds = trainer.predict(best, va_ds)
        all_preds.append(preds)
        print(f"model {mi}: best val RAE {result['best']['val_rae']:.4f}")

    ens = np.mean(all_preds, axis=0)
    y = np.array([g.y[0] for g in va_ds])
    m = np.array([g.y_mask[0] for g in va_ds])
    metrics = evaluate_predictions(y, ens, m, endpoints)
    print(json.dumps(metrics, indent=1, default=float))
    with open(out_dir / "ensemble_metrics.json", "w") as f:
        json.dump(metrics, f, indent=1, default=float)
    return 0


if __name__ == "__main__":
    sys.exit(main())
