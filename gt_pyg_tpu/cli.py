"""Command-line interface: train / evaluate / predict / info.

The reference ships its recipes only as notebooks (SURVEY.md §2.2); this
CLI exposes them as library-backed commands. Defaults reproduce the
production recipe (train_logd.ipynb): composite loss, AdamW 1e-3 with
warmup-cosine, 2000 epochs, batch 256, bn+gate, multi-aggregators.

Examples:
    gt-tpu train --csv train.csv --endpoint LogD --epochs 200 --out runs/logd
    gt-tpu train --csv train.csv --multitask --epochs 500 --out runs/mt9
    gt-tpu predict --ckpt runs/logd/best.ckpt --csv test.csv --out sub.csv
    gt-tpu evaluate --ckpt runs/logd/best.ckpt --csv test.csv --bootstrap 1000
    gt-tpu info --ckpt runs/logd/best.ckpt
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

logger = logging.getLogger("gt_pyg_tpu.cli")


def _add_common_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--hidden-dim", type=int, default=128)
    p.add_argument("--num-layers", type=int, default=4)
    p.add_argument("--num-heads", type=int, default=8)
    p.add_argument("--dropout", type=float, default=0.3)
    p.add_argument("--head-dropout", type=float, default=None)
    p.add_argument("--num-head-layers", type=int, default=1)
    p.add_argument("--head-norm", action="store_true")
    p.add_argument("--head-residual", action="store_true")
    p.add_argument("--norm", default="bn")
    p.add_argument("--no-gate", action="store_true")
    p.add_argument("--gt-aggregators", default="sum,mean")
    p.add_argument("--aggregators", default="sum,mean,max,std")
    p.add_argument("--attn-impl", default="tile",
                   choices=["tile", "lax", "pallas"],
                   help="'tile': fused per-tile Pallas kernel on "
                        "tile-packed batches (default); 'lax': XLA "
                        "reference path; 'pallas': v1 chunked kernel")
    p.add_argument("--ffn-impl", default="auto",
                   choices=["auto", "fused", "xla"],
                   help="'auto': fused Pallas FFN block when computing in "
                        "bf16 (kernel keeps the whole MLP+dropout+residual "
                        "chain in VMEM); 'xla': always the MLP module")
    p.add_argument("--tile-edges", type=int, default=256,
                   help="edge rows per 128-node tile (tile impl only; 256 "
                        "measured fastest on v5e — packs edges 1.06x vs "
                        "1.42x at 384, RESULTS.md)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (fp32 params)")
    p.add_argument("--norm-fold", default="auto",
                   choices=["auto", "on", "off"],
                   help="fold BatchNorm affines into the following "
                        "projections ('auto': fold under bf16 compute)")


def _parse_mesh(spec) -> int:
    """--mesh accepts N, data=N, or 'auto' (all visible devices)."""
    if spec is None:
        return 1
    if spec == "auto":
        import jax

        return len(jax.devices())
    if "=" in spec:
        axis, _, n = spec.partition("=")
        if axis != "data":
            raise ValueError(f"only the 'data' mesh axis is supported "
                             f"by gt-tpu train, got {axis!r}")
        return int(n)
    return int(spec)


def _build_model(args, num_tasks: int, bn_axis_name=None):
    import jax.numpy as jnp

    from .nn import GraphTransformerNet

    return GraphTransformerNet(
        node_dim_in=140, edge_dim_in=39,
        hidden_dim=args.hidden_dim, num_gt_layers=args.num_layers,
        num_heads=args.num_heads, dropout=args.dropout,
        head_dropout=args.head_dropout,
        num_head_layers=args.num_head_layers,
        head_norm=args.head_norm, head_residual=args.head_residual,
        norm=args.norm, gate=not args.no_gate,
        gt_aggregators=tuple(args.gt_aggregators.split(",")),
        aggregators=tuple(args.aggregators.split(",")),
        num_tasks=num_tasks, attn_impl=args.attn_impl,
        ffn_impl=getattr(args, "ffn_impl", "auto"),
        norm_fold=getattr(args, "norm_fold", "auto"),
        bn_axis_name=bn_axis_name,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )


def _featurize(smiles, y, ids=None):
    from .data.pipeline import get_tensor_data_parallel

    return get_tensor_data_parallel(smiles, y, ids=ids)


def cmd_train(args) -> int:
    import numpy as np

    if args.restart_every and not args.segment_end:
        return _train_segmented(args)

    from .data.datasets import shuffle_split, LOG_ENDPOINTS
    from .train import Trainer, TrainConfig
    from .checkpoint import save_model_checkpoint

    import pandas as pd

    df = pd.read_csv(args.csv)
    endpoints = (LOG_ENDPOINTS if args.multitask
                 else [args.endpoint])
    endpoints = [e for e in endpoints if e in df.columns]
    tr_df, va_df = shuffle_split(df, seed=args.split_seed,
                                 num_train=args.num_train,
                                 num_val=args.num_val)
    logger.info("Train=%d Val=%d endpoints=%s", len(tr_df), len(va_df),
                endpoints)

    tr_ds = _featurize(tr_df["SMILES"].tolist(),
                       tr_df[endpoints].values.tolist())
    va_ds = _featurize(va_df["SMILES"].tolist(),
                       va_df[endpoints].values.tolist())

    if args.model_from_ckpt and args.init_from \
            and not args.init_from.endswith(".pt"):
        # adopt the checkpoint's backbone architecture (head args stay
        # CLI-controlled) — the fine-tune notebooks' backbone-match
        # contract (train_logd_finetune.ipynb cell 6)
        from .checkpoint import get_checkpoint_info

        cfg_saved = get_checkpoint_info(args.init_from).get("model_config")
        if cfg_saved:
            args.hidden_dim = cfg_saved["hidden_dim"]
            args.num_layers = cfg_saved["num_gt_layers"]
            args.num_heads = cfg_saved["num_heads"]
            args.norm = cfg_saved["norm"]
            args.no_gate = not cfg_saved["gate"]
            args.gt_aggregators = ",".join(cfg_saved["gt_aggregators"])
            args.aggregators = ",".join(cfg_saved["aggregators"])
            logger.info("adopted backbone config from %s", args.init_from)

    mesh_n = _parse_mesh(args.mesh)
    model = _build_model(args, num_tasks=len(endpoints),
                         bn_axis_name=("data" if mesh_n > 1
                                       and args.norm == "bn" else None))

    if args.init_from and not args.init_from.endswith(".pt"):
        from .checkpoint import get_checkpoint_info

        cfg_saved = get_checkpoint_info(args.init_from).get("model_config")
        if cfg_saved:
            # reference finetune contract: backbone keys must match
            backbone_keys = ("node_dim_in", "edge_dim_in", "hidden_dim",
                             "norm", "gate", "qkv_bias", "num_gt_layers",
                             "num_heads", "gt_aggregators", "aggregators",
                             "act")
            cur = model.get_config()
            bad = [k for k in backbone_keys if cfg_saved.get(k) != cur[k]]
            if bad:
                raise ValueError(
                    f"backbone config mismatch vs {args.init_from}: "
                    + "; ".join(f"{k}: ckpt={cfg_saved.get(k)!r} "
                                f"model={cur[k]!r}" for k in bad)
                    + ". Pass --model-from-ckpt or matching model flags.")
    cfg = TrainConfig(
        endpoints=tuple(endpoints), epochs=args.epochs,
        batch_train=args.batch_size, batch_eval=args.batch_eval,
        base_lr=args.lr, min_lr=args.min_lr,
        weight_decay=args.weight_decay, clip_norm=args.clip_norm,
        warmup_epochs=args.warmup, t_max=min(args.t_max, args.epochs),
        loss=("mae" if args.demo_loss else "composite"),
        seed=args.seed, log_every=args.log_every,
        prng_impl=args.prng,
        tile_edges=(args.tile_edges if args.attn_impl == "tile"
                    else None),
        mesh_devices=mesh_n,
        keep_top_k=max(1, args.avg_top_k),
        ema_decay=args.ema,
    )
    trainer = Trainer(model, cfg)

    from .data.loader import iter_batches

    sample = next(iter_batches(tr_ds, cfg.batch_train,
                               node_multiple=cfg.node_multiple,
                               edge_multiple=cfg.edge_multiple,
                               num_tasks=len(endpoints),
                               tile_edges=cfg.tile_edges,
                               tiles_multiple=cfg.tiles_multiple))
    start_epoch = 1
    if args.resume:
        state, start_epoch = trainer.restore_state(sample, args.resume)
        logger.info("resuming from %s at epoch %d", args.resume,
                    start_epoch)
    else:
        state = trainer.init_state(sample)

    if args.init_from:
        import jax

        from .checkpoint import load_weights, load_torch_checkpoint
        from .checkpoint.torch_import import merge_pretrained

        if args.init_from.endswith(".pt"):
            ckpt = load_torch_checkpoint(args.init_from,
                                         filter_heads=args.reinit_heads)
            pretrained = ckpt["model_state_dict"]
        else:
            pretrained, _ = load_weights(args.init_from,
                                         filter_heads=args.reinit_heads)
        merged = merge_pretrained(
            {"params": state["params"],
             "batch_stats": state["batch_stats"]}, pretrained)
        state["params"] = merged["params"]
        state["batch_stats"] = merged["batch_stats"]
        logger.info("initialized from %s (heads %s)", args.init_from,
                    "reinitialized" if args.reinit_heads else "loaded")

    if args.freeze:
        from .train.freeze import freeze_mask, frozen_status

        comps = args.freeze.split(",")
        excl = args.freeze_exclude.split(",") if args.freeze_exclude else None
        mask = freeze_mask(state["params"], components=comps, exclude=excl)
        trainer.frozen_mask = mask
        if state["batch_stats"]:
            trainer.frozen_bstats_mask = freeze_mask(
                state["batch_stats"], components=comps, exclude=excl,
                num_layers=args.num_layers)
        logger.info("frozen status: %s", frozen_status(mask))

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    callbacks = []
    if args.save_every:
        from .checkpoint import save_checkpoint

        def periodic_save(epoch, st, hist):
            if epoch % args.save_every == 0:
                save_checkpoint(
                    out / "resume.ckpt",
                    model_state={"params": st["params"],
                                 "batch_stats": st["batch_stats"]},
                    config=model.get_config(),
                    optimizer_state=st["opt_state"], epoch=epoch,
                    extra={"endpoints": list(endpoints)})

        callbacks.append(periodic_save)

    result = trainer.fit(state, tr_ds, va_ds, callbacks=callbacks,
                         start_epoch=start_epoch,
                         end_epoch=args.segment_end or None)
    if args.segment_end and args.segment_end < args.epochs:
        # mid-run segment: persist a resumable checkpoint for the driver
        from .checkpoint import save_checkpoint

        st = result["state"]
        save_checkpoint(out / "resume.ckpt",
                        model_state={"params": st["params"],
                                     "batch_stats": st["batch_stats"]},
                        config=model.get_config(),
                        optimizer_state=st["opt_state"],
                        epoch=args.segment_end,
                        extra={"endpoints": list(endpoints)})

    best = result["best"]
    prior_best = None
    if (out / "best.ckpt").exists():
        from .checkpoint import get_checkpoint_info

        prior_best = get_checkpoint_info(out / "best.ckpt").get(
            "best_metric")
    if best["state"] is not None and (
            prior_best is None or best["val_rae"] < prior_best):
        save_model_checkpoint(
            model, best["state"], out / "best.ckpt",
            epoch=best["epoch"], best_metric=best["val_rae"],
            extra={"endpoints": list(endpoints),
                   "prng_impl": args.prng,
                   "train_mins": [float(x) for x in result["train_mins"]],
                   "train_maxs": [float(x) for x in result["train_maxs"]],
                   "task_scale": [float(x) for x in result["task_scale"]]})
    save_model_checkpoint(
        model, {"params": result["state"]["params"],
                "batch_stats": result["state"]["batch_stats"]},
        out / "last.ckpt", epoch=args.epochs,
        extra={"endpoints": list(endpoints), "prng_impl": args.prng})
    if args.ema and result.get("best_ema", {}).get("state") is not None:
        be = result["best_ema"]
        logger.info("best EMA(decay=%s) state: val RAE %.4f at epoch %d",
                    args.ema, be["val_rae"], be["epoch"])
        save_model_checkpoint(
            model, be["state"], out / "best_ema.ckpt",
            epoch=be["epoch"], best_metric=float(be["val_rae"]),
            extra={"endpoints": list(endpoints), "prng_impl": args.prng,
                   "ema_decay": float(args.ema),
                   "train_mins": [float(x) for x in result["train_mins"]],
                   "train_maxs": [float(x) for x in result["train_maxs"]],
                   "task_scale": [float(x)
                                  for x in result["task_scale"]]})
    if args.avg_top_k > 1 and result.get("topk"):
        # within-run checkpoint averaging (SWA over the best-k states)
        import jax.numpy as jnp

        from .train.trainer import average_states

        tk = result["topk"]
        avg_state = average_states([t["state"] for t in tk])
        va_loss, va_metrics, *_ = trainer.evaluate(
            {"params": avg_state["params"],
             "batch_stats": avg_state["batch_stats"],
             "opt_state": None, "step": 0},
            va_ds, jnp.asarray(result["task_scale"]))
        avg_rae = va_metrics["Average"]["RAE"]
        logger.info("top-%d averaged state: val RAE %.4f (members: %s)",
                    len(tk), avg_rae,
                    [(t["epoch"], round(t["val_rae"], 4)) for t in tk])
        save_model_checkpoint(
            model, avg_state, out / f"best_avg{len(tk)}.ckpt",
            best_metric=float(avg_rae),
            extra={"endpoints": list(endpoints), "prng_impl": args.prng,
                   "avg_of_epochs": [int(t["epoch"]) for t in tk],
                   "train_mins": [float(x) for x in result["train_mins"]],
                   "train_maxs": [float(x) for x in result["train_maxs"]],
                   "task_scale": [float(x)
                                  for x in result["task_scale"]]})
    history = result["history"]
    if start_epoch > 1 and (out / "history.json").exists():
        # segmented (--restart-every) runs: merge with prior segments'
        # epochs instead of overwriting (ADVICE r1)
        try:
            with open(out / "history.json") as f:
                prior = json.load(f)
            history = [h for h in prior
                       if h.get("epoch", 0) < start_epoch] + history
        except (json.JSONDecodeError, OSError) as e:
            logger.warning("could not merge prior history.json: %s", e)
    with open(out / "history.json", "w") as f:
        json.dump(history, f, indent=1)
    logger.info("best val RAE %.4f at epoch %d -> %s",
                best["val_rae"], best["epoch"], out / "best.ckpt")
    return 0


def _train_segmented(args) -> int:
    """Drive training as subprocess segments of --restart-every epochs,
    chaining --resume between them."""
    import subprocess

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    start = 1
    resume = args.resume
    if resume:
        from .checkpoint import get_checkpoint_info

        start = int(get_checkpoint_info(resume).get("epoch", 0)) + 1
    base = [a for a in sys.argv if a not in ("--resume",)
            and (not resume or a != resume)]
    while start <= args.epochs:
        seg_end = min(start + args.restart_every - 1, args.epochs)
        cmd = [sys.executable, "-m", "gt_pyg_tpu.cli"] + base[1:] + [
            "--segment-end", str(seg_end)]
        if resume:
            cmd += ["--resume", str(resume)]
        logger.info("segment epochs %d..%d (of %d)", start, seg_end,
                    args.epochs)
        rc = subprocess.call(cmd)
        if rc != 0:
            logger.error("segment failed with rc=%d", rc)
            return rc
        resume = out / "resume.ckpt"
        start = seg_end + 1
    return 0


def _load_for_inference(ckpt_path):
    from .checkpoint import load_model_checkpoint

    model, state, ckpt = load_model_checkpoint(ckpt_path)
    extra = ckpt.get("extra", {})
    return model, state, extra, ckpt


def cmd_predict(args) -> int:
    import numpy as np
    import pandas as pd

    from .data.datasets import build_submission
    from .train import Trainer, TrainConfig

    model, state, extra, _ = _load_for_inference(args.ckpt)
    endpoints = extra.get("endpoints", ["LogD"])
    test_df = pd.read_csv(args.csv)
    graphs = _featurize(test_df["SMILES"].tolist(),
                        [[np.nan] * len(endpoints)] * len(test_df))
    trainer = Trainer(model, TrainConfig(endpoints=tuple(endpoints),
                                         batch_eval=args.batch_eval))
    preds = trainer.predict({"params": state["params"],
                             "batch_stats": state.get("batch_stats", {})},
                            graphs)
    if args.raw:
        out = test_df[["SMILES", "Molecule Name"]].copy()
        for i, ep in enumerate(endpoints):
            out[ep] = preds[:, i]
    else:
        out = build_submission(
            test_df, preds, endpoints,
            extra.get("train_mins", [-np.inf] * len(endpoints)),
            extra.get("train_maxs", [np.inf] * len(endpoints)),
            delta=args.delta)
    out.to_csv(args.out, index=False)
    logger.info("wrote %s (%d rows)", args.out, len(out))
    return 0


def cmd_evaluate(args) -> int:
    import numpy as np
    import pandas as pd

    from .train import Trainer, TrainConfig
    from .train.metrics import (bootstrap_metrics, evaluate_predictions)

    model, state, extra, _ = _load_for_inference(args.ckpt)
    endpoints = extra.get("endpoints", ["LogD"])
    df = pd.read_csv(args.csv)
    missing = [e for e in endpoints if e not in df.columns]
    if missing:
        from .data.datasets import log_transform_assay_data

        df = log_transform_assay_data(df)
        still = [e for e in endpoints if e not in df.columns]
        if still:
            raise ValueError(f"CSV lacks endpoint columns {still} (even "
                             f"after assay log transform)")
        logger.info("applied forward assay log transform for %s", missing)
    graphs = _featurize(df["SMILES"].tolist(),
                        df[endpoints].values.tolist())
    trainer = Trainer(model, TrainConfig(endpoints=tuple(endpoints),
                                         batch_eval=args.batch_eval))
    preds = trainer.predict({"params": state["params"],
                             "batch_stats": state.get("batch_stats", {})},
                            graphs)
    y = np.array([g.y[0] for g in graphs])
    m = np.array([g.y_mask[0] for g in graphs])
    metrics = evaluate_predictions(y, preds, m, endpoints)
    print(json.dumps(metrics, indent=1, default=float))
    if args.bootstrap:
        for i, ep in enumerate(endpoints):
            mask = m[:, i].astype(bool)
            bs = bootstrap_metrics(y[mask, i], preds[mask, i],
                                   n_boot=args.bootstrap)
            print(json.dumps({f"bootstrap:{ep}": bs}, indent=1,
                             default=float))
    return 0


def cmd_info(args) -> int:
    from .checkpoint import get_checkpoint_info

    print(json.dumps(get_checkpoint_info(args.ckpt), indent=1,
                     default=str))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="gt-tpu",
        description="TPU-native graph transformer for molecular ADMET")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu')")
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="train a model on an ADMET CSV")
    t.add_argument("--csv", required=True)
    t.add_argument("--endpoint", default="LogD")
    t.add_argument("--multitask", action="store_true",
                   help="train on all 9 log endpoints with y-masking")
    t.add_argument("--epochs", type=int, default=2000)
    t.add_argument("--batch-size", type=int, default=256)
    t.add_argument("--batch-eval", type=int, default=1024)
    t.add_argument("--lr", type=float, default=1e-3)
    t.add_argument("--min-lr", type=float, default=None,
                   help="cosine floor (default lr/100; demo recipe uses 0)")
    t.add_argument("--weight-decay", type=float, default=1e-5)
    t.add_argument("--clip-norm", type=float, default=5.0)
    t.add_argument("--warmup", type=int, default=25)
    t.add_argument("--t-max", type=int, default=500)
    t.add_argument("--demo-loss", action="store_true",
                   help="plain masked MAE (the demo recipe)")
    t.add_argument("--prng", default="rbg",
                   choices=["rbg", "threefry"],
                   help="PRNG impl for dropout/reparam (default rbg: "
                        "~18%% faster step on TPU; threefry reproduces "
                        "the pre-round-1-final stream)")
    t.add_argument("--seed", type=int, default=1928374650)
    t.add_argument("--split-seed", type=int, default=42)
    t.add_argument("--mesh", default=None,
                   help="data-parallel replicas: N, data=N, or 'auto' "
                        "(all visible devices); shard_map + psum over a "
                        "('data',) mesh with cross-replica BatchNorm")
    t.add_argument("--num-train", type=int, default=None)
    t.add_argument("--num-val", type=int, default=None)
    t.add_argument("--log-every", type=int, default=5)
    t.add_argument("--out", required=True)
    t.add_argument("--resume", default=None,
                   help="resume training from a checkpoint with optimizer "
                        "state (written by --save-every)")
    t.add_argument("--ema", type=float, default=None,
                   help="per-epoch EMA decay of the weights (e.g. 0.98); "
                        "tracks + val-selects an EMA stream alongside the "
                        "raw one and saves best_ema.ckpt (recipe lever)")
    t.add_argument("--avg-top-k", type=int, default=1,
                   help="track the K best-val states and ALSO save their "
                        "parameter average as best_avgK.ckpt (within-run "
                        "checkpoint averaging)")
    t.add_argument("--save-every", type=int, default=0,
                   help="write a resumable checkpoint every N epochs")
    t.add_argument("--restart-every", type=int, default=0,
                   help="run epochs in subprocess segments of N, resuming "
                        "between them (bounds per-process leaks / client "
                        "degradation on tunnelled runtimes)")
    t.add_argument("--segment-end", type=int, default=0,
                   help=argparse.SUPPRESS)
    t.add_argument("--init-from", default=None,
                   help=".ckpt or torch .pt backbone to initialize from "
                        "(.pt files are unpickled — only load files you "
                        "trust)")
    t.add_argument("--reinit-heads", action="store_true",
                   help="drop mu/log_var heads when loading --init-from")
    t.add_argument("--model-from-ckpt", action="store_true",
                   help="adopt the backbone architecture from --init-from "
                        "(head flags stay CLI-controlled)")
    t.add_argument("--freeze", default=None,
                   help="components to freeze, e.g. 'all' or 'encoder'")
    t.add_argument("--freeze-exclude", default=None)
    _add_common_model_args(t)
    t.set_defaults(fn=cmd_train)

    pr = sub.add_parser("predict", help="write predictions / submission CSV")
    pr.add_argument("--ckpt", required=True)
    pr.add_argument("--csv", required=True)
    pr.add_argument("--out", required=True)
    pr.add_argument("--batch-eval", type=int, default=1024)
    pr.add_argument("--delta", type=float, default=0.0)
    pr.add_argument("--raw", action="store_true",
                    help="write raw log-space predictions (no inverse "
                         "transform)")
    pr.set_defaults(fn=cmd_predict)

    ev = sub.add_parser("evaluate", help="evaluate a checkpoint on a CSV")
    ev.add_argument("--ckpt", required=True)
    ev.add_argument("--csv", required=True)
    ev.add_argument("--batch-eval", type=int, default=1024)
    ev.add_argument("--bootstrap", type=int, default=0)
    ev.set_defaults(fn=cmd_evaluate)

    inf = sub.add_parser("info", help="show checkpoint metadata")
    inf.add_argument("--ckpt", required=True)
    inf.set_defaults(fn=cmd_info)

    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    import jax

    if args.platform:
        # must run before any jax computation; the axon sitecustomize pins
        # JAX_PLATFORMS in the env, so set the config directly
        jax.config.update("jax_platforms", args.platform)
    else:
        # keep the cpu backend available next to the accelerator so
        # un-jitted model.init runs host-side (see trainer.init_on_host)
        try:
            cur = jax.config.jax_platforms or ""
            if cur and "cpu" not in cur:
                jax.config.update("jax_platforms", cur + ",cpu")
        except Exception:
            pass
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
