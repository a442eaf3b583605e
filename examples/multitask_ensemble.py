#!/usr/bin/env python
"""Multi-task 9-endpoint ADMET training + ensemble evaluation (BASELINE
config 4; the reference's "beardy-polonium" 9-model multi-task ensemble,
compare_predictions.ipynb cell 5).

Trains N multi-task models (different seeds) on all 9 log endpoints with
y-mask missing-label handling, then ensembles by mean prediction and
evaluates per endpoint on the validation split and (optionally) the
held-out test CSV with bootstrap CIs — the reference's ensemble rows are
test-set MAE (LogD 0.3809±0.0077, KSOL/LogS 0.3460±0.0066).

Members are resumable: ``--start-index K`` trains members K..K+n-1 only
(seeds stay 1000+i, so a 9-member ensemble can be built across sessions);
``--eval-only`` loads every existing ``model_*.ckpt`` and just evaluates.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_DATA = "/root/reference/examples/data"


def _featurize_sets(args, endpoints, tr_df, va_df):
    from gt_pyg_tpu.data.pipeline import get_tensor_data_parallel

    tr_ds = get_tensor_data_parallel(tr_df["SMILES"].tolist(),
                                     tr_df[endpoints].values.tolist())
    va_ds = get_tensor_data_parallel(va_df["SMILES"].tolist(),
                                     va_df[endpoints].values.tolist())
    return tr_ds, va_ds


def _make_model(args, endpoints):
    import jax.numpy as jnp

    from gt_pyg_tpu.nn import GraphTransformerNet

    hidden, layers, heads = (64, 2, 4) if args.debug else (128, 4, 8)
    return GraphTransformerNet(
        node_dim_in=140, edge_dim_in=39, hidden_dim=hidden,
        num_gt_layers=layers, num_heads=heads, dropout=0.3, norm="bn",
        gate=True, gt_aggregators=("sum", "mean"),
        aggregators=("sum", "mean", "max", "std"),
        num_tasks=len(endpoints), attn_impl=args.attn_impl,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)


def _train_members_vmap(args, endpoints, tr_ds, va_ds, out_dir):
    """All members in ONE vmapped training run (member axis on the MXU
    batch dim) — ~M× faster wall-clock than the sequential loop on a
    single chip. Member INIT seeds and checkpoint filenames match the
    sequential path (so ``--eval-only`` ensembles either output). By
    default every member draws its own minibatch shuffle stream
    (decorrelated, like the reference's independent runs); with
    ``--no-decorrelate`` members share one stream (round-3 behavior)."""
    import jax

    from gt_pyg_tpu.checkpoint import (get_checkpoint_info,
                                       save_model_checkpoint)
    from gt_pyg_tpu.data.loader import iter_batches
    from gt_pyg_tpu.train import TrainConfig, VmapEnsembleTrainer

    def _needs_training(mi):
        """A member needs (re)training unless a FULLY-trained checkpoint
        exists: periodic mid-run saves stamp ``saved_at_epoch`` in extra,
        so a run killed at epoch k<epochs is detected and retrained
        instead of being silently ensembled half-trained."""
        path = out_dir / f"model_{mi}.ckpt"
        if args.overwrite or not path.exists():
            return True
        if args.per_endpoint_select and any(
                not (out_dir / f"model_{mi}.{ep}.ckpt").exists()
                for ep in endpoints):
            print(f"model {mi}: missing per-endpoint checkpoints; "
                  "retraining")
            return True
        try:
            extra = get_checkpoint_info(path).get("extra") or {}
        except Exception as exc:
            print(f"model {mi}: unreadable checkpoint ({exc}); retraining")
            return True
        saved_at = extra.get("saved_at_epoch")
        if saved_at is None and extra.get("vmap_ensemble"):
            # vmap-path checkpoints are always stamped; a stamp-less one
            # was written by pre-stamp code and may be a mid-run partial
            print(f"model {mi}: vmap checkpoint lacks the saved_at_epoch "
                  "stamp (pre-stamp save, possibly partial); retraining")
            return True
        if saved_at is not None and int(saved_at) < args.epochs:
            print(f"model {mi}: checkpoint is a partial save from epoch "
                  f"{saved_at} < {args.epochs}; retraining")
            return True
        return False

    members = list(range(args.start_index,
                         args.start_index + args.n_models))
    todo = [mi for mi in members if _needs_training(mi)]
    if not todo:
        print("all member checkpoints exist, skipping training")
        return
    model = _make_model(args, endpoints)
    cfg = TrainConfig(endpoints=tuple(endpoints), epochs=args.epochs,
                      batch_train=64 if args.debug else 256,
                      seed=1000 + todo[0],
                      log_every=max(args.epochs // 20, 1),
                      t_max=min(500, args.epochs),
                      eval_every=args.eval_every,
                      task_weights=_parse_endpoint_weights(
                          args.endpoint_weights, endpoints),
                      tile_edges=(args.tile_edges
                                  if args.attn_impl == "tile" else None))
    ens = VmapEnsembleTrainer(model, cfg, num_members=len(todo),
                              member_seeds=[1000 + mi for mi in todo],
                              decorrelate=not args.no_decorrelate)
    sample = next(iter_batches(tr_ds, cfg.batch_train,
                               node_multiple=cfg.node_multiple,
                               edge_multiple=cfg.edge_multiple,
                               num_tasks=len(endpoints),
                               tile_edges=cfg.tile_edges,
                               tiles_multiple=cfg.tiles_multiple))
    states = ens.init_states(sample)

    def save_members(epoch, best_states, best_rae, best_epoch):
        for k, mi in enumerate(todo):
            if not np.isfinite(best_rae[k]):
                # this member never produced a finite validation RAE
                # (diverged); its "best" state is an arbitrary snapshot —
                # don't present it as a trained member
                print(f"model {mi}: no finite val RAE yet (diverged?); "
                      "NOT saving a checkpoint for it", flush=True)
                continue
            best = jax.tree_util.tree_map(lambda x, k=k: x[k], best_states)
            save_model_checkpoint(
                model, best, out_dir / f"model_{mi}.ckpt",
                best_metric=float(best_rae[k]),
                extra={"endpoints": endpoints, "vmap_ensemble": True,
                       "saved_at_epoch": int(epoch),
                       "best_epoch": int(best_epoch[k])})

    def save_members_e(epoch, best_states_e, best_rae_e, best_epoch_e):
        """Per-(endpoint, member) best states → model_{mi}.{ep}.ckpt.

        One bulk host fetch of the stacked [E, M, ...] tree, then host
        slicing — E*M eager device gathers over the tunnel would pay
        E*M round trips. The fetch is ~E*M*params (~1 GB at 9x9), so
        mid-run insurance saves run at 3x the member-checkpoint cadence."""
        if epoch % 300 and epoch != args.epochs:
            return
        host = jax.tree_util.tree_map(np.asarray, best_states_e)
        for e, ep_name in enumerate(endpoints):
            for k, mi in enumerate(todo):
                if not np.isfinite(best_rae_e[e, k]):
                    continue
                best = jax.tree_util.tree_map(
                    lambda x, e=e, k=k: x[e, k], host)
                save_model_checkpoint(
                    model, best, out_dir / f"model_{mi}.{ep_name}.ckpt",
                    best_metric=float(best_rae_e[e, k]),
                    extra={"endpoints": endpoints, "vmap_ensemble": True,
                           "selected_endpoint": ep_name,
                           "saved_at_epoch": int(epoch),
                           "best_epoch": int(best_epoch_e[e, k])})

    # persist the stacked best states every 100 epochs so a killed run
    # still lands its members (the final call re-saves at fit end)
    result = ens.fit(states, tr_ds, va_ds, checkpoint_cb=save_members,
                     checkpoint_every=100,
                     select_per_endpoint=args.per_endpoint_select,
                     checkpoint_cb_per_endpoint=(
                         save_members_e if args.per_endpoint_select
                         else None))
    save_members(args.epochs, result["best_states"], result["best_rae"],
                 result["best_epoch"])
    if args.per_endpoint_select:
        save_members_e(args.epochs, result["best_states_per_endpoint"],
                       result["best_rae_per_endpoint"],
                       result["best_epoch_per_endpoint"])
    for k, mi in enumerate(todo):
        print(f"model {mi}: best val RAE {result['best_rae'][k]:.4f} "
              f"@ epoch {int(result['best_epoch'][k])}", flush=True)
        if args.per_endpoint_select:
            bre = result["best_rae_per_endpoint"]
            bee = result["best_epoch_per_endpoint"]
            print("  per-endpoint best (RAE @ epoch): "
                  + ", ".join(f"{ep}={bre[e, k]:.3f}@{int(bee[e, k])}"
                              for e, ep in enumerate(endpoints)),
                  flush=True)


def _parse_endpoint_weights(spec, endpoints):
    """``"LogD=3,LogS=1.5"`` → per-endpoint loss-weight tuple aligned
    with ``endpoints`` (unnamed endpoints weight 1.0). None/"" → None
    (uniform reference behavior)."""
    if not spec:
        return None
    weights = {ep: 1.0 for ep in endpoints}
    for item in spec.split(","):
        name, _, val = item.partition("=")
        name = name.strip()
        if name not in weights:
            raise SystemExit(
                f"--endpoint-weights: unknown endpoint {name!r} "
                f"(have {sorted(weights)})")
        weights[name] = float(val)
    return tuple(weights[ep] for ep in endpoints)


def _train_members(args, endpoints, tr_ds, va_ds, out_dir):
    import jax

    from gt_pyg_tpu.data.loader import iter_batches
    from gt_pyg_tpu.train import Trainer, TrainConfig
    from gt_pyg_tpu.checkpoint import save_model_checkpoint

    for mi in range(args.start_index, args.start_index + args.n_models):
        ckpt_path = out_dir / f"model_{mi}.ckpt"
        if ckpt_path.exists() and not args.overwrite:
            print(f"model {mi}: {ckpt_path} exists, skipping")
            continue
        model = _make_model(args, endpoints)
        cfg = TrainConfig(endpoints=tuple(endpoints), epochs=args.epochs,
                          batch_train=64 if args.debug else 256,
                          seed=1000 + mi, log_every=max(args.epochs // 5, 1),
                          t_max=min(500, args.epochs),
                          task_weights=_parse_endpoint_weights(
                              args.endpoint_weights, endpoints),
                          tile_edges=(args.tile_edges
                                      if args.attn_impl == "tile" else None))
        trainer = Trainer(model, cfg)
        sample = next(iter_batches(tr_ds, cfg.batch_train,
                                   node_multiple=cfg.node_multiple,
                                   edge_multiple=cfg.edge_multiple,
                                   num_tasks=len(endpoints),
                                   tile_edges=cfg.tile_edges,
                                   tiles_multiple=cfg.tiles_multiple))
        state = trainer.init_state(sample,
                                   rng=jax.random.PRNGKey(1000 + mi))
        result = trainer.fit(state, tr_ds, va_ds)
        best = result["best"]["state"] or {
            "params": result["state"]["params"],
            "batch_stats": result["state"]["batch_stats"]}
        save_model_checkpoint(model, best, ckpt_path,
                              best_metric=result["best"]["val_rae"],
                              extra={"endpoints": endpoints})
        print(f"model {mi}: best val RAE {result['best']['val_rae']:.4f}",
              flush=True)


_PREDICT_TRAINER = {}


def _ensemble_predict(ckpts, graphs, endpoints, batch_eval=1024):
    """Mean prediction over ensemble members for a featurized set.

    One ``Trainer`` (= one jitted predict program per dataset shape) is
    reused across ALL checkpoints of an architecture: a fresh Trainer
    per member recompiles the predict function per checkpoint, which at
    9 members × 9 endpoints × 2 splits costs ~2 h of tunnel compiles
    for ~3 min of actual prediction."""
    from gt_pyg_tpu.checkpoint import load_model_checkpoint
    from gt_pyg_tpu.train import Trainer, TrainConfig

    all_preds = []
    import dataclasses

    for path in ckpts:
        model, state, _ = load_model_checkpoint(path)
        # key on the FULL module config (not just hidden/layers):
        # checkpoints differing in heads/gate/aggregators/norm/dtype
        # must not silently reuse a Trainer built for another model
        model_key = tuple(
            (f.name, repr(getattr(model, f.name)))
            for f in dataclasses.fields(model)
            if f.name not in ("parent", "name"))
        key = (tuple(endpoints), batch_eval, model_key)
        trainer = _PREDICT_TRAINER.get(key)
        if trainer is None:
            trainer = Trainer(model, TrainConfig(
                endpoints=tuple(endpoints), batch_eval=batch_eval))
            _PREDICT_TRAINER[key] = trainer
        all_preds.append(trainer.predict(
            {"params": state["params"],
             "batch_stats": state.get("batch_stats", {})}, graphs))
    return np.mean(all_preds, axis=0), all_preds


def _ensemble_predict_per_endpoint(out_dir, member_indices, graphs,
                                   endpoints, batch_eval=1024):
    """Per-endpoint-selected ensemble prediction matrix [N, E]: column e
    is the member-mean prediction of the states selected on endpoint e's
    own val RAE (model_{i}.{endpoint}.ckpt)."""
    cols = []
    for e, ep_name in enumerate(endpoints):
        ckpts = [out_dir / f"model_{mi}.{ep_name}.ckpt"
                 for mi in member_indices]
        preds, _ = _ensemble_predict(ckpts, graphs, endpoints,
                                     batch_eval=batch_eval)
        cols.append(preds[:, e])
    return np.stack(cols, axis=1)


def _eval_set(name, preds, graphs, endpoints, n_boot, report):
    from gt_pyg_tpu.train.metrics import (bootstrap_metrics,
                                          evaluate_predictions)

    y = np.array([g.y[0] for g in graphs])
    m = (np.array([g.y_mask[0] for g in graphs])
         * np.isfinite(y)).astype(bool)
    metrics = evaluate_predictions(y, preds, m.astype(np.float32),
                                   endpoints)
    report[name] = {"metrics": metrics}
    if n_boot:
        boot = {}
        for i, ep in enumerate(endpoints):
            mask = m[:, i]
            if mask.sum() < 2:
                continue
            boot[ep] = bootstrap_metrics(y[mask, i], preds[mask, i],
                                         n_boot=n_boot)
        report[name]["bootstrap"] = boot
    print(f"== {name} ==")
    print(json.dumps(metrics.get("Average", metrics), indent=1,
                     default=float))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default=DEFAULT_DATA)
    p.add_argument("--out", default="runs/mt_ensemble")
    p.add_argument("--n-models", type=int, default=9)
    p.add_argument("--start-index", type=int, default=0,
                   help="first member index to train (seeds are 1000+i)")
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--eval-only", action="store_true",
                   help="skip training; ensemble all existing model_*.ckpt")
    p.add_argument("--vmap", action="store_true",
                   help="train all members simultaneously in one vmapped "
                        "run (member axis on the MXU batch dim; ~n-models"
                        "x faster wall-clock on one chip). Checkpoints are "
                        "format-compatible with the sequential path, but "
                        "the minibatch stream is shared across members")
    p.add_argument("--eval-every", type=int, default=1,
                   help="(vmap mode) validate/model-select every k epochs")
    p.add_argument("--no-decorrelate", action="store_true",
                   help="(vmap mode) share ONE minibatch stream across "
                        "members instead of per-member independent "
                        "shuffles (the pre-round-4 behavior)")
    p.add_argument("--per-endpoint-select", action="store_true",
                   help="(vmap mode) additionally track each member's "
                        "best state PER ENDPOINT and evaluate the "
                        "per-endpoint-selected ensemble alongside the "
                        "average-RAE one (round-4 confound (a) "
                        "isolation; see train/ensemble.py)")
    p.add_argument("--endpoint-weights", default=None,
                   help="per-endpoint loss weights, e.g. 'LogD=3' — "
                        "weighted (not uniform) mean over per-task "
                        "losses; the round-5 member-interference lever")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--test-csv", default=None,
                   help="held-out test CSV (raw assay columns OK) for "
                        "bootstrap ensemble eval")
    p.add_argument("--n-boot", type=int, default=1000)
    p.add_argument("--attn-impl", default="tile", choices=["tile", "lax"])
    p.add_argument("--tile-edges", type=int, default=256)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    else:
        # expose the cpu backend next to the accelerator so un-jitted
        # model.init runs on the host (seconds instead of minutes of
        # remote op-by-op dispatch over tunnelled runtimes) — same as
        # cli.py; an explicitly forced --platform is left untouched
        try:
            cur = jax.config.jax_platforms or ""
            if cur and "cpu" not in cur:
                jax.config.update("jax_platforms", cur + ",cpu")
        except Exception:
            pass

    import pandas as pd

    from gt_pyg_tpu.data.datasets import (LOG_ENDPOINTS,
                                          log_transform_assay_data,
                                          shuffle_split)
    from gt_pyg_tpu.data.pipeline import get_tensor_data_parallel

    train_csv = f"{args.data_dir}/train-set/expansion_log_data_train.csv"
    df = pd.read_csv(train_csv)
    endpoints = [c for c in LOG_ENDPOINTS if c in df.columns]
    tr_df, va_df = shuffle_split(df)
    if args.debug:
        tr_df, va_df = tr_df.iloc[:200], va_df.iloc[:100]
        args.n_models, args.epochs = 2, 10

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    tr_ds, va_ds = _featurize_sets(args, endpoints, tr_df, va_df)

    if not args.eval_only:
        if args.vmap:
            _train_members_vmap(args, endpoints, tr_ds, va_ds, out_dir)
        else:
            _train_members(args, endpoints, tr_ds, va_ds, out_dir)

    ckpts = sorted((p for p in out_dir.glob("model_*.ckpt")
                    if p.stem.split("_")[1].isdigit()),
                   key=lambda pth: int(pth.stem.split("_")[1]))
    if not ckpts:
        print("no member checkpoints found; nothing to ensemble")
        return 1
    print(f"ensembling {len(ckpts)} members: "
          f"{[c.name for c in ckpts]}", flush=True)

    report = {"n_members": len(ckpts),
              "members": [c.name for c in ckpts]}
    va_preds, _ = _ensemble_predict(ckpts, va_ds, endpoints)
    _eval_set("val", va_preds, va_ds, endpoints, args.n_boot, report)

    # per-endpoint-selected construction: column e of the prediction
    # matrix comes from the members' best-on-endpoint-e states
    pe_members = None
    if args.per_endpoint_select:
        pe_members = [int(c.stem.split("_")[1]) for c in ckpts
                      if all((out_dir / f"{c.stem}.{ep}.ckpt").exists()
                             for ep in endpoints)]
        if pe_members:
            va_pe = _ensemble_predict_per_endpoint(
                out_dir, pe_members, va_ds, endpoints)
            _eval_set("val_per_endpoint_select", va_pe, va_ds,
                      endpoints, args.n_boot, report)
        else:
            print("no complete per-endpoint checkpoint sets found")

    if args.test_csv:
        from gt_pyg_tpu.data.datasets import clip_to_train_range

        te_df = pd.read_csv(args.test_csv)
        if any(e not in te_df.columns for e in endpoints):
            te_df = log_transform_assay_data(te_df)
        te_ds = get_tensor_data_parallel(
            te_df["SMILES"].tolist(), te_df[endpoints].values.tolist())
        te_preds, _ = _ensemble_predict(ckpts, te_ds, endpoints)
        # Test-time clipping to the train label range, as the reference's
        # submission path does (train_logd.ipynb cell 16, DELTA=0); the
        # val split stays unclipped (model selection ran unclipped too).
        tr_y = tr_df[endpoints].values.astype(float)
        te_preds = clip_to_train_range(
            te_preds, np.nanmin(tr_y, axis=0), np.nanmax(tr_y, axis=0))
        _eval_set("test", te_preds, te_ds, endpoints, args.n_boot, report)
        if pe_members:
            te_pe = _ensemble_predict_per_endpoint(
                out_dir, pe_members, te_ds, endpoints)
            te_pe = clip_to_train_range(
                te_pe, np.nanmin(tr_y, axis=0), np.nanmax(tr_y, axis=0))
            _eval_set("test_per_endpoint_select", te_pe, te_ds,
                      endpoints, args.n_boot, report)

    with open(out_dir / "ensemble_metrics.json", "w") as f:
        json.dump(report, f, indent=1, default=float)
    return 0


if __name__ == "__main__":
    sys.exit(main())
