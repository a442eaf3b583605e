"""Step-by-step NaN diagnostic for the flagship bench train step.

Runs N steps of the exact bench train loop, printing loss / gradient
norm / prediction-finiteness each step, to localize non-finite events
to an implementation (tile vs lax attention, fused vs xla FFN) or to
optimization dynamics (identical RNG stream across variants).

Usage: python tools/diag_nan.py [--attn-impl tile] [--ffn-impl auto]
       [--steps 60] [--lr 1e-3] [--skip-nonfinite]
"""

import argparse
import functools
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--attn-impl", default="tile", choices=["tile", "lax"])
    p.add_argument("--ffn-impl", default="auto",
                   choices=["auto", "fused", "xla"])
    p.add_argument("--batch-graphs", type=int, default=2048)
    p.add_argument("--tile-edges", type=int, default=256)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--warmup-steps", type=int, default=0,
                   help="linear LR warmup steps (bench.py defaults to 50)")
    p.add_argument("--norm-fold", default="auto",
                   choices=["auto", "on", "off"])
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--skip-nonfinite", action="store_true",
                   help="skip the update on non-finite grads (the "
                        "Trainer's production guard)")
    p.add_argument("--bench-stream", action="store_true",
                   help="replicate bench.py's exact rng chain: one step "
                        "with the unfolded key, then fold_in 0..99 chained, "
                        "repeated per 100-step block")
    p.add_argument("--exact", action="store_true",
                   help="use bench.py's exact train_step outputs (no extra "
                        "aux in the jitted step — the aux changes XLA "
                        "fusion and, in bf16, the trajectory); diagnostics "
                        "come from a separate jitted probe")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    try:
        cur = jax.config.jax_platforms or ""
        if cur and "cpu" not in cur:
            jax.config.update("jax_platforms", cur + ",cpu")
    except Exception:
        pass

    from bench import NUM_LAYERS, build_batch
    from gt_pyg_tpu.nn import GraphTransformerNet
    from gt_pyg_tpu.train.losses import custom_loss
    from gt_pyg_tpu.train.trainer import init_on_host

    tile_edges = args.tile_edges if args.attn_impl == "tile" else None
    batch = build_batch(args.batch_graphs, tile_edges)
    model = GraphTransformerNet(
        node_dim_in=140, edge_dim_in=39, hidden_dim=128,
        num_gt_layers=NUM_LAYERS, num_heads=8, dropout=0.3, norm="bn",
        gate=True, gt_aggregators=("sum", "mean"),
        aggregators=("sum", "mean", "max", "std"),
        attn_impl=args.attn_impl, ffn_impl=args.ffn_impl,
        norm_fold=args.norm_fold,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32)
    variables = init_on_host(model, batch, jax.random.PRNGKey(0))
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    if args.warmup_steps:
        schedule = optax.join_schedules(
            [optax.linear_schedule(args.lr / 100, args.lr,
                                   args.warmup_steps),
             optax.constant_schedule(args.lr)], [args.warmup_steps])
    else:
        schedule = args.lr
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adamw(schedule, weight_decay=1e-5))
    opt_state = tx.init(variables["params"])
    task_scale = jnp.ones((1,), jnp.float32)
    loss_fn = functools.partial(custom_loss, w_rae=1.0, w_huber=0.25,
                                w_corr=0.25, w_tau=0.1, w_r2=0.1,
                                huber_delta=0.5, tau_temp=2.0)

    if args.exact:
        # bit-for-bit the bench.py train_step (aux limited to batch_stats)
        @jax.jit
        def train_step(params, bstats, opt_state, batch, rng):
            rd, rr, rl = jax.random.split(rng, 3)

            def f(p):
                (pred, _), upd = model.apply(
                    {"params": p, "batch_stats": bstats}, batch,
                    deterministic=False,
                    rngs={"dropout": rd, "reparam": rr},
                    mutable=["batch_stats"])
                pred = pred.astype(jnp.float32)
                valid = batch.y_mask * jnp.isfinite(batch.y).astype(
                    jnp.float32)
                return loss_fn(pred, batch.y, valid, task_scale=task_scale,
                               rng=rl), upd["batch_stats"]

            (loss, nb), grads = jax.value_and_grad(f, has_aux=True)(params)
            updates, no = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            gn = optax.global_norm(grads)
            ok = jnp.isfinite(gn)
            new_params, no, nb = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b),
                (new_params, no, nb), (params, opt_state, bstats))
            return new_params, nb, no, loss, gn, ok

        @jax.jit
        def probe(params, bstats, batch, rng):
            rd, rr, _ = jax.random.split(rng, 3)
            (pred, log_var), _ = model.apply(
                {"params": params, "batch_stats": bstats}, batch,
                deterministic=False, rngs={"dropout": rd, "reparam": rr},
                mutable=["batch_stats"])
            mu_pred, _ = model.apply(
                {"params": params, "batch_stats": bstats}, batch,
                deterministic=True, zero_var=True)
            valid = batch.y_mask * jnp.isfinite(batch.y).astype(jnp.float32)
            mu_err = jnp.sum(jnp.abs(mu_pred.astype(jnp.float32)
                                     - jnp.nan_to_num(batch.y)) * valid
                             ) / jnp.maximum(valid.sum(), 1.0)
            return (optax.global_norm(params),
                    jnp.abs(pred).max(), log_var.max(),
                    mu_err)
    else:
        @jax.jit
        def train_step(params, bstats, opt_state, batch, rng):
            rd, rr, rl = jax.random.split(rng, 3)

            def f(p):
                (pred, _), upd = model.apply(
                    {"params": p, "batch_stats": bstats}, batch,
                    deterministic=False, rngs={"dropout": rd, "reparam": rr},
                    mutable=["batch_stats"])
                pred = pred.astype(jnp.float32)
                valid = batch.y_mask * jnp.isfinite(batch.y).astype(jnp.float32)
                return (loss_fn(pred, batch.y, valid, task_scale=task_scale,
                                rng=rl),
                        (upd["batch_stats"], pred))

            (loss, (nb, pred)), grads = jax.value_and_grad(
                f, has_aux=True)(params)
            gnorm = optax.global_norm(grads)
            updates, no = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            if args.skip_nonfinite:
                ok = jnp.isfinite(gnorm)
                new_params, no, nb = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(ok, a, b),
                    (new_params, no, nb), (params, opt_state, bstats))
            return (new_params, nb, no, loss, gnorm,
                    jnp.isfinite(pred).all(), jnp.abs(pred).max())

    params, bstats = variables["params"], variables.get("batch_stats", {})
    rng = jax.random.key(0, impl="rbg")
    print(f"# attn={args.attn_impl} ffn={args.ffn_impl} lr={args.lr} "
          f"fold={args.norm_fold} skip={args.skip_nonfinite}", flush=True)
    if args.bench_stream:
        # bench.py: compile step uses the unfolded key, then each
        # 100-step run folds i=0..99 into the carried key
        keys = [rng]
        kk = rng
        blocks = (args.steps - 1 + 99) // 100
        for _ in range(blocks):
            for i in range(100):
                kk = jax.random.fold_in(kk, i)
                keys.append(kk)
        keys = keys[:args.steps]
    else:
        keys = []
        kk = rng
        for i in range(args.steps):
            kk = jax.random.fold_in(kk, i)
            keys.append(kk)
    for i in range(args.steps):
        if args.exact:
            params, bstats, opt_state, loss, gn, ok = train_step(
                params, bstats, opt_state, jb, keys[i])
            if i % 5 == 0 or float(loss) > 5:
                pn, pmax, lvmax, mu_err = probe(params, bstats, jb, keys[i])
                print(f"step {i:3d} loss {float(loss):10.4f} "
                      f"gnorm {float(gn):12.4g} ok {bool(ok)} "
                      f"|params| {float(pn):9.2f} |pred|max "
                      f"{float(pmax):10.3f} log_var_max {float(lvmax):7.3f} "
                      f"mu_mae {float(mu_err):8.4f}", flush=True)
            else:
                print(f"step {i:3d} loss {float(loss):10.4f} "
                      f"gnorm {float(gn):12.4g} ok {bool(ok)}", flush=True)
        else:
            params, bstats, opt_state, loss, gnorm, finite, pmax = train_step(
                params, bstats, opt_state, jb, keys[i])
            print(f"step {i:3d} loss {float(loss):10.4f} "
                  f"gnorm {float(gnorm):12.4f} pred_finite {bool(finite)} "
                  f"|pred|max {float(pmax):10.3f}", flush=True)


if __name__ == "__main__":
    main()
