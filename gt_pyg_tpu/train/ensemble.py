"""Vmapped ensemble training: M members in one jitted train step.

The reference's 9-model "beardy-polonium" ensemble (SURVEY.md §2.2,
``/root/reference/examples/compare_predictions.ipynb`` cell 5) is nine
independent sequential training runs. On a TPU that is the wrong shape:
one member's production step (batch 256, hidden 128) leaves most of the
MXU idle, and nine sequential runs pay the idle nine times.

``VmapEnsembleTrainer`` instead stacks the M member states (params /
batch_stats / optimizer) along a leading member axis and ``jax.vmap``s
the SAME per-member train step the single-model :class:`Trainer` uses —
the member axis rides the MXU batch dimension, so all nine members train
in one process at a small multiple of one member's step time.

Member diversity (``decorrelate=True``, the default): each member draws
its OWN epoch shuffle stream — at every step the M members consume M
independently-chosen minibatches, materialized per member inside the
vmap. This reproduces the reference ensemble's construction (nine
independent runs, each shuffling independently —
``compare_predictions.ipynb`` "beardy-polonium") at vmapped cost: the
per-member recipes are repadded to one shape and stacked host-side
(``DeviceDataset.unify_and_stack``), so the device still sees one
fixed-shape program. With ``decorrelate=False`` members share one
minibatch stream (round-2/3 behavior) and diversity comes only from
per-member init seeds and independent dropout / reparameterization /
loss-sampling PRNG streams.

Best-state tracking is per member and device-resident: a ``[M]`` bool
improvement mask (host-computed from per-member validation RAE) selects
between the stacked best and current states with one jitted
``jnp.where`` per leaf.

Per-endpoint selection (``fit(select_per_endpoint=True)``) additionally
tracks, for every (endpoint, member) pair, the member state at its best
val RAE *on that endpoint* — leaves gain a leading ``[E, M]`` axis pair.
Rationale (round-4 ensemble post-mortem, RESULTS.md): selecting each
member on the 9-endpoint AVERAGE RAE can pick an epoch that is off-peak
for a specific endpoint, and that mismatch grows as member streams
decorrelate; the reference's nine independent runs suffer the same
average-selection, so beating its per-endpoint rows may hinge on
endpoint-resolved selection. Both selections ride the same training
run, so one run yields both constructions for A/B.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.device_dataset import DeviceDataset, materialize_batch
from ..data.loader import stack_labels
from .losses import compute_task_scales
from .metrics import evaluate_predictions, macro_official_avg
from .trainer import TrainConfig, Trainer

logger = logging.getLogger(__name__)


def _bmask(imp: jnp.ndarray, leaf: jnp.ndarray) -> jnp.ndarray:
    """Reshape a [M] mask to broadcast over a [M, ...] leaf."""
    return imp.reshape((-1,) + (1,) * (leaf.ndim - 1))


class VmapEnsembleTrainer:
    """Train ``num_members`` models of one architecture simultaneously.

    Wraps a single-member :class:`Trainer` (loss, LR schedule, optimizer,
    NaN-skip semantics are shared code, not re-implementations) and vmaps
    its step functions over a leading member axis.
    """

    def __init__(self, model, config: TrainConfig, num_members: int,
                 member_seeds: Optional[Sequence[int]] = None,
                 decorrelate: bool = True):
        if num_members < 1:
            raise ValueError(f"num_members must be >= 1, got {num_members}")
        self.inner = Trainer(model, config)
        self.model = model
        self.cfg = config
        self.m = int(num_members)
        self.decorrelate = bool(decorrelate)
        seeds = (list(member_seeds) if member_seeds is not None
                 else [config.seed + i for i in range(num_members)])
        if len(seeds) != num_members:
            raise ValueError("member_seeds length != num_members")
        self.seeds = seeds
        self._fns: dict = {}
        self._upd_best = jax.jit(
            lambda best, cur, imp: jax.tree_util.tree_map(
                lambda b, s: jnp.where(_bmask(imp, s), s, b), best, cur))
        # per-endpoint updater: best leaves are [E, M, ...], cur leaves
        # [M, ...] broadcast over the endpoint axis, mask imp is [E, M]
        self._upd_best_e = jax.jit(
            lambda best, cur, imp: jax.tree_util.tree_map(
                lambda b, s: jnp.where(
                    imp.reshape(imp.shape + (1,) * (s.ndim - 1)),
                    s[None], b), best, cur))

    # ---- state ----
    def init_states(self, sample_batch) -> Dict[str, Any]:
        """Stacked member states: every leaf gains a leading [M] axis.

        The M member inits, optimizer zeros, AND the PRNG seeding all run
        on the host CPU backend, and the stacked tree transfers to the
        accelerator in one device_put per leaf: eager ops on a tunnelled
        accelerator each cost a remote round trip, and the per-member
        ``jax.random.PRNGKey`` alone was observed to stall a production
        launch for 40+ minutes on axon (round-4 root cause)."""
        from .trainer import host_cpu_device

        cpu = host_cpu_device()

        def build():
            states = []
            for s in self.seeds:
                rng = jax.random.PRNGKey(s)
                states.append(self.inner.init_state(
                    sample_batch, rng=rng, on_host=cpu is not None))
            return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                          *states)

        if cpu is not None:
            with jax.default_device(cpu):
                stacked = build()
            dev = jax.devices()[0]
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, dev), stacked)
        return build()

    def member_state(self, states, i: int) -> Dict[str, Any]:
        """Fetch one member's {params, batch_stats} as host numpy."""
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x[i]),
            {"params": states["params"],
             "batch_stats": states["batch_stats"]})

    # ---- jitted vmapped steps (per dataset meta, like Trainer) ----
    def _get_fns(self, dd: DeviceDataset):
        meta = (dd.static_meta(), self.decorrelate)
        if meta not in self._fns:
            if self.decorrelate:
                # ib carries a leading [M] member axis: each member
                # materializes ITS OWN minibatch inside the vmap (the M
                # feature gathers ride the same fused program)
                def train_fn(states, tree, ib, lr, task_scale, rngs):
                    def one(state, one_ib, rng):
                        batch = materialize_batch(tree, one_ib, meta[0])
                        return self.inner._train_step_impl(
                            state, batch, lr, task_scale, rng)

                    return jax.vmap(one)(states, ib, rngs)
            else:
                def train_fn(states, tree, ib, lr, task_scale, rngs):
                    batch = materialize_batch(tree, ib, meta[0])

                    def one(state, rng):
                        return self.inner._train_step_impl(
                            state, batch, lr, task_scale, rng)

                    return jax.vmap(one)(states, rngs)

            def eval_fn(params, bstats, tree, ib, task_scale):
                batch = materialize_batch(tree, ib, meta[0])

                def one(p, b):
                    return self.inner._eval_step_impl(p, b, batch,
                                                      task_scale)

                pred, log_var, loss = jax.vmap(one)(params, bstats)
                return pred, loss, batch.y, batch.y_mask

            self._fns[meta] = (jax.jit(train_fn), jax.jit(eval_fn))
        return self._fns[meta]

    # ---- epoch drivers ----
    def train_epoch(self, states, dd: DeviceDataset, task_scale,
                    epoch: int, rng):
        c = self.cfg
        lr = jnp.asarray(self.inner.lr_fn(epoch - 1), jnp.float32)
        train_fn, _ = self._get_fns(dd)
        tree = dd.device_tree()

        # Pad every batch to one dataset-stable tile count so the step
        # shape never changes: the vmapped M-member program costs
        # minutes per XLA compile on the remote toolchain, and without
        # this the per-step max-of-M unified shape wobbles between tile
        # multiples — a compile per wobble (round-4 incident: >1 h of
        # compile storm before epoch 1).
        # probe at least as many shuffle streams as there are members:
        # the decorrelated members each draw their own epoch stream, so
        # the probed max should cover ~M independent shuffles (ADVICE
        # r4; iter_index_batches also warns when a batch still exceeds
        # the floor, so any residual recompile is attributable)
        min_tiles = (dd.stable_tile_count(
            c.batch_train, c.tile_edges, tiles_multiple=c.tiles_multiple,
            tile_pack=c.tile_pack,
            probes=max(8, self.m + 2)) if c.tile_edges else 0)

        def _iter(rng_seed):
            return dd.iter_index_batches(
                c.batch_train, shuffle=True,
                rng=np.random.default_rng(rng_seed),
                node_multiple=c.node_multiple,
                edge_multiple=c.edge_multiple,
                tile_edges=c.tile_edges,
                tiles_multiple=c.tiles_multiple,
                tile_pack=c.tile_pack,
                min_tiles=min_tiles)

        if self.decorrelate:
            # one independent shuffle stream per member, like the
            # reference's M independent training runs. The per-step
            # M-recipe packing + unify is real host work (~21 packings
            # of 256 graphs x 9 members per epoch) — run it in a
            # prefetch thread so it overlaps device compute.
            from ..data.pipeline import PrefetchIterator

            iters = zip(*[_iter(1_000_003 * (s + 1) + epoch)
                          for s in self.seeds])
            batches = PrefetchIterator(
                (dd.unify_and_stack(step_ibs) for step_ibs in iters),
                prefetch=3)
        else:
            batches = _iter(c.seed + epoch)
        losses = []
        try:
            for ib in batches:
                ib = jax.tree_util.tree_map(jnp.asarray, ib)
                rng, sk = jax.random.split(rng)
                rngs = jax.random.split(sk, self.m)      # [M] keys
                states, loss, ok = train_fn(states, tree, ib, lr,
                                            task_scale, rngs)
                losses.append(loss)                       # [M]
        finally:
            # an exception mid-epoch must not strand the prefetch
            # worker on a full queue (thread + batch leak, ADVICE r4)
            close = getattr(batches, "close", None)
            if close is not None:
                close()
        vals = (np.asarray(jnp.stack(losses)) if losses
                else np.zeros((1, self.m)))               # [steps, M]
        finite = np.isfinite(vals)
        skipped = int((~finite).sum())
        if skipped:
            logger.warning("NaN loss in %d member-batch(es); those "
                           "updates were skipped", skipped)
        with np.errstate(invalid="ignore"):
            mean_loss = np.where(
                finite.any(axis=0),
                np.nanmean(np.where(finite, vals, np.nan), axis=0),
                np.nan)
        return states, mean_loss, rng

    def evaluate(self, states, dd: DeviceDataset, task_scale,
                 endpoints: Sequence[str]):
        """Per-member metrics on a (device-resident) eval set.

        Returns (per_member_metrics: list of evaluate_predictions dicts,
        preds [M, N, T] host array, targets, masks)."""
        c = self.cfg
        _, eval_fn = self._get_fns(dd)
        tree = dd.device_tree()
        preds_d, ys_d, ms_d, counts = [], [], [], []
        for ib in dd.iter_index_batches(c.batch_eval, shuffle=False,
                                        node_multiple=c.node_multiple,
                                        edge_multiple=c.edge_multiple,
                                        tile_edges=c.tile_edges,
                                        tiles_multiple=c.tiles_multiple,
                                        tile_pack=c.tile_pack):
            ng = int(ib.num_graphs)
            ib = jax.tree_util.tree_map(jnp.asarray, ib)
            pred, loss, y, ym = eval_fn(states["params"],
                                        states["batch_stats"], tree, ib,
                                        task_scale)
            preds_d.append(pred)
            ys_d.append(y)
            ms_d.append(ym)
            counts.append(ng)
        preds = np.concatenate([np.asarray(p)[:, :n]
                                for p, n in zip(preds_d, counts)], axis=1)
        targets = np.concatenate([np.asarray(y)[:n]
                                  for y, n in zip(ys_d, counts)])
        masks_np = np.concatenate([np.asarray(m)[:n]
                                   for m, n in zip(ms_d, counts)])
        masks = (masks_np * np.isfinite(targets)).astype(np.float32)
        per_member = [evaluate_predictions(targets, preds[i], masks,
                                           list(endpoints))
                      for i in range(self.m)]
        return per_member, preds, targets, masks

    # ---- full fit loop ----
    def fit(self, states, train_graphs, val_graphs,
            eval_every: Optional[int] = None,
            checkpoint_cb=None, checkpoint_every: int = 0,
            select_per_endpoint: bool = False,
            checkpoint_cb_per_endpoint=None
            ) -> Dict[str, Any]:
        """Train all members; returns stacked best states + history.

        ``eval_every`` (default ``cfg.eval_every``) evaluates/model-selects
        every k-th epoch — the vmapped validation pass costs ~a training
        epoch, so k=2 is a good throughput/selection tradeoff late in
        long runs.

        ``checkpoint_cb(epoch, best_states, best_rae, best_epoch)`` is
        invoked every ``checkpoint_every`` epochs (and at the end) once
        any best state exists — long multi-member runs survive
        interruption by persisting the stacked best states mid-flight.

        ``select_per_endpoint`` additionally tracks each member's best
        state PER ENDPOINT (leaves [E, M, ...], device-resident; E×M
        copies of the params — ~1 GB at 9×9 on the production model,
        well inside HBM). The result then carries
        ``best_states_per_endpoint`` / ``best_rae_per_endpoint`` /
        ``best_epoch_per_endpoint`` alongside the average-RAE selection,
        so one run yields both constructions.
        ``checkpoint_cb_per_endpoint(epoch, best_states_e [E, M, ...],
        best_rae_e [E, M], best_epoch_e [E, M])`` persists them on the
        same cadence as ``checkpoint_cb``."""
        c = self.cfg
        k_eval = int(eval_every if eval_every is not None
                     else max(1, c.eval_every))
        y_tr, m_tr = stack_labels(train_graphs)
        task_scale = jnp.asarray(compute_task_scales(y_tr, m_tr))
        train_mins = np.nanmin(np.where(m_tr > 0, y_tr, np.nan), axis=0)
        train_maxs = np.nanmax(np.where(m_tr > 0, y_tr, np.nan), axis=0)

        dd_tr = self.inner._get_dd(train_graphs)
        dd_va = self.inner._get_dd(val_graphs)

        impl = c.prng_impl
        if impl in (None, "threefry"):
            rng = jax.random.PRNGKey(c.seed)
        else:
            rng = jax.random.key(c.seed, impl=impl)

        best_rae = np.full(self.m, np.inf)
        best_epoch = np.zeros(self.m, np.int64)
        best_states = None
        n_ep = len(c.endpoints)
        best_rae_e = np.full((n_ep, self.m), np.inf)
        best_epoch_e = np.zeros((n_ep, self.m), np.int64)
        best_states_e = None
        history: List[Dict[str, Any]] = []

        for epoch in range(1, c.epochs + 1):
            t0 = time.time()
            states, train_loss, rng = self.train_epoch(
                states, dd_tr, task_scale, epoch, rng)
            rec: Dict[str, Any] = {"epoch": epoch,
                                   "train_loss": train_loss.tolist(),
                                   "lr": self.inner.lr_fn(epoch - 1)}
            if epoch % k_eval == 0 or epoch == c.epochs:
                per_member, *_ = self.evaluate(states, dd_va, task_scale,
                                               c.endpoints)
                raes = np.array([pm["Average"]["RAE"]
                                 for pm in per_member])
                rec["val_rae"] = raes.tolist()
                rec["val_mae"] = [pm["Average"]["MAE"]
                                  for pm in per_member]
                cur = {"params": states["params"],
                       "batch_stats": states["batch_stats"]}
                improved = np.isfinite(raes) & (raes < best_rae)
                if improved.any():
                    best_rae = np.where(improved, raes, best_rae)
                    best_epoch = np.where(improved, epoch, best_epoch)
                    if best_states is None:
                        best_states = jax.tree_util.tree_map(
                            lambda x: x.copy(), cur)
                    else:
                        best_states = self._upd_best(
                            best_states, cur, jnp.asarray(improved))
                if select_per_endpoint:
                    # [E, M] per-endpoint val RAE; endpoints with too
                    # few finite val labels report no RAE (NaN here) and
                    # their slot keeps the last best / fallback state
                    raes_e = np.array(
                        [[pm[ep].get("RAE", np.nan) for pm in per_member]
                         for ep in c.endpoints], dtype=np.float64)
                    rec["val_rae_per_endpoint"] = raes_e.tolist()
                    imp_e = np.isfinite(raes_e) & (raes_e < best_rae_e)
                    if imp_e.any():
                        best_rae_e = np.where(imp_e, raes_e, best_rae_e)
                        best_epoch_e = np.where(imp_e, epoch,
                                                best_epoch_e)
                        if best_states_e is None:
                            best_states_e = jax.tree_util.tree_map(
                                lambda x: jnp.broadcast_to(
                                    x[None],
                                    (n_ep,) + x.shape).copy(), cur)
                        else:
                            best_states_e = self._upd_best_e(
                                best_states_e, cur, jnp.asarray(imp_e))
            rec["time"] = time.time() - t0
            history.append(rec)
            if (checkpoint_cb is not None and best_states is not None
                    and checkpoint_every > 0
                    and (epoch % checkpoint_every == 0
                         or epoch == c.epochs)):
                checkpoint_cb(epoch, best_states, best_rae, best_epoch)
                if (checkpoint_cb_per_endpoint is not None
                        and best_states_e is not None):
                    checkpoint_cb_per_endpoint(epoch, best_states_e,
                                               best_rae_e, best_epoch_e)
            if epoch == 1 or epoch % c.log_every == 0 or epoch == c.epochs:
                vr = rec.get("val_rae")
                logger.info(
                    "[Ep %03d] LR=%.1e | loss[mean over %d members]=%.4f"
                    " | val RAE %s | best %s (%.1fs)",
                    epoch, rec["lr"], self.m,
                    float(np.nanmean(train_loss)),
                    ("[" + ", ".join(f"{v:.3f}" for v in vr) + "]"
                     if vr else "-"),
                    "[" + ", ".join(f"{v:.3f}" for v in best_rae) + "]",
                    rec["time"])

        if best_states is None:       # no eval epoch improved (tiny runs)
            best_states = jax.tree_util.tree_map(
                lambda x: x.copy(),
                {"params": states["params"],
                 "batch_stats": states["batch_stats"]})
        out = {"state": states, "best_states": best_states,
               "best_rae": best_rae, "best_epoch": best_epoch,
               "history": history, "train_mins": train_mins,
               "train_maxs": train_maxs,
               "task_scale": np.asarray(task_scale)}
        if select_per_endpoint:
            if best_states_e is None:
                best_states_e = jax.tree_util.tree_map(
                    lambda x: jnp.broadcast_to(
                        x[None], (n_ep,) + x.shape).copy(), best_states)
            out["best_states_per_endpoint"] = best_states_e
            out["best_rae_per_endpoint"] = best_rae_e
            out["best_epoch_per_endpoint"] = best_epoch_e
        return out
