"""Training loop: jit-compiled steps, composite loss, NaN-skip, best-state
tracking.

Library form of the reference's notebook recipe (train_logd.ipynb cells
9-12): AdamW (decoupled wd 1e-5) + warmup-cosine epoch LR, global-norm
clip 5.0, NaN-loss batch skip, best-by-val-RAE global state plus
per-endpoint best-by-normalized-MAE states.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.graph import GraphBatch
from ..data.loader import iter_batches, stack_labels
from .losses import custom_loss, mae_loss, compute_task_scales
from .metrics import evaluate_predictions, macro_official_avg
from .schedule import make_epoch_lr

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainConfig:
    """Production-recipe defaults (train_logd.ipynb cells 2/9/11)."""

    endpoints: Sequence[str] = ("LogD",)
    epochs: int = 2000
    batch_train: int = 256
    batch_eval: int = 1024
    base_lr: float = 1e-3
    min_lr: Optional[float] = None           # defaults to base_lr / 100
    weight_decay: float = 1e-5
    clip_norm: float = 5.0
    warmup_epochs: int = 25
    t_max: int = 500
    # composite-loss weights (cell 9)
    w_rae: float = 1.0
    w_huber: float = 0.25
    w_corr: float = 0.25
    w_tau: float = 0.1
    w_r2: float = 0.1
    huber_delta: float = 0.5
    tau_temp: float = 2.0
    rank_pairs: int = 512
    loss: str = "composite"                  # or "mae" (demo recipe)
    task_weights: Optional[Sequence[float]] = None
                                             # per-endpoint loss weights
                                             # (aligned with `endpoints`);
                                             # None = uniform mean over
                                             # tasks (reference behavior)
    seed: int = 1928374650
    node_multiple: int = 1024
    edge_multiple: int = 2048
    eval_every: int = 1
    log_every: int = 5
    ema_decay: Optional[float] = None        # per-epoch EMA of weights
                                             # (SWA-style recipe lever);
                                             # tracked + val-selected
                                             # alongside the raw stream,
                                             # returned as "best_ema"
    keep_top_k: int = 1                      # track the k best-val-RAE
                                             # states (k>1 enables
                                             # within-run checkpoint
                                             # averaging — average_states)
    zero_var: bool = False                   # sample the Gaussian in training
    tile_edges: Optional[int] = None         # tile-packed batches (fused
                                             # Pallas kernel contract);
                                             # set with attn_impl="tile"
    tiles_multiple: int = 8                  # tile-count bucketing
    tile_pack: str = "ffd"                   # tile bin-packing: "ffd"
                                             # packs ~8% more nodes and
                                             # ~30% more edges per tile
                                             # row but reorders graphs
                                             # within a batch (safe for
                                             # fit/evaluate: y travels
                                             # with the graph); predict()
                                             # always uses "nextfit" so
                                             # outputs align with the
                                             # input graph order
    mesh_devices: int = 1                    # data-parallel replicas; >1
                                             # routes the train step
                                             # through shard_map + psum
                                             # over a ("data",) mesh
                                             # (model should set
                                             # bn_axis_name="data" when
                                             # norm == "bn")
    prng_impl: Optional[str] = "rbg"         # "rbg" (default): measured
                                             # 62.5→51.3 ms/step on v5e vs
                                             # threefry; None/"threefry"
                                             # reproduces the legacy stream
    device_data: bool = True                 # dataset resident in HBM;
                                             # per-step transfer is ~100KB
                                             # of gather indices (also the
                                             # workaround for per-transfer
                                             # host leaks on tunnelled
                                             # runtimes)


class TrainState(dict):
    """Lightweight state pytree: params / batch_stats / opt_state / step."""


def host_cpu_device():
    """The host CPU device when the process exposes one NEXT TO an
    accelerator backend (``jax_platforms="axon,cpu"``), else None."""
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return None
    return cpu if jax.default_backend() != "cpu" else None


def init_on_host(model, sample_batch, rng, to_device: bool = True):
    """``model.init`` on the host CPU backend when available.

    Un-jitted initialization executes op-by-op; on remote/tunnelled TPU
    runtimes that costs minutes (every tiny op round-trips), while the
    same init on the CPU backend takes seconds. Requires the process to
    expose a cpu backend alongside the accelerator (e.g.
    ``jax_platforms="axon,cpu"``); falls back to the default device.

    ``to_device=False`` leaves the variables on the host — callers that
    post-process them (e.g. the vmapped ensemble stacking M member
    states) transfer once at the end instead of per member.

    Parameter structure is identical across attention impls, so init
    always runs the lax path — Pallas kernels cannot lower for the CPU
    backend used here."""
    if getattr(model, "attn_impl", "lax") != "lax":
        model = model.clone(attn_impl="lax")
    if getattr(model, "ffn_impl", "xla") != "xla":
        model = model.clone(ffn_impl="xla")
    cpu = host_cpu_device()
    if cpu is not None:
        with jax.default_device(cpu):
            rng = jax.device_put(rng, cpu)
            variables = model.init({"params": rng}, sample_batch,
                                   deterministic=True)
        if not to_device:
            return variables
        dev = jax.devices()[0]
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, dev), variables)
    return model.init({"params": rng}, sample_batch, deterministic=True)


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def average_states(states):
    """Mean of several model states (same pytree structure) — within-run
    checkpoint averaging over the ``keep_top_k`` best-val states (SWA
    over the cosine tail; running BN stats average too — they are
    per-feature moments of the same distribution)."""
    if len(states) == 1:
        return states[0]
    return jax.tree_util.tree_map(
        lambda *xs: jnp.mean(jnp.stack([jnp.asarray(x, jnp.float32)
                                        for x in xs]), axis=0
                             ).astype(jnp.asarray(xs[0]).dtype), *states)


class Trainer:
    """Owns the jitted train/eval steps for a GraphTransformerNet."""

    def __init__(self, model, config: TrainConfig,
                 frozen_mask: Optional[Any] = None,
                 frozen_bstats_mask: Optional[Any] = None):
        self.model = model
        self.cfg = config
        self.num_tasks = model.num_tasks
        self.lr_fn = make_epoch_lr(config.base_lr, config.min_lr,
                                   config.warmup_epochs, config.t_max)
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.clip_norm),
            optax.inject_hyperparams(optax.adamw)(
                learning_rate=config.base_lr,
                weight_decay=config.weight_decay,
            ),
        )
        self._frozen_mask = frozen_mask  # pytree of bools: True == frozen
        # frozen components keep their BatchNorm running stats (the
        # functional analog of the reference's BN-eval-on-freeze,
        # model.py:374-385)
        self._frozen_bstats_mask = frozen_bstats_mask
        # no buffer donation: donating the state makes Trainer.fit consume
        # its input (a footgun for callers that reuse/init once); the
        # params are small relative to activations, so the copy is cheap
        self._train_step = jax.jit(self._train_step_impl)
        self._eval_step = jax.jit(self._eval_step_impl)
        self._dd: dict = {}          # id(graphs) -> DeviceDataset
        self._dd_steps: dict = {}    # static_meta -> (train_fn, eval_fn)
        self.mesh = None
        self._dp_step = None
        if config.mesh_devices and config.mesh_devices > 1:
            from ..parallel import make_mesh

            devices = jax.devices()
            if len(devices) < config.mesh_devices:
                raise ValueError(
                    f"mesh_devices={config.mesh_devices} but only "
                    f"{len(devices)} devices are visible")
            self.mesh = make_mesh(
                {"data": config.mesh_devices},
                devices=devices[:config.mesh_devices])
            if getattr(model, "norm", None) == "bn" \
                    and getattr(model, "bn_axis_name", None) != "data":
                logger.warning(
                    "mesh_devices>1 with norm='bn' but the model has "
                    "bn_axis_name=%r — BatchNorm statistics will NOT "
                    "sync across replicas (build the model with "
                    "bn_axis_name='data')",
                    getattr(model, "bn_axis_name", None))

    # ---- state ----
    def init_state(self, sample_batch: GraphBatch, rng=None,
                   on_host: bool = False):
        """``on_host=True`` keeps every leaf on the host CPU backend
        (PRNG seeding, init, optimizer zeros) — callers that post-process
        the state (vmapped ensemble stacking) transfer once at the end.
        Eager ops on a tunnelled accelerator each cost a remote round
        trip (observed to stall for tens of minutes on axon), so nothing
        here may dispatch to the default device when a host CPU backend
        exists."""
        from ..data.graph import check_batch_limits

        try:
            check_batch_limits(sample_batch,
                               getattr(self.model, "max_in_degree", 16),
                               getattr(self.model, "max_nodes_per_graph",
                                       128))
        except TypeError:
            pass  # already-traced batch; caller validated host-side
        cpu = host_cpu_device()
        if rng is None:
            if cpu is not None:
                with jax.default_device(cpu):
                    rng = jax.random.PRNGKey(self.cfg.seed)
            else:
                rng = jax.random.PRNGKey(self.cfg.seed)
        variables = init_on_host(self.model, sample_batch, rng,
                                 to_device=not (on_host and
                                                cpu is not None))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if on_host and cpu is not None:
            with jax.default_device(cpu):
                opt_state = self.tx.init(params)
                step = jnp.asarray(0, jnp.int32)
        else:
            opt_state = self.tx.init(params)
            step = jnp.asarray(0, jnp.int32)
        return {"params": params, "batch_stats": batch_stats,
                "opt_state": opt_state, "step": step}

    def restore_state(self, sample_batch: GraphBatch, ckpt_path):
        """Resume training state (params + batch_stats + optimizer) from a
        checkpoint saved with optimizer state. Returns (state, epoch)."""
        from flax import serialization

        from ..checkpoint import load_checkpoint

        ckpt = load_checkpoint(ckpt_path)
        state = self.init_state(sample_batch)
        ms = ckpt["model_state_dict"]
        state["params"] = serialization.from_state_dict(
            state["params"], ms["params"])
        state["batch_stats"] = serialization.from_state_dict(
            state["batch_stats"], ms.get("batch_stats", {}))
        if "optimizer_state_dict" in ckpt:
            state["opt_state"] = serialization.from_state_dict(
                state["opt_state"], ckpt["optimizer_state_dict"])
        epoch = int(ckpt.get("epoch", 0))
        return state, epoch + 1

    # ---- loss ----
    def _loss(self, pred, y, mask, task_scale, rng):
        c = self.cfg
        if c.loss == "mae":
            return mae_loss(pred, y, mask)
        tw = None
        if c.task_weights is not None:
            tw = jnp.asarray(c.task_weights, dtype=jnp.float32)
        return custom_loss(
            pred, y, mask,
            w_rae=c.w_rae, w_huber=c.w_huber, w_corr=c.w_corr,
            w_tau=c.w_tau, w_r2=c.w_r2, huber_delta=c.huber_delta,
            tau_temp=c.tau_temp, rank_pairs=c.rank_pairs,
            task_scale=task_scale, rng=rng, task_weight=tw,
        )

    # ---- freeze masks ----
    # Both masks are read at TRACE time of the jitted steps (the bstats
    # mask additionally selects the frozen-norm names baked into the
    # model apply), so assigning them after a step has compiled would
    # silently change nothing. The setters therefore drop every compiled
    # step so the next call retraces with the new mask.
    def _invalidate_steps(self):
        self._train_step = jax.jit(self._train_step_impl)
        self._eval_step = jax.jit(self._eval_step_impl)
        self._dd_steps.clear()
        self._dp_step = None

    @property
    def frozen_mask(self):
        return self._frozen_mask

    @frozen_mask.setter
    def frozen_mask(self, value):
        self._frozen_mask = value
        self._invalidate_steps()

    @property
    def frozen_bstats_mask(self):
        return self._frozen_bstats_mask

    @frozen_bstats_mask.setter
    def frozen_bstats_mask(self, value):
        self._frozen_bstats_mask = value
        self._invalidate_steps()

    # ---- steps ----
    def _frozen_norm_names(self):
        """Top-level modules whose batch_stats are fully frozen: their
        BatchNorms normalize with RUNNING stats during training (the
        reference flips frozen components' BNs to eval, model.py:374-385).
        Static tuple — read at trace time."""
        if self.frozen_bstats_mask is None:
            return ()
        names = []
        for k, v in self.frozen_bstats_mask.items():
            leaves = jax.tree_util.tree_leaves(v)
            if leaves and all(bool(x) for x in leaves):
                names.append(str(k))
        return tuple(sorted(names))

    def _train_step_impl(self, state, batch: GraphBatch, lr, task_scale,
                         rng, axis=None):
        rng_drop, rng_rep, rng_loss = jax.random.split(rng, 3)

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state["batch_stats"]}
            (pred, _), updates = self.model.apply(
                variables, batch, deterministic=False,
                zero_var=self.cfg.zero_var,
                frozen_norms=self._frozen_norm_names(),
                rngs={"dropout": rng_drop, "reparam": rng_rep},
                mutable=["batch_stats"])
            y, mask = batch.y, batch.y_mask
            valid_mask = mask * jnp.isfinite(y).astype(mask.dtype)
            loss = self._loss(pred, y, valid_mask, task_scale, rng_loss)
            # pred rides the aux and feeds the returned `ok`: beyond the
            # finiteness check itself, keeping pred live as a program
            # output works around an observed XLA/TPU wrong-code compile
            # in which the whole backward was folded to EXACT ZEROS when
            # pred was dead after the loss (bf16 flagship config on v5e:
            # same math, same keys — gnorm 2177 with pred kept as aux vs
            # gnorm 0.0 without; see tools/diag_grads.py and RESULTS.md
            # round 3).
            return loss, (updates.get("batch_stats",
                                      state["batch_stats"]), pred)

        (loss, (new_bstats, pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])

        pred_ok = jnp.isfinite(pred).all()
        if axis is not None:
            # data-parallel: all-reduce over ICI. batch_stats are already
            # globally-synced when the model carries bn_axis_name; the
            # pmean is then an identity (and the correct average when it
            # does not). pred_ok must agree across replicas or the
            # skip-guard would fork the replicated params.
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)
            new_bstats = jax.lax.pmean(new_bstats, axis)
            pred_ok = jax.lax.pmin(pred_ok.astype(jnp.int32), axis) > 0

        if self.frozen_mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, f: jnp.where(f, 0.0, g), grads, self.frozen_mask)
        if self.frozen_bstats_mask is not None:
            new_bstats = jax.tree_util.tree_map(
                lambda new, old, f: jnp.where(f, old, new),
                new_bstats, state["batch_stats"], self.frozen_bstats_mask)

        opt_state = state["opt_state"]
        # inject the epoch LR
        opt_state[1].hyperparams["learning_rate"] = lr  # type: ignore
        updates, new_opt = self.tx.update(grads, opt_state, state["params"])
        new_params = optax.apply_updates(state["params"], updates)

        # NaN batch skip (reference cell 9, hardened): the loss can be
        # finite while the grads are not (a 0*inf in the backward only),
        # which would poison the params with ok=True — guard on both.
        # The pred term also pins pred as a live output (see loss_fn).
        ok = (jnp.isfinite(loss) & jnp.isfinite(optax.global_norm(grads))
              & pred_ok)
        new_params = _tree_where(ok, new_params, state["params"])
        new_opt = _tree_where(ok, new_opt, opt_state)
        new_bstats = _tree_where(ok, new_bstats, state["batch_stats"])

        new_state = {"params": new_params, "batch_stats": new_bstats,
                     "opt_state": new_opt, "step": state["step"] + 1}
        return new_state, loss, ok

    def _eval_step_impl(self, params, batch_stats, batch: GraphBatch,
                        task_scale):
        variables = {"params": params, "batch_stats": batch_stats}
        pred, log_var = self.model.apply(variables, batch,
                                         deterministic=True)
        y, mask = batch.y, batch.y_mask
        valid = mask * jnp.isfinite(y).astype(mask.dtype)
        loss = self._loss(pred, y, valid, task_scale,
                          jax.random.PRNGKey(0))
        return pred, log_var, loss

    # ---- data-parallel path ----
    def _get_dp_step(self):
        """shard_map-wrapped train step over the ("data",) mesh: the
        SAME per-device body as the single-device path (LR injection,
        frozen masks, NaN-skip) plus gradient/loss pmean."""
        if self._dp_step is None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            def body(state, batch, lr, task_scale, rng):
                batch = jax.tree_util.tree_map(lambda x: x[0], batch)
                rng = jax.random.fold_in(
                    rng, jax.lax.axis_index("data"))
                return self._train_step_impl(state, batch, lr,
                                             task_scale, rng,
                                             axis="data")

            # check_vma=False: the fused Pallas kernel's outputs carry no
            # varying-mesh-axes annotation, which the checker rejects
            smapped = shard_map(
                body, mesh=self.mesh,
                in_specs=(P(), P("data"), P(), P(), P()),
                out_specs=(P(), P(), P()), check_vma=False)
            self._dp_step = jax.jit(smapped)
        return self._dp_step

    def _train_epoch_dp(self, state, graphs, task_scale, epoch, rng):
        """One data-parallel epoch: global minibatches are round-robin
        sharded into per-replica padded sub-batches with common shapes
        and fed through the shard_map step."""
        from ..parallel.data_parallel import make_stacked_shards

        c = self.cfg
        d = c.mesh_devices
        shard_bs = -(-c.batch_train // d)
        lr = jnp.asarray(self.lr_fn(epoch - 1), jnp.float32)
        np_rng = np.random.default_rng(c.seed + epoch)
        order = np.arange(len(graphs))
        np_rng.shuffle(order)
        step = self._get_dp_step()
        losses = []
        for s in range(0, len(order), c.batch_train):
            chunk = [graphs[i] for i in order[s:s + c.batch_train]]
            stacked = make_stacked_shards(
                chunk, d, shard_bs, num_tasks=self.num_tasks,
                node_multiple=c.node_multiple,
                edge_multiple=c.edge_multiple,
                tile_edges=c.tile_edges,
                tiles_multiple=c.tiles_multiple,
                tile_pack=c.tile_pack)
            jb = jax.tree_util.tree_map(jnp.asarray, stacked)
            rng, step_rng = jax.random.split(rng)
            state, loss, ok = step(state, jb, lr, task_scale, step_rng)
            losses.append(loss)
        vals = np.asarray(jnp.stack(losses)) if losses else np.zeros(1)
        finite = np.isfinite(vals)
        if int((~finite).sum()):
            logger.warning("NaN loss in %d batch(es); updates skipped",
                           int((~finite).sum()))
        mean_loss = (float(vals[finite].mean()) if finite.any()
                     else float("nan"))
        return state, mean_loss, rng

    # ---- device-resident data path ----
    def _get_dd(self, graphs):
        from ..data.device_dataset import DeviceDataset

        key = id(graphs)
        if key not in self._dd:
            self._dd[key] = DeviceDataset(graphs, num_tasks=self.num_tasks)
        return self._dd[key]

    def _get_dd_steps(self, dd):
        from ..data.device_dataset import materialize_batch

        meta = dd.static_meta()
        if meta not in self._dd_steps:
            def train_fn(state, tree, ib, lr, task_scale, rng):
                batch = materialize_batch(tree, ib, meta)
                return self._train_step_impl(state, batch, lr, task_scale,
                                             rng)

            def eval_fn(params, batch_stats, tree, ib, task_scale):
                batch = materialize_batch(tree, ib, meta)
                out = self._eval_step_impl(params, batch_stats, batch,
                                           task_scale)
                return out + (batch.y, batch.y_mask)

            self._dd_steps[meta] = (jax.jit(train_fn), jax.jit(eval_fn))
        return self._dd_steps[meta]

    # ---- epoch drivers ----
    def train_epoch(self, state, graphs, task_scale, epoch: int, rng):
        """One epoch. Losses stay on device until one fetch at the end —
        per-batch host syncs are ruinous on remote/tunnelled backends."""
        c = self.cfg
        if self.mesh is not None:
            return self._train_epoch_dp(state, graphs, task_scale, epoch,
                                        rng)
        lr = jnp.asarray(self.lr_fn(epoch - 1), jnp.float32)
        np_rng = np.random.default_rng(c.seed + epoch)
        losses = []
        if c.device_data:
            dd = self._get_dd(graphs)
            train_fn, _ = self._get_dd_steps(dd)
            tree = dd.device_tree()
            for ib in dd.iter_index_batches(c.batch_train, shuffle=True,
                                            rng=np_rng,
                                            node_multiple=c.node_multiple,
                                            edge_multiple=c.edge_multiple,
                                            tile_edges=c.tile_edges,
                                            tiles_multiple=c.tiles_multiple,
                                            tile_pack=c.tile_pack):
                ib = jax.tree_util.tree_map(jnp.asarray, ib)
                rng, step_rng = jax.random.split(rng)
                state, loss, ok = train_fn(state, tree, ib, lr, task_scale,
                                           step_rng)
                losses.append(loss)
            vals = (np.asarray(jnp.stack(losses)) if losses
                    else np.zeros(1))
            finite = np.isfinite(vals)
            if int((~finite).sum()):
                logger.warning("NaN loss in %d batch(es); updates skipped",
                               int((~finite).sum()))
            mean_loss = (float(vals[finite].mean()) if finite.any()
                         else float("nan"))
            return state, mean_loss, rng
        from ..data.pipeline import PrefetchIterator

        it = PrefetchIterator(
            iter_batches(graphs, c.batch_train, shuffle=True, rng=np_rng,
                         node_multiple=c.node_multiple,
                         edge_multiple=c.edge_multiple,
                         num_tasks=self.num_tasks,
                         tile_edges=c.tile_edges,
                         tiles_multiple=c.tiles_multiple,
                         tile_pack=c.tile_pack))
        for batch in it:
            batch = jax.tree_util.tree_map(jnp.asarray, batch)
            rng, step_rng = jax.random.split(rng)
            state, loss, ok = self._train_step(state, batch, lr, task_scale,
                                               step_rng)
            losses.append(loss)
        vals = np.asarray(jnp.stack(losses)) if losses else np.zeros(1)
        finite = np.isfinite(vals)
        skipped = int((~finite).sum())
        if skipped:
            logger.warning("NaN loss detected in %d batch(es); updates "
                           "were skipped", skipped)
        mean_loss = float(vals[finite].mean()) if finite.any() else float("nan")
        return state, mean_loss, rng

    def evaluate(self, state, graphs, task_scale):
        c = self.cfg
        if c.device_data:
            return self._evaluate_dd(state, graphs, task_scale)
        preds_d, losses_d, targets, masks, counts = [], [], [], [], []
        for batch in iter_batches(graphs, c.batch_eval, shuffle=False,
                                  node_multiple=c.node_multiple,
                                  edge_multiple=c.edge_multiple,
                                  num_tasks=self.num_tasks,
                                  tile_edges=c.tile_edges,
                                  tiles_multiple=c.tiles_multiple,
                                  tile_pack=c.tile_pack):
            ng = int(batch.num_graphs)
            jb = jax.tree_util.tree_map(jnp.asarray, batch)
            pred, log_var, loss = self._eval_step(
                state["params"], state["batch_stats"], jb, task_scale)
            preds_d.append(pred)
            losses_d.append(loss)
            counts.append(ng)
            targets.append(np.asarray(batch.y)[:ng])
            masks.append(np.asarray(batch.y_mask)[:ng]
                         * np.isfinite(np.asarray(batch.y)[:ng]))
        # single host fetch for the whole eval pass
        preds_h = [np.asarray(p) for p in preds_d]
        loss_vals = np.asarray(jnp.stack(losses_d))
        losses = [float(v) for v in loss_vals[np.isfinite(loss_vals)]]
        preds = np.concatenate([p[:ng] for p, ng in zip(preds_h, counts)])
        targets = np.concatenate(targets)
        masks = np.concatenate(masks).astype(np.float32)
        task_metrics = evaluate_predictions(targets, preds, masks,
                                            list(c.endpoints))
        avg_loss = float(np.mean(losses)) if losses else float("nan")
        return avg_loss, task_metrics, preds, targets, masks

    def _evaluate_dd(self, state, graphs, task_scale):
        c = self.cfg
        dd = self._get_dd(graphs)
        _, eval_fn = self._get_dd_steps(dd)
        tree = dd.device_tree()
        preds_d, losses_d, ys_d, ms_d, counts = [], [], [], [], []
        for ib in dd.iter_index_batches(c.batch_eval, shuffle=False,
                                        node_multiple=c.node_multiple,
                                        edge_multiple=c.edge_multiple,
                                        tile_edges=c.tile_edges,
                                        tiles_multiple=c.tiles_multiple,
                                        tile_pack=c.tile_pack):
            ng = int(ib.num_graphs)
            ib = jax.tree_util.tree_map(jnp.asarray, ib)
            pred, log_var, loss, y, ym = eval_fn(
                state["params"], state["batch_stats"], tree, ib, task_scale)
            preds_d.append(pred)
            losses_d.append(loss)
            ys_d.append(y)
            ms_d.append(ym)
            counts.append(ng)
        loss_vals = np.asarray(jnp.stack(losses_d))
        losses = [float(v) for v in loss_vals[np.isfinite(loss_vals)]]
        preds = np.concatenate([np.asarray(p)[:n]
                                for p, n in zip(preds_d, counts)])
        targets = np.concatenate([np.asarray(y)[:n]
                                  for y, n in zip(ys_d, counts)])
        masks_np = np.concatenate([np.asarray(m)[:n]
                                   for m, n in zip(ms_d, counts)])
        masks = (masks_np * np.isfinite(targets)).astype(np.float32)
        task_metrics = evaluate_predictions(targets, preds, masks,
                                            list(c.endpoints))
        avg_loss = float(np.mean(losses)) if losses else float("nan")
        return avg_loss, task_metrics, preds, targets, masks

    def predict(self, state, graphs):
        """Deterministic μ predictions for (possibly unlabeled) graphs."""
        c = self.cfg
        task_scale = jnp.ones((self.num_tasks,), jnp.float32)
        outs = []
        for batch in iter_batches(graphs, c.batch_eval, shuffle=False,
                                  node_multiple=c.node_multiple,
                                  edge_multiple=c.edge_multiple,
                                  num_tasks=self.num_tasks,
                                  tile_edges=c.tile_edges,
                                  tiles_multiple=c.tiles_multiple,
                                  tile_pack="nextfit"):
            ng = int(batch.num_graphs)
            jb = jax.tree_util.tree_map(jnp.asarray, batch)
            pred, _, _ = self._eval_step(state["params"],
                                         state["batch_stats"], jb,
                                         task_scale)
            outs.append(np.asarray(pred)[:ng])
        return np.concatenate(outs)

    # ---- full fit loop ----
    def fit(self, state, train_graphs, val_graphs,
            callbacks: Optional[List[Callable]] = None,
            start_epoch: int = 1,
            end_epoch: Optional[int] = None) -> Dict[str, Any]:
        c = self.cfg
        y_tr, m_tr = stack_labels(train_graphs)
        task_scale = jnp.asarray(compute_task_scales(y_tr, m_tr))
        train_mins = np.nanmin(np.where(m_tr > 0, y_tr, np.nan), axis=0)
        train_maxs = np.nanmax(np.where(m_tr > 0, y_tr, np.nan), axis=0)

        impl = c.prng_impl
        if impl in (None, "threefry"):
            # legacy stream — bit-identical to the recorded round-1 runs
            rng = jax.random.PRNGKey(c.seed)
        else:
            rng = jax.random.key(c.seed, impl=impl)
        best = {"val_rae": float("inf"), "state": None, "epoch": 0}
        per_ep_best = {ep: {"nma": float("inf"), "state": None, "epoch": 0}
                       for ep in c.endpoints}
        # EMA stream (cfg.ema_decay): a per-epoch exponential moving
        # average of params AND batch_stats, evaluated + val-selected
        # like the raw stream (one extra eval per epoch when enabled)
        ema_state = None
        best_ema = {"val_rae": float("inf"), "state": None, "epoch": 0}
        if c.ema_decay is not None:
            d = float(c.ema_decay)

            @jax.jit
            def _ema_update(ema, cur):
                return jax.tree_util.tree_map(
                    lambda e, p: d * e + (1.0 - d) * p, ema, cur)
        topk: List[Dict[str, Any]] = []      # c.keep_top_k best states
        history: List[Dict[str, Any]] = []

        last_epoch = min(c.epochs, end_epoch) if end_epoch else c.epochs
        for epoch in range(start_epoch, last_epoch + 1):
            t0 = time.time()
            state, train_loss, rng = self.train_epoch(
                state, train_graphs, task_scale, epoch, rng)
            val_loss, val_metrics, *_ = self.evaluate(state, val_graphs,
                                                      task_scale)
            if c.ema_decay is not None:
                cur = {"params": state["params"],
                       "batch_stats": state["batch_stats"]}
                ema_state = (jax.tree_util.tree_map(lambda x: x.copy(), cur)
                             if ema_state is None
                             else _ema_update(ema_state, cur))
                _, ema_metrics, *_ = self.evaluate(
                    {"params": ema_state["params"],
                     "batch_stats": ema_state["batch_stats"]},
                    val_graphs, task_scale)
                ema_rae = ema_metrics["Average"]["RAE"]
                if np.isfinite(ema_rae) and ema_rae < best_ema["val_rae"]:
                    best_ema = {"val_rae": ema_rae,
                                "state": jax.tree_util.tree_map(
                                    lambda x: x.copy(), ema_state),
                                "epoch": epoch}
            avg = val_metrics["Average"]
            history.append({"epoch": epoch, "train_loss": train_loss,
                            "val_loss": val_loss, **avg,
                            "lr": self.lr_fn(epoch - 1),
                            "time": time.time() - t0})

            if np.isfinite(avg["RAE"]) and avg["RAE"] < best["val_rae"]:
                # device-side copy: per-leaf host transfers cost minutes
                # over tunnelled runtimes; fetch once at save time instead
                best = {"val_rae": avg["RAE"],
                        "state": jax.tree_util.tree_map(
                            lambda x: x.copy(), {
                                "params": state["params"],
                                "batch_stats": state["batch_stats"]}),
                        "epoch": epoch}
            if c.keep_top_k > 1 and np.isfinite(avg["RAE"]) and (
                    len(topk) < c.keep_top_k
                    or avg["RAE"] < topk[-1]["val_rae"]):
                topk.append({"val_rae": avg["RAE"], "epoch": epoch,
                             "state": jax.tree_util.tree_map(
                                 lambda x: x.copy(), {
                                     "params": state["params"],
                                     "batch_stats":
                                         state["batch_stats"]})})
                topk.sort(key=lambda t: t["val_rae"])
                del topk[c.keep_top_k:]

            for ti, ep in enumerate(c.endpoints):
                md = val_metrics.get(ep, {})
                mae = md.get("MAE", np.inf)
                rng_span = train_maxs[ti] - train_mins[ti]
                nma = (mae / rng_span if np.isfinite(mae)
                       and np.isfinite(rng_span) and rng_span > 0
                       else np.inf)
                if nma < per_ep_best[ep]["nma"]:
                    per_ep_best[ep] = {
                        "nma": nma, "epoch": epoch,
                        "state": jax.tree_util.tree_map(
                            lambda x: x.copy(), {
                                "params": state["params"],
                                "batch_stats": state["batch_stats"]})}

            if epoch == 1 or epoch % c.log_every == 0 or epoch == c.epochs:
                va = macro_official_avg(val_metrics)
                logger.info(
                    "[Ep %03d] LR=%.1e | loss=%.4f | Val: MAE=%.3f RAE=%.3f "
                    "R2=%.3f rho=%.3f tau=%.3f (%.1fs)",
                    epoch, self.lr_fn(epoch - 1), train_loss, va["MAE"],
                    va["RAE"], va["R2"], va["Spearman R"],
                    va["Kendall's Tau"], history[-1]["time"])
            for cb in callbacks or []:
                cb(epoch, state, history[-1])

        return {"state": state, "best": best, "best_ema": best_ema,
                "per_endpoint_best": per_ep_best,
                "topk": topk, "history": history,
                "train_mins": train_mins, "train_maxs": train_maxs,
                "task_scale": np.asarray(task_scale)}
