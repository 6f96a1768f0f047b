"""Jitted training loop with Keras-parity epoch semantics.

Replaces the reference's ``model.compile(Adam(5e-4), bce_dice_loss,
[dice_coeff]); model.fit(batch_size=32, epochs=80, ...)``
(``holdout.py:1041-1061``) with:

- one jitted *epoch* function: ``lax.scan`` over fixed-shape batches,
  Adam (``optax.scale_by_adam`` with Keras eps=1e-7) scaled by an
  epoch-level LR (cosine annealing parity with the reference callback),
- Keras variable-last-batch semantics via zero-weight padding
  (see ``onestop_tpu.losses``),
- per-epoch shuffling with ``jax.random.permutation``,
- History dict + best-metric snapshots (the two ModelCheckpoints of
  ``holdout.py:1044-1047``), plus an optional AUC tracker mirroring
  ``RocCallback`` (``task2:706-741``).

Everything is functional: state in a flax struct, donated into the epoch
step, so the loop runs at device speed with no host round-trips beyond the
per-epoch metric fetch.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from onestop_tpu import losses as L
from onestop_tpu.config import TrainConfig
from onestop_tpu.metrics.classification import roc_auc
from onestop_tpu.train.schedules import schedule_from_config


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def _pad_batches(n: int, batch_size: int):
    """(n_batches, pad) so every epoch is a fixed (n_batches, batch_size) grid."""
    n_batches = -(-n // batch_size)
    return n_batches, n_batches * batch_size - n


def make_adam(cfg: TrainConfig):
    return optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps)


def _with_axis(fn: Callable, axis_name: str | None) -> Callable:
    """Bind axis_name into a loss/metric (all onestop losses support it).

    Under data parallelism a loss without collective reductions would
    silently optimize a *different* objective (the mean of shard-local
    losses) and report one arbitrary shard's value, so a callable that
    cannot take axis_name is an error on the DP path — not a degradation."""
    if axis_name is None:
        return fn
    import inspect

    try:
        if "axis_name" in inspect.signature(fn).parameters:
            return functools.partial(fn, axis_name=axis_name)
    except (TypeError, ValueError):  # builtins / partials without signatures
        pass
    raise ValueError(
        f"loss/metric {getattr(fn, '__name__', fn)!r} does not accept axis_name; "
        "data-parallel training requires psum-aware reductions (see "
        "onestop_tpu.losses for the pattern)")


class Trainer:
    """Fit a flax model the way the reference fits its Keras models."""

    def __init__(
        self,
        model,
        cfg: TrainConfig,
        loss: str | Callable | None = None,
        seg_metrics: bool = True,
        augment_cfg=None,
        augment_images_only: bool = False,
        mesh=None,
        dp_axis: str = "data",
        shard_data: bool = False,
    ):
        """augment_cfg: optional AugmentConfig — applies the on-device
        flip/affine pipeline (ops.augment) to every training batch: jointly
        with the target segmap by default, or image-only when
        augment_images_only (the classifier path — labels are not spatial).
        The reference builds this pipeline but never feeds it to training
        (SURVEY.md §8 Q7); here it is a usable option, off by default.

        mesh/dp_axis: data-parallel training over the mesh's ``dp_axis``
        (SURVEY.md §2.4/§5.8 — the reference is single-device; DP over ICI
        is the framework obligation). The per-step batch shards over
        ``dp_axis``; losses/metrics keep their batch-global semantics via
        psum-aware reductions, gradients are psum'd, and BatchNorm syncs its
        statistics across the axis — so training numerics match the
        single-device run (dropout masks are the one documented exception:
        each shard draws its own). Any other mesh axes replicate.

        shard_data (DP only): shard the TRAINING SET itself over ``dp_axis``
        (per-device memory = dataset/n_devices instead of a full replica —
        VERDICT r2 weak #5) and draw the per-epoch permutation on device
        within each shard, taking the host index upload off the epoch
        critical path. Batches mix batch_size/n_devices rows from every
        shard; the shuffle law is hierarchical (within-shard) rather than
        global — each batch is still a uniform draw of its shard rows, and
        the trajectory equals a single-device run fed the same hierarchical
        permutation (asserted in tests/test_parallel.py). Off by default:
        the replicated path reproduces the reference's global-shuffle law
        exactly."""
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.dp_axis = dp_axis
        self.shard_data = shard_data
        self.dp_size = 1
        if mesh is not None:
            self.dp_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(dp_axis, 1)
        if self.dp_size > 1 and cfg.batch_size % self.dp_size:
            raise ValueError(
                f"batch_size={cfg.batch_size} must divide evenly over the "
                f"'{dp_axis}' mesh axis (size {self.dp_size}) for data-parallel training")
        if self.dp_size > 1 and getattr(model, "bn_axis", None) is None and hasattr(model, "bn_axis"):
            self.model = model.clone(bn_axis=dp_axis)  # sync-BN over the DP axis
        loss = loss if loss is not None else cfg.loss
        self.loss_fn = L.LOSSES[loss] if isinstance(loss, str) else loss
        self.seg_metrics = seg_metrics  # dice for segmentation, f1 for classification
        self.augment_cfg = augment_cfg
        self.augment_images_only = augment_images_only
        self.tx = make_adam(cfg)
        self._build()

    # -- state ---------------------------------------------------------------

    def init_state(self, rng, input_shape) -> TrainState:
        variables = self.model.init(
            {"params": rng}, jnp.zeros((1,) + tuple(input_shape), jnp.float32), train=False
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    # -- jitted inner fns ------------------------------------------------------

    def _build(self):
        model, tx = self.model, self.tx
        dp = self.dp_axis if self.dp_size > 1 else None
        if getattr(self.cfg, "qat", False):
            # quantization-aware training: every forward (train, eval AND
            # predict — monitors must select the best QUANTIZED model) runs
            # with fake-quantized 3×3 convs; see train/qat.py
            from onestop_tpu.train.qat import qat_apply_model

            model = qat_apply_model(model)
        loss_fn = _with_axis(self.loss_fn, dp)
        metric_fn = _with_axis(L.dice_coeff if self.seg_metrics else L.f1_metric, dp)

        def gsum(x):
            return L._gsum(x, dp)

        def apply_train(params, batch_stats, xb, dropout_key):
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                xb, train=True, mutable=["batch_stats"], rngs={"dropout": dropout_key},
            )
            return out, mut["batch_stats"]

        augment_cfg = self.augment_cfg
        images_only = self.augment_images_only

        def make_train_step(x, y):
            def train_step(carry, xs):
                params, batch_stats, opt_state = carry
                idx, wb, key, lr = xs
                xb = x[idx]
                yb = y[idx]
                if augment_cfg is not None:
                    from onestop_tpu.ops.augment import augment_batch, augment_image_batch
                    akey, key = jax.random.split(key)
                    if dp is not None:  # distinct masks per shard
                        akey = jax.random.fold_in(akey, jax.lax.axis_index(dp))
                    if images_only:
                        xb = augment_image_batch(akey, xb[..., 0], augment_cfg)[..., None]
                    else:
                        ab, sb = augment_batch(akey, xb[..., 0], yb[..., 0], augment_cfg)
                        xb = ab[..., None]
                        yb = sb[..., None]

                # distinct dropout masks per shard (a shared key would give
                # every shard's batch rows the same masks — neither the
                # single-device pattern nor independent draws)
                dkey = jax.random.fold_in(key, jax.lax.axis_index(dp)) if dp else key

                def loss_of(p):
                    probs, new_bs = apply_train(p, batch_stats, xb, dkey)
                    l = loss_fn(yb, probs, weights=wb)
                    m = metric_fn(yb * L._broadcast(wb, yb.ndim), probs * L._broadcast(wb, probs.ndim))
                    return l, (new_bs, m)

                (l, (new_bs, m)), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
                if dp is not None:
                    # the collective loss is batch-global; under shard_map the
                    # transpose of the loss's psums is psum (cotangents arrive
                    # ×axis_size), so pmean — not psum — reconstructs the exact
                    # single-device gradient (verified in
                    # tests/test_parallel.py::test_dp_gradients_match_single_device)
                    grads = jax.lax.pmean(grads, dp)
                updates, new_opt = tx.update(grads, opt_state, params)
                updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
                params = optax.apply_updates(params, updates)
                return (params, new_bs, new_opt), (l, m, gsum(wb))
            return train_step

        def epoch_core(state: TrainState, x, y, idx_grid, w_grid, keys, lr):
            lrs = jnp.full((idx_grid.shape[0],), lr, jnp.float32)
            (params, batch_stats, opt_state), (ls, ms, ws) = jax.lax.scan(
                make_train_step(x, y),
                (state.params, state.batch_stats, state.opt_state),
                (idx_grid, w_grid, keys, lrs),
            )
            wsum = jnp.maximum(jnp.sum(ws), 1.0)
            loss = jnp.sum(ls * ws) / wsum       # Keras: batch-size-weighted mean
            metric = jnp.sum(ms * ws) / wsum
            return (
                TrainState(params=params, batch_stats=batch_stats,
                           opt_state=opt_state, step=state.step + idx_grid.shape[0]),
                loss, metric,
            )

        def eval_core(params, batch_stats, idx_grid, w_grid, x, y):
            def step(_, xs):
                idx, wb = xs
                probs = model.apply({"params": params, "batch_stats": batch_stats},
                                    x[idx], train=False)
                l = loss_fn(y[idx], probs, weights=wb)
                m = metric_fn(y[idx] * L._broadcast(wb, y[idx].ndim),
                              probs * L._broadcast(wb, probs.ndim))
                return None, (l, m, gsum(wb))
            _, (ls, ms, ws) = jax.lax.scan(step, None, (idx_grid, w_grid))
            wsum = jnp.maximum(jnp.sum(ws), 1.0)
            return jnp.sum(ls * ws) / wsum, jnp.sum(ms * ws) / wsum

        run_epoch = epoch_core
        self._epoch_sharded_fn = None
        if dp is not None:
            from jax.sharding import PartitionSpec as P
            repl = P()
            batch_sharded = P(None, dp)   # (steps, batch) grids: shard batch
            epoch_core = jax.shard_map(
                epoch_core, mesh=self.mesh,
                in_specs=(repl, repl, repl, batch_sharded, batch_sharded, repl, repl),
                out_specs=(repl, repl, repl),
                check_vma=False,
            )
            eval_core = jax.shard_map(
                eval_core, mesh=self.mesh,
                in_specs=(repl, repl, batch_sharded, batch_sharded, repl, repl),
                out_specs=(repl, repl),
                check_vma=False,
            )
            if self.shard_data:
                # sharded-dataset epoch: x/y/base-weights arrive as this
                # device's shard; the permutation is drawn ON DEVICE within
                # the shard (no host index upload), and each step's batch
                # takes batch_size/dp rows from every shard — run_epoch's
                # local shapes are identical to the replicated path's.
                bsl = self.cfg.batch_size // self.dp_size

                def epoch_sharded(state, x, y, w_base, ekey, lr):
                    s_local = x.shape[0]
                    steps = s_local // bsl
                    d = jax.lax.axis_index(dp)
                    perm = jax.random.permutation(
                        jax.random.fold_in(jax.random.fold_in(ekey, 2000), d),
                        s_local)
                    idx_grid = perm.reshape(steps, bsl)
                    w_grid = w_base[idx_grid]
                    keys = jax.random.split(jax.random.fold_in(ekey, 1), steps)
                    return run_epoch(state, x, y, idx_grid, w_grid, keys, lr)

                epoch_sharded = jax.shard_map(
                    epoch_sharded, mesh=self.mesh,
                    in_specs=(repl, P(dp), P(dp), P(dp), repl, repl),
                    out_specs=(repl, repl, repl),
                    check_vma=False,
                )
                self._epoch_sharded_fn = jax.jit(epoch_sharded, donate_argnums=(0,))

        epoch_fn = jax.jit(epoch_core, donate_argnums=(0,))
        eval_fn = jax.jit(eval_core)

        @functools.partial(jax.jit, static_argnames=("batch_size",))
        def predict_fn(params, batch_stats, x, batch_size=32):
            n = x.shape[0]
            n_batches, pad = _pad_batches(n, batch_size)
            xp = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
            xp = xp.reshape((n_batches, batch_size) + x.shape[1:])
            def step(_, xb):
                return None, model.apply({"params": params, "batch_stats": batch_stats},
                                         xb, train=False)
            _, out = jax.lax.scan(step, None, xp)
            return out.reshape((n_batches * batch_size,) + out.shape[2:])[:n]

        self._epoch_fn = epoch_fn
        self._eval_fn = eval_fn
        self._predict_fn = predict_fn

    # -- public API ------------------------------------------------------------

    def predict(self, state: TrainState, x) -> np.ndarray:
        return np.asarray(
            self._predict_fn(state.params, state.batch_stats, jnp.asarray(x),
                             batch_size=self.cfg.batch_size)
        )

    def evaluate(self, state: TrainState, x, y):
        idx, w = self._eval_grid(len(x))
        loss, metric = self._eval_fn(state.params, state.batch_stats, idx, w,
                                     jnp.asarray(x), jnp.asarray(y))
        return float(loss), float(metric)

    def _eval_grid(self, n):
        bs = self.cfg.batch_size
        n_batches, pad = _pad_batches(n, bs)
        idx = np.concatenate([np.arange(n), np.zeros(pad, np.int64)])
        w = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
        return (jnp.asarray(idx.reshape(n_batches, bs)),
                jnp.asarray(w.reshape(n_batches, bs)))

    def fit(
        self,
        state: TrainState,
        x_train, y_train,
        x_val=None, y_val=None,
        epochs: int | None = None,
        sample_weights=None,
        track_auc: bool = False,
        verbose: bool = False,
        checkpoint_path=None,
        checkpoint_every: int = 0,
        resume: bool = False,
        log_file=None,
        profile_dir=None,
    ):
        """Returns (final_state, history, best) where ``best`` maps monitor
        name -> dict(epoch, value, params, batch_stats).

        checkpoint_path/_every: periodic full-state checkpoints (crash
        recovery); resume=True restores from checkpoint_path if present.
        log_file: JSONL per-epoch structured log. profile_dir: jax.profiler
        trace of the first training epoch."""
        from onestop_tpu.train.checkpoint import load_train_state, save_train_state
        from onestop_tpu.train.profiling import JsonlLogger, StepTimer, trace

        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epochs
        lr_of = schedule_from_config(cfg)
        bs = cfg.batch_size
        n = len(x_train)
        n_batches, pad = _pad_batches(n, bs)
        base_w = np.ones(n, np.float32) if sample_weights is None else np.asarray(sample_weights, np.float32)

        use_sharded = self._epoch_sharded_fn is not None
        if use_sharded:
            # one sharded device_put of the padded train set: per-device
            # memory = dataset/dp_size; zero-weight pad rows land on the
            # last shard and never contribute
            from jax.sharding import NamedSharding, PartitionSpec as P

            def _put(a, spec):
                a = np.asarray(a)
                padded = np.concatenate(
                    [a, np.zeros((pad,) + a.shape[1:], a.dtype)]) if pad else a
                return jax.device_put(
                    padded, NamedSharding(self.mesh, spec))

            x_train = _put(x_train, P(self.dp_axis))
            y_train = _put(y_train, P(self.dp_axis))
            w_sharded = _put(base_w, P(self.dp_axis))
        else:
            x_train = jnp.asarray(x_train)
            y_train = jnp.asarray(y_train)
        has_val = x_val is not None
        if has_val:
            x_val = jnp.asarray(x_val)
            y_val = jnp.asarray(y_val)
            val_idx, val_w = self._eval_grid(len(x_val))

        history: dict[str, list] = {"loss": [], "metric": [], "lr": [],
                                    "epoch_seconds": []}
        if has_val:
            history["val_loss"] = []
            history["val_metric"] = []
        if track_auc:
            history["auc_train"] = []
            history["auc_val"] = []

        start_epoch = 0
        if resume and checkpoint_path is not None and __import__("pathlib").Path(checkpoint_path).exists():
            state, start_epoch, saved_hist = load_train_state(checkpoint_path, state)
            if saved_hist:
                for k in history:
                    history[k] = list(saved_hist.get(k, []))
        logger = JsonlLogger(log_file)
        timer = StepTimer()

        metric_name = "dice_coeff" if self.seg_metrics else "f1"
        # cfg.monitor drives the ModelCheckpoint monitors (ref holdout.py:1044-1047
        # monitors val_dice_coeff max + val_loss min; task2 adds best-val-AUC
        # via RocCallback, task2:731-734). "loss" monitors minimize, the rest
        # maximize — Keras ModelCheckpoint mode='min'/'max' semantics.
        monitors = {name: ("min" if "loss" in name else "max")
                    for name in self.cfg.monitor
                    if name != "val_auc" or track_auc}
        if track_auc:
            monitors.setdefault("val_auc", "max")
        # a monitor this run can never produce would otherwise silently
        # record no best snapshot (params=None after the whole training run)
        producible = {"val_loss", f"val_{metric_name}"} | ({"val_auc"} if track_auc else set())
        unknown = set(monitors) - producible
        if unknown:
            raise ValueError(
                f"cfg.monitor names {sorted(unknown)} are never produced by this "
                f"trainer (seg_metrics={self.seg_metrics}, track_auc={track_auc}); "
                f"valid monitors here: {sorted(producible)}")
        best = {k: {"value": -np.inf if m == "max" else np.inf, "epoch": -1,
                    "params": None, "batch_stats": None}
                for k, m in monitors.items()}

        root = jax.random.PRNGKey(cfg.shuffle_seed)
        for epoch in range(start_epoch, epochs):
            timer.start()
            ekey = jax.random.fold_in(root, epoch)
            lr = lr_of(epoch)

            with trace(profile_dir if epoch == start_epoch else None):
                if use_sharded:
                    # permutation drawn on device per shard; no host index grid
                    state, loss, metric = self._epoch_sharded_fn(
                        state, x_train, y_train, w_sharded, ekey, jnp.float32(lr))
                else:
                    perm = np.asarray(jax.random.permutation(ekey, n))
                    idx = np.concatenate([perm, np.zeros(pad, np.int64)]).reshape(n_batches, bs)
                    w = np.concatenate([base_w[perm], np.zeros(pad, np.float32)]).reshape(n_batches, bs)
                    keys = jax.random.split(jax.random.fold_in(ekey, 1), n_batches)
                    state, loss, metric = self._epoch_fn(
                        state, x_train, y_train, jnp.asarray(idx), jnp.asarray(w), keys, jnp.float32(lr)
                    )
            history["loss"].append(float(loss))
            history["metric"].append(float(metric))
            history["lr"].append(lr)

            epoch_vals = {}
            if has_val:
                vl, vm = self._eval_fn(state.params, state.batch_stats,
                                       val_idx, val_w, x_val, y_val)
                history["val_loss"].append(float(vl))
                history["val_metric"].append(float(vm))
                epoch_vals["val_loss"] = float(vl)
                epoch_vals[f"val_{metric_name}"] = float(vm)
            if track_auc and has_val:
                # [:n] drops the zero-pad rows the sharded path appends
                pt = self.predict(state, x_train)[:n]
                pv = self.predict(state, x_val)
                a_tr = float(roc_auc(y_train[:n], jnp.asarray(pt)))
                a_va = float(roc_auc(y_val, jnp.asarray(pv)))
                history["auc_train"].append(a_tr)
                history["auc_val"].append(a_va)
                epoch_vals["val_auc"] = a_va

            snapshot = None
            for name, mode in monitors.items():
                if name not in epoch_vals:
                    continue
                v = epoch_vals[name]
                better = v > best[name]["value"] if mode == "max" else v < best[name]["value"]
                if better:
                    if snapshot is None:
                        # device-side copy, NOT device_get: fetching the full
                        # parameter tree to host every improving epoch costs
                        # ~300 ms through this session's tunnel (and real
                        # PCIe time anywhere); a copy also stays valid after
                        # epoch_fn donates the state's buffers next epoch
                        snapshot = (
                            jax.tree_util.tree_map(jnp.array, state.params),
                            jax.tree_util.tree_map(jnp.array, state.batch_stats),
                        )
                    best[name] = {
                        "value": v, "epoch": epoch,
                        "params": snapshot[0], "batch_stats": snapshot[1],
                    }
            history["epoch_seconds"].append(timer.stop())
            logger.log({"epoch": epoch, "lr": lr,
                        "loss": history["loss"][-1],
                        metric_name: history["metric"][-1],
                        **({"val_loss": epoch_vals.get("val_loss"),
                            f"val_{metric_name}": epoch_vals.get(f"val_{metric_name}")}
                           if has_val else {}),
                        "seconds": history["epoch_seconds"][-1]})
            if checkpoint_path is not None and checkpoint_every and \
                    (epoch + 1) % checkpoint_every == 0:
                save_train_state(checkpoint_path, state, epoch, history)
            if verbose:
                msg = f"epoch {epoch + 1}/{epochs} loss={history['loss'][-1]:.4f} {metric_name}={history['metric'][-1]:.4f}"
                if has_val:
                    msg += f" val_loss={history['val_loss'][-1]:.4f} val_{metric_name}={history['val_metric'][-1]:.4f}"
                print(msg)

        return state, history, best
