"""Fold-parallel cross-validation.

The reference's K-fold loop trains folds *sequentially* and, by reusing one
Keras model object, leaks fold N-1's weights into fold N
(``task1_crossval_3folds_unet.py:1005-1046``; SURVEY.md §8 Q5). Here every
fold is a slot on the mesh 'fold' axis:

- per-fold parameters/optimizer state are stacked on a leading fold axis and
  sharded over the mesh ('fold'),
- the training data lives replicated; each fold gathers its own permuted
  batch indices, so folds with different train sizes are rectangularized
  with zero-weight padding,
- unequal per-fold epoch budgets (3-fold trains 80/20/20 — SURVEY.md §8 Q9)
  are handled with an ``active`` mask: inactive folds compute but discard
  updates (no-op steps), keeping every device in lockstep,
- weight leakage is *fixed*: every fold starts from a fresh init
  (identical init across folds by default for comparability).

All cross-fold independence is expressed to XLA purely through shardings;
no hand-written collectives are needed on this axis.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from onestop_tpu import losses as L
from onestop_tpu.config import TrainConfig
from onestop_tpu.train.schedules import schedule_from_config
from onestop_tpu.train.trainer import TrainState, make_adam, _pad_batches
from onestop_tpu.parallel.mesh import fold_pspec


class FoldParallelTrainer:
    """vmapped-over-folds version of ``train.Trainer``."""

    def __init__(self, model, cfg: TrainConfig, n_folds: int, loss: str | Callable | None = None,
                 mesh=None, remat: bool = True, shard_data: bool = False,
                 augment_cfg=None):
        """augment_cfg: optional AugmentConfig — on-device joint flip/affine
        augmentation of every training batch, per fold (same per-batch law as
        ``train.Trainer(augment_cfg=...)``; each fold draws its own keys).
        The reference's CV scripts build the aug pipeline but never train on
        it (SURVEY.md §8 Q7).

        shard_data (mesh only): store each fold's train set stacked and
        sharded over ('fold', 'data') instead of replicating the full dataset
        to every device (VERDICT r2 weak #5) — per-device train memory =
        max_fold_train/dp_size, val memory = that fold's val set; per-epoch
        permutations are drawn on device within each shard (hierarchical
        shuffle, same law as Trainer(shard_data=True)). Off by default: the
        replicated path keeps the reference's global-shuffle law."""
        self.model = model
        self.cfg = cfg
        self.n_folds = n_folds
        self.mesh = mesh
        self.shard_data = shard_data and mesh is not None
        self.remat = remat  # rematerialize fold forward passes: n_folds
        # models' activations live simultaneously per device group, so trade
        # FLOPs for HBM (jax.checkpoint) by default
        # data parallelism inside a fold: each fold group's devices shard the
        # per-step batch over 'data' and pmean/psum keep replicas exact
        # (SURVEY.md §2.4: "pmean for DP gradient reduction inside a fold")
        self.dp_size = 1
        self.fold_size = 1
        if mesh is not None:
            axes = dict(zip(mesh.axis_names, mesh.devices.shape))
            self.dp_size = axes.get("data", 1)
            self.fold_size = axes.get("fold", 1)
        if self.shard_data and n_folds % self.fold_size:
            raise ValueError(
                f"n_folds={n_folds} must divide over the 'fold' mesh axis "
                f"(size {self.fold_size}) for sharded fold data")
        if self.dp_size > 1:
            if cfg.batch_size % self.dp_size:
                raise ValueError(
                    f"batch_size={cfg.batch_size} must divide evenly over the "
                    f"'data' mesh axis (size {self.dp_size})")
            if getattr(model, "bn_axis", None) is None and hasattr(model, "bn_axis"):
                self.model = model.clone(bn_axis="data")  # sync-BN inside a fold
        loss = loss if loss is not None else cfg.loss
        self.loss_fn = L.LOSSES[loss] if isinstance(loss, str) else loss
        self.augment_cfg = augment_cfg
        self.tx = make_adam(cfg)
        self._build()

    def init_states(self, rng, input_shape, same_init: bool = True) -> TrainState:
        """Fold-stacked TrainState. same_init=True gives every fold the same
        fresh initialization (fixes reference weight leakage while keeping
        folds comparable); False uses per-fold seeds."""
        def one(key):
            variables = self.model.init(
                {"params": key}, jnp.zeros((1,) + tuple(input_shape), jnp.float32), train=False
            )
            params = variables["params"]
            return TrainState(
                params=params,
                batch_stats=variables.get("batch_stats", {}),
                opt_state=self.tx.init(params),
                step=jnp.zeros((), jnp.int32),
            )

        keys = (jnp.stack([rng] * self.n_folds)
                if same_init else jax.random.split(rng, self.n_folds))
        states = jax.vmap(one)(keys)
        if self.mesh is not None:
            states = jax.tree_util.tree_map(
                lambda a: jax.device_put(
                    a, NamedSharding(self.mesh, fold_pspec(a.ndim))
                ),
                states,
            )
        return states

    def _build(self):
        model, tx = self.model, self.tx
        if getattr(self.cfg, "qat", False):
            # quantization-aware training inside the fold-parallel programs:
            # same hook as train.Trainer (see train/qat.py) so '--qat' on the
            # CV runners trains/evaluates/predicts fake-quantized too
            from onestop_tpu.train.qat import qat_apply_model

            model = qat_apply_model(model)
        self._apply_model = model  # what predict_fold must forward through
        dp = "data" if self.dp_size > 1 else None
        augment_cfg = self.augment_cfg
        from onestop_tpu.train.trainer import _with_axis
        loss_fn = _with_axis(self.loss_fn, dp)
        metric_fn = _with_axis(L.dice_coeff, dp)

        def gsum(x):
            return L._gsum(x, dp)

        def forward(pp, bs_, xb, key):
            return model.apply(
                {"params": pp, "batch_stats": bs_}, xb, train=True,
                mutable=["batch_stats"], rngs={"dropout": key},
            )

        if self.remat:
            forward = jax.checkpoint(forward)

        def fold_epoch(params, batch_stats, opt_state, x, y, idx_grid, w_grid, keys, lr, active):
            """One fold's epoch: scan over steps. active gates the update."""

            def step(carry, xs):
                p, bs_, opt = carry
                idx, wb, key = xs
                xb = x[idx]
                yb = y[idx]
                if augment_cfg is not None:
                    from onestop_tpu.ops.augment import augment_batch
                    akey, key = jax.random.split(key)
                    if dp is not None:  # distinct warps per batch shard
                        akey = jax.random.fold_in(akey, jax.lax.axis_index(dp))
                    ab, sb = augment_batch(akey, xb[..., 0], yb[..., 0],
                                           augment_cfg)
                    xb = ab[..., None]
                    yb = sb[..., None]
                if dp is not None:  # distinct dropout masks per batch shard
                    key = jax.random.fold_in(key, jax.lax.axis_index(dp))

                def loss_of(pp):
                    probs, mut = forward(pp, bs_, xb, key)
                    l = loss_fn(yb, probs, weights=wb)
                    m = metric_fn(yb * L._broadcast(wb, yb.ndim),
                                  probs * L._broadcast(wb, probs.ndim))
                    return l, (mut["batch_stats"], m)

                (l, (new_bs, m)), grads = jax.value_and_grad(loss_of, has_aux=True)(p)
                if dp is not None:
                    # loss is batch-global (psum-aware reductions); shard_map
                    # transposes those psums as psum (cotangents ×axis_size),
                    # so pmean over the intra-fold 'data' axis reconstructs
                    # the exact full-batch gradient (SURVEY.md §2.4: "pmean
                    # for DP gradient reduction inside a fold")
                    grads = jax.lax.pmean(grads, dp)
                updates, new_opt = tx.update(grads, opt, p)
                updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
                new_p = optax.apply_updates(p, updates)
                sel = lambda n, o: jnp.where(active, n, o)
                p = jax.tree_util.tree_map(sel, new_p, p)
                bs_ = jax.tree_util.tree_map(sel, new_bs, bs_)
                opt = jax.tree_util.tree_map(sel, new_opt, opt)
                return (p, bs_, opt), (l, m, gsum(wb))

            (params, batch_stats, opt_state), (ls, ms, ws) = jax.lax.scan(
                step, (params, batch_stats, opt_state), (idx_grid, w_grid, keys)
            )
            wsum = jnp.maximum(jnp.sum(ws), 1.0)
            return params, batch_stats, opt_state, jnp.sum(ls * ws) / wsum, jnp.sum(ms * ws) / wsum

        def epoch_core(states: TrainState, x, y, idx, w, keys, lr, active):
            params, batch_stats, opt_state, loss, dice = jax.vmap(
                fold_epoch, in_axes=(0, 0, 0, None, None, 0, 0, 0, None, 0)
            )(states.params, states.batch_stats, states.opt_state,
              x, y, idx, w, keys, lr, active)
            return (
                TrainState(params=params, batch_stats=batch_stats,
                           opt_state=opt_state, step=states.step + idx.shape[1]),
                loss, dice,
            )

        if self.mesh is not None:
            # shard_map over the (fold, data) mesh: each device group compiles
            # a plain (ungrouped) conv for its local folds, and the per-step
            # batch axis of the index/weight grids shards over 'data' so the
            # devices inside a fold group split the batch (real DP — the
            # collectives above stitch it back). A bare vmap+jit would lower
            # fold-stacked convs to feature_group convolutions, which GSPMD
            # cannot partition on the group dimension.
            fold = P("fold")
            grid = P("fold", None, "data")   # (folds, steps, batch)
            repl = P()
            epoch_core = jax.shard_map(
                epoch_core, mesh=self.mesh,
                in_specs=(fold, repl, repl, grid, grid, fold, repl, fold),
                out_specs=(fold, fold, fold),
                check_vma=False,
            )

        def fold_eval(params, batch_stats, x, y, idx_grid, w_grid):
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

        def eval_core(states: TrainState, x, y, idx, w):
            return jax.vmap(fold_eval, in_axes=(0, 0, None, None, 0, 0))(
                states.params, states.batch_stats, x, y, idx, w
            )

        if self.mesh is not None:
            fold = P("fold")
            grid = P("fold", None, "data")
            repl = P()
            eval_core = jax.shard_map(
                eval_core, mesh=self.mesh,
                in_specs=(fold, repl, repl, grid, grid),
                out_specs=(fold, fold),
                check_vma=False,
            )

        self._epoch_sharded_fn = None
        self._eval_sharded_fn = None
        if self.shard_data:
            # stacked-and-sharded fold data: x_tr (F, T, ...) over
            # ('fold', 'data'); each device holds its fold group's shard and
            # draws the within-shard permutation on device. Local per-step
            # shapes match the replicated path exactly, so fold_epoch/
            # fold_eval are reused untouched.
            bsl = self.cfg.batch_size // self.dp_size
            fold = P("fold")
            fdata = P("fold", "data")
            grid = P("fold", None, "data")
            repl = P()

            def epoch_core_sharded(states, x_tr, y_tr, w_tr, ekey, lr, active):
                f_local, t_local = x_tr.shape[0], x_tr.shape[1]
                steps = t_local // bsl
                f0 = jax.lax.axis_index("fold") * f_local
                dix = jax.lax.axis_index(dp) if dp is not None else 0

                def one_fold(fold_i, p, bs_, opt, xf, yf, wf, act):
                    fg = f0 + fold_i
                    pkey = jax.random.fold_in(
                        jax.random.fold_in(jax.random.fold_in(ekey, 2000), fg), dix)
                    perm = jax.random.permutation(pkey, t_local)
                    idx = perm.reshape(steps, bsl)
                    keys = jax.random.split(
                        jax.random.fold_in(ekey, 1000 + fg), steps)
                    return fold_epoch(p, bs_, opt, xf, yf, idx, wf[idx], keys, lr, act)

                params, batch_stats, opt_state, loss, dice = jax.vmap(
                    one_fold, in_axes=(0, 0, 0, 0, 0, 0, 0, 0)
                )(jnp.arange(f_local), states.params, states.batch_stats,
                  states.opt_state, x_tr, y_tr, w_tr, active)
                return (
                    TrainState(params=params, batch_stats=batch_stats,
                               opt_state=opt_state,
                               step=states.step + t_local // bsl),
                    loss, dice,
                )

            epoch_core_sharded = jax.shard_map(
                epoch_core_sharded, mesh=self.mesh,
                in_specs=(fold, fdata, fdata, fdata, repl, repl, fold),
                out_specs=(fold, fold, fold),
                check_vma=False,
            )
            self._epoch_sharded_fn = jax.jit(epoch_core_sharded, donate_argnums=(0,))

            def eval_core_sharded(states, x_va, y_va, idx, w):
                return jax.vmap(fold_eval, in_axes=(0, 0, 0, 0, 0, 0))(
                    states.params, states.batch_stats, x_va, y_va, idx, w)

            eval_core_sharded = jax.shard_map(
                eval_core_sharded, mesh=self.mesh,
                in_specs=(fold, fold, fold, grid, grid),
                out_specs=(fold, fold),
                check_vma=False,
            )
            self._eval_sharded_fn = jax.jit(eval_core_sharded)

        self._epoch_fn = jax.jit(epoch_core, donate_argnums=(0,))
        self._eval_fn = jax.jit(eval_core)

    # ------------------------------------------------------------------

    @staticmethod
    def _rectangular_grids(fold_indices, batch_size):
        """Pad each fold's index list to a common (steps, batch) grid with
        zero-weight slots."""
        max_n = max(len(ix) for ix in fold_indices)
        steps, _ = _pad_batches(max_n, batch_size)
        total = steps * batch_size
        idx = np.zeros((len(fold_indices), steps, batch_size), np.int64)
        w = np.zeros((len(fold_indices), steps, batch_size), np.float32)
        for f, ix in enumerate(fold_indices):
            ix = np.asarray(ix)
            pad = total - len(ix)
            flat = np.concatenate([ix, np.zeros(pad, np.int64)])
            idx[f] = flat.reshape(steps, batch_size)
            w[f] = np.concatenate([np.ones(len(ix), np.float32),
                                   np.zeros(pad, np.float32)]).reshape(steps, batch_size)
        return jnp.asarray(idx), jnp.asarray(w)

    def _stack_fold_data(self, x, y, folds):
        """Per-fold train/val arrays stacked on a leading fold axis and
        device_put sharded: train over ('fold', 'data'), val over 'fold' —
        no device ever holds the full dataset. Val index grids are LOCAL row
        positions, so eval batch composition matches the replicated path."""
        from jax.sharding import NamedSharding

        B = self.cfg.batch_size
        x_np, y_np = np.asarray(x), np.asarray(y)
        tr_lists = [np.asarray(t) for t, _ in folds]
        va_lists = [np.asarray(v) for _, v in folds]
        F = len(folds)
        steps, _ = _pad_batches(max(len(t) for t in tr_lists), B)
        T = steps * B
        x_tr = np.zeros((F, T) + x_np.shape[1:], x_np.dtype)
        y_tr = np.zeros((F, T) + y_np.shape[1:], y_np.dtype)
        w_tr = np.zeros((F, T), np.float32)
        for f, t in enumerate(tr_lists):
            x_tr[f, :len(t)] = x_np[t]
            y_tr[f, :len(t)] = y_np[t]
            w_tr[f, :len(t)] = 1.0
        v_max = max(len(v) for v in va_lists)
        x_va = np.zeros((F, v_max) + x_np.shape[1:], x_np.dtype)
        y_va = np.zeros((F, v_max) + y_np.shape[1:], y_np.dtype)
        for f, v in enumerate(va_lists):
            x_va[f, :len(v)] = x_np[v]
            y_va[f, :len(v)] = y_np[v]
        val_idx, val_w = self._rectangular_grids(
            [np.arange(len(v)) for v in va_lists], B)

        def put(a, spec):
            return jax.device_put(a, NamedSharding(self.mesh, spec))

        return (put(x_tr, P("fold", "data")), put(y_tr, P("fold", "data")),
                put(w_tr, P("fold", "data")), put(x_va, P("fold")),
                put(y_va, P("fold")), val_idx, val_w)

    def fit(self, states: TrainState, x, y, folds, epochs_per_fold=None, verbose=False):
        """Train all folds in parallel.

        folds: list of (train_idx, val_idx). epochs_per_fold: per-fold epoch
        budget (default cfg.epochs for all). Returns (states, history, best)
        where history arrays have shape (epochs, n_folds) and best tracks the
        max-val-dice snapshot per fold."""
        cfg = self.cfg
        F = self.n_folds
        assert len(folds) == F
        budgets = list(epochs_per_fold or [cfg.epochs] * F)
        total_epochs = max(budgets)
        lr_of = schedule_from_config(cfg)

        if self.shard_data:
            (x_tr_d, y_tr_d, w_tr_d, x_va_d, y_va_d,
             val_idx, val_w) = self._stack_fold_data(x, y, folds)
        else:
            x = jnp.asarray(x)
            y = jnp.asarray(y)
            val_idx, val_w = self._rectangular_grids([v for _, v in folds], cfg.batch_size)

        hist = {k: [] for k in ("loss", "dice", "val_loss", "val_dice", "lr")}
        best = [{"value": -np.inf, "epoch": -1, "params": None, "batch_stats": None}
                for _ in range(F)]
        root = jax.random.PRNGKey(cfg.shuffle_seed)

        for epoch in range(total_epochs):
            ekey = jax.random.fold_in(root, epoch)
            active = jnp.asarray([epoch < b for b in budgets])
            lr = jnp.float32(lr_of(epoch))

            if self.shard_data:
                # permutations drawn on device within each shard
                states, loss, dice = self._epoch_sharded_fn(
                    states, x_tr_d, y_tr_d, w_tr_d, ekey, lr, active)
                vl, vd = self._eval_sharded_fn(states, x_va_d, y_va_d,
                                               val_idx, val_w)
            else:
                perms = []
                for f, (tr, _) in enumerate(folds):
                    fkey = jax.random.fold_in(ekey, f)
                    perms.append(np.asarray(jax.random.permutation(fkey, len(tr))))
                shuffled = [np.asarray(tr)[perms[f]] for f, (tr, _) in enumerate(folds)]
                idx, w = self._rectangular_grids(shuffled, cfg.batch_size)
                steps = idx.shape[1]
                keys = jnp.stack([
                    jax.random.split(jax.random.fold_in(ekey, 1000 + f), steps)
                    for f in range(F)
                ])
                states, loss, dice = self._epoch_fn(states, x, y, idx, w, keys, lr, active)
                vl, vd = self._eval_fn(states, x, y, val_idx, val_w)
            loss, dice, vl, vd = (np.asarray(a) for a in (loss, dice, vl, vd))
            hist["loss"].append(loss)
            hist["dice"].append(dice)
            hist["val_loss"].append(vl)
            hist["val_dice"].append(vd)
            hist["lr"].append(float(lr))

            for f in range(F):
                if epoch < budgets[f] and vd[f] > best[f]["value"]:
                    # device-side slice+copy of this fold's weights only —
                    # no host fetch per improving epoch (the tunnel charges
                    # ~300 ms per full-tree device_get), and the copy stays
                    # valid after next epoch donates the states' buffers
                    best[f] = {
                        "value": float(vd[f]), "epoch": epoch,
                        "params": jax.tree_util.tree_map(
                            lambda a: jnp.array(a[f]), states.params),
                        "batch_stats": jax.tree_util.tree_map(
                            lambda a: jnp.array(a[f]), states.batch_stats),
                    }
            if verbose:
                print(f"epoch {epoch + 1}/{total_epochs} "
                      f"val_dice={np.array2string(vd, precision=4)} active={np.asarray(active)}")

        hist = {k: np.asarray(v) for k, v in hist.items()}
        return states, hist, best

    def predict_fold(self, fold_params, fold_batch_stats, x, batch_size=None) -> np.ndarray:
        bs = batch_size or self.cfg.batch_size
        n = len(x)
        steps, pad = _pad_batches(n, bs)
        xp = jnp.concatenate([jnp.asarray(x), jnp.zeros((pad,) + x.shape[1:], jnp.float32)])
        xp = xp.reshape((steps, bs) + x.shape[1:])
        def step(_, xb):
            return None, self._apply_model.apply(
                {"params": fold_params, "batch_stats": fold_batch_stats}, xb, train=False)
        _, out = jax.lax.scan(step, None, xp)
        return np.asarray(out.reshape((steps * bs,) + out.shape[2:])[:n])


def sequential_cross_validate(model, cfg: TrainConfig, x, y, folds,
                              epochs_per_fold=None, carry_weights=True,
                              verbose=False, augment_cfg=None):
    """Reference-parity sequential CV (``task1_crossval_3folds_unet.py:1005-1046``):
    folds train one after another on a single model. With
    ``carry_weights=True`` (the reference's actual behavior, SURVEY.md §8
    Q5), fold N starts from fold N-1's trained weights with a fresh Adam —
    this is what makes the reference's 20-epoch folds reach its published
    mean-fold numbers. The parallel ``cross_validate`` trains each fold from
    a fresh init instead (unbiased); this mode exists for behavior parity.

    Returns (trainer, final_state, histories, best) like cross_validate,
    with histories as a list of per-fold History dicts."""
    from onestop_tpu.train.trainer import Trainer

    budgets = list(epochs_per_fold or [cfg.epochs] * len(folds))
    trainer = Trainer(model, cfg, augment_cfg=augment_cfg)
    rng = jax.random.PRNGKey(cfg.init_seed)
    state = trainer.init_state(rng, x.shape[1:])
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    hists, best = [], []
    for f, (tr_idx, va_idx) in enumerate(folds):
        if f > 0:
            if carry_weights:
                # recompile semantics: fresh optimizer, carried weights
                state = state.replace(opt_state=trainer.tx.init(state.params),
                                      step=jnp.zeros((), jnp.int32))
            else:
                state = trainer.init_state(jax.random.PRNGKey(cfg.init_seed), x.shape[1:])
        state, hist, b = trainer.fit(state, x[jnp.asarray(tr_idx)], y[jnp.asarray(tr_idx)],
                                     x[jnp.asarray(va_idx)], y[jnp.asarray(va_idx)],
                                     epochs=budgets[f], verbose=verbose)
        hists.append(hist)
        snap = b["val_dice_coeff"]
        best.append({"value": snap["value"], "epoch": snap["epoch"],
                     "params": snap["params"], "batch_stats": snap["batch_stats"]})
    return trainer, state, hists, best


def cross_validate(model, cfg: TrainConfig, x, y, folds, mesh=None,
                   epochs_per_fold=None, init_rng=None, verbose=False,
                   shard_data=False, augment_cfg=None):
    """Convenience wrapper: fold-parallel training + per-fold best snapshots.

    With a mesh, the fold count is padded to a multiple of the mesh's fold
    axis with zero-epoch dummy folds (shard_map needs an even split); padded
    history/best entries are dropped before returning."""
    F = len(folds)
    budgets = list(epochs_per_fold or [cfg.epochs] * F)
    folds = list(folds)
    if mesh is not None:
        fold_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get("fold", 1)
        while len(folds) % fold_size:
            folds.append(folds[0])
            budgets.append(0)
    tr = FoldParallelTrainer(model, cfg, n_folds=len(folds), mesh=mesh,
                             shard_data=shard_data, augment_cfg=augment_cfg)
    rng = init_rng if init_rng is not None else jax.random.PRNGKey(cfg.init_seed)
    states = tr.init_states(rng, x.shape[1:])
    states, hist, best = tr.fit(states, x, y, folds,
                                epochs_per_fold=budgets, verbose=verbose)
    hist = {k: (v[:, :F] if getattr(v, "ndim", 1) == 2 else v) for k, v in hist.items()}
    return tr, states, hist, best[:F]
