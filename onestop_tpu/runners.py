"""The six public runner entry points, names matching the reference scripts
(SURVEY.md §9 capability contract; one runner per script, ref ``app.py:7-57``):

- ``holdout_runner_unet_infection_segmentation``   (task1_preprocessing_plus_unet)
- ``three_fold_runner_unet_infection_segmentation`` (task1_crossval_3folds_unet)
- ``four_fold_runner_unet_infection_segmentation``  (task1_crossval_4folds_unet)
- ``holdout_runner_unetplusplus_infection_segmentation`` (task1_unet_plus_plus)
- ``runner_classification``                          (task2_covid19_classifcation)
- ``runner_lung_segmentation``                       (task3_lung_segmentation_unet)

Each accepts:
  data       — optional preassembled (x, y) arrays (skips ingestion),
  data_dir   — directory with the Kaggle covid19-ct-scans layout
               (metadata.csv + ct_scans/lung_mask/infection_mask .nii files),
  out_dir    — artifact directory (checkpoints, reports, figures),
  small_run  — tiny synthetic config for smoke tests / CPU,
  mesh       — optional jax Mesh for fold-parallel CV / sharded training.

Unlike the reference (one 1,500-line notebook function per task, ~85%
copy-pasted), the runners are thin orchestration over the shared library.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from onestop_tpu import config as C
from onestop_tpu import losses as L
from onestop_tpu.data import (
    build_classification_dataset,
    build_lung_dataset,
    build_segmentation_dataset,
    kfold_indices,
    load_slices,
    stratified_shuffle_split_indices,
    synthetic_dataset,
    train_test_split_indices,
)
from onestop_tpu.metrics.classification import classification_report, roc_curve_points
from onestop_tpu.metrics.segmentation import grid, sweep_report, threshold_sweep
from onestop_tpu.models import ClassifierCNN, UNet, UNetPP
from onestop_tpu.train import Trainer, save_checkpoint
from onestop_tpu.train.checkpoint import metric_stamped_name
from onestop_tpu.parallel.cv import cross_validate


# ---------------------------------------------------------------------------
# data acquisition
# ---------------------------------------------------------------------------

def _case_slice_triples(data_dir=None, cfg=None, n_synthetic=4, synth_hw=160,
                        synth_slices=16, seed=0, with_infection=True,
                        infected_fraction=0.9, infection_z_band=None):
    """Yield (ct, lung[, infection]) slice stacks per case.

    data_dir: Kaggle layout — metadata.csv with ct_scan/lung_mask/
    infection_mask columns (ref ``holdout.py:135-137``). Falls back to
    synthetic phantoms when absent (no network in this environment);
    infected_fraction tunes the phantom class balance (classification
    experiments want more clean cases than the segmentation default)."""
    cfg = cfg or C.PreprocessConfig()
    if data_dir is not None:
        from onestop_tpu.data.acquire import load_metadata
        from onestop_tpu.data.native import load_fdata_any

        for row in load_metadata(data_dir):
            def _vol(col):
                # native C++ threaded loader when built; Python reader else
                return load_slices(load_fdata_any(row[col]), cfg.img_size,
                                   cfg.slice_lo, cfg.slice_hi)
            if with_infection:
                yield (_vol("ct_scan"), _vol("lung_mask"), _vol("infection_mask"))
            else:
                yield (_vol("ct_scan"), _vol("lung_mask"))
    else:
        for case in synthetic_dataset(n_cases=n_synthetic, hw=synth_hw,
                                      n_slices=synth_slices, seed=seed,
                                      infected_fraction=infected_fraction,
                                      infection_z_band=infection_z_band):
            ct = load_slices(case.ct, cfg.img_size, cfg.slice_lo, cfg.slice_hi)
            lung = load_slices(case.lung_mask, cfg.img_size, cfg.slice_lo, cfg.slice_hi)
            if with_infection:
                inf = load_slices(case.infection_mask, cfg.img_size,
                                  cfg.slice_lo, cfg.slice_hi)
                yield (ct, lung, inf)
            else:
                yield (ct, lung)


INT8_GATE_NOTE = (
    "checkpoint trained WITHOUT qat: int8 serving quality is a "
    "per-checkpoint lottery (round-4 same-law A/B: the plain twin loses "
    "0.025 chained dice under int8, the QAT twin none — "
    "artifacts_tpu/round4_qat*.json). Before serving it --int8/mixed, gate "
    "it with scripts/quality_int8.py, or retrain with --qat.")


def _small(task_cfg: C.TaskConfig, epochs: int) -> C.TaskConfig:
    """Shrink a task config for smoke runs."""
    return dataclasses.replace(
        task_cfg,
        preprocess=dataclasses.replace(task_cfg.preprocess, img_size=128, new_dim=64),
        model=dataclasses.replace(task_cfg.model, in_size=64,
                                  unet_widths=(8, 16), unet_bridge=32,
                                  unetpp_widths=(8, 16, 32, 64),
                                  cls_widths=(4, 8, 16), cls_dense=8),
        train=dataclasses.replace(task_cfg.train, epochs=epochs, batch_size=8),
    )


def _pop_qat(task_cfg: C.TaskConfig, kw) -> C.TaskConfig:
    """Every runner accepts ``qat=True``: quantization-aware training
    (train/qat.py) so the produced checkpoint is robust to the int8 serving
    path — int8 sensitivity is per-checkpoint (RESULTS.md round-3 item 11)."""
    if kw.pop("qat", False):
        task_cfg = dataclasses.replace(
            task_cfg, train=dataclasses.replace(task_cfg.train, qat=True))
    return task_cfg


def _out(out_dir) -> Path:
    p = Path(out_dir if out_dir is not None else "artifacts")
    p.mkdir(parents=True, exist_ok=True)
    return p


def _source_key(data_dir, kw) -> str:
    """Identity of the data source for the cache key: the dataset directory,
    or the synthetic-phantom generation knobs (with their defaults resolved
    so kwargs-vs-defaults spellings hash alike)."""
    if data_dir is not None:
        return f"dir:{data_dir}"
    return ("synthetic:n={n_synthetic},hw={synth_hw},s={synth_slices},"
            "seed={seed},inf={inf},zband={zband}").format(
        n_synthetic=kw.get("n_synthetic", 4), synth_hw=kw.get("synth_hw", 160),
        synth_slices=kw.get("synth_slices", 16), seed=kw.get("seed", 0),
        inf=kw.get("infected_fraction", 0.9),
        zband=kw.get("infection_z_band", None))


def _maybe_cached(build_fn, cache_dir, task_name: str, pre_cfg, names,
                  source_key: str = ""):
    """Build-or-load the preprocessed arrays — the reference's joblib pickle
    reload flow (dumps at holdout.py:648-666, reload
    task1_crossval_3folds_unet.py:690-692). Keyed on (task, preprocess-config,
    data-source) so neither a config change nor a different dataset ever
    serves stale arrays."""
    if cache_dir is None:
        return build_fn()
    import hashlib

    from onestop_tpu.data.cache import cached_dataset

    h = hashlib.md5((repr(pre_cfg) + "|" + source_key).encode()).hexdigest()[:10]
    return cached_dataset(build_fn, Path(cache_dir) / f"{task_name}_{h}", names)


def _concat_augmented(x, y, aug_cfg, seed: int, images_only: bool = False):
    """Materialize aug_cfg.n_samples augmented samples and append them to the
    training arrays — the train-set merge the reference computes but leaves
    commented out (holdout.py:615-619; SURVEY.md §8 Q7). For the classifier
    (images_only), labels are carried by index, fixing the reference's
    independent-shuffle correspondence bug (task2:615-619, §8 Q6)."""
    from onestop_tpu.ops.augment import sample_and_augment

    key = jax.random.PRNGKey(seed)
    if images_only:
        idx, ax = sample_and_augment(key, jnp.asarray(x[..., 0]), None, aug_cfg)
        idx = np.asarray(idx)
        return (np.concatenate([x, np.asarray(ax)[..., None]]),
                np.concatenate([y, y[idx]]))
    idx, ax, ay = sample_and_augment(key, jnp.asarray(x[..., 0]),
                                     jnp.asarray(y[..., 0]), aug_cfg)
    return (np.concatenate([x, np.asarray(ax)[..., None]]),
            np.concatenate([y, np.asarray(ay)[..., None]]))


def _save_json(path: Path, obj):
    def clean(o):
        if isinstance(o, dict):
            return {str(k): clean(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [clean(v) for v in o]
        if isinstance(o, (np.floating, np.integer)):
            return o.item()
        if isinstance(o, np.ndarray):
            return o.tolist()
        return o
    path.write_text(json.dumps(clean(obj), indent=2))


# ---------------------------------------------------------------------------
# figures (the reference's L9 layer is part of every run: plots at every
# stage — holdout.py:719-756, 1108-1163; CV galleries task1_crossval_3folds:
# 1322-1363; task2 report plots task2:919-989)
# ---------------------------------------------------------------------------

def _holdout_figures(out_dir: Path, name: str, history, report, val, threshold):
    """Training curves + LR schedule + sweep curves + actual-vs-predicted
    panels + a CT/mask overlay for one holdout segmentation run."""
    from onestop_tpu.analysis import viz

    x_val, y_val, probs = val
    viz.plot_training_curves(history, path=out_dir / f"{name}_training_curves.png")
    viz.plot_lr_schedule(history["lr"], path=out_dir / f"{name}_lr_schedule.png")
    # the reference's schedule-zoo demo plots precede its training cell
    # (holdout.py:941-1035); emitted once per run directory
    zoo = out_dir / "lr_schedule_zoo.png"
    if not zoo.exists():
        viz.plot_schedule_zoo(path=zoo)
    viz.plot_sweep_curves(report, path=out_dir / f"{name}_sweep.png")
    # show the busiest mask plus the first slice (the reference eyeballs a
    # handful of val slices; the largest-GT one is the informative pick)
    areas = np.asarray(y_val).reshape(len(y_val), -1).sum(axis=1)
    for tag, i in {"0": 0, "max": int(np.argmax(areas))}.items():
        viz.compare_actual_and_predicted(
            x_val[i], y_val[i], probs[i], threshold=threshold,
            path=out_dir / f"{name}_actual_vs_predicted_{tag}.png")
    viz.plot_sample(x_val[0], y_val[0], path=out_dir / f"{name}_sample_overlay.png")


def _preproc_demo_figures(out_dir: Path, data_dir, pre_cfg, kw):
    """CLAHE before/after + cropper demo panels from one raw ingested slice
    (ref clahe_enhancer/cropper demo=1 branches, holdout.py:171-194,249-273).
    Needs raw slices, so it re-ingests a single case — skipped when the
    runner was handed prebuilt arrays."""
    from onestop_tpu.analysis import viz

    triple = next(iter(_case_slice_triples(data_dir, pre_cfg, **kw)), None)
    if triple is None:
        return
    ct, lung = triple[0], triple[1]
    mid = len(ct) // 2
    viz.plot_clahe_demo(ct[mid], path=out_dir / "clahe_demo.png")
    viz.plot_cropper_demo((lung[mid] > 0).astype(np.float64),
                          path=out_dir / "cropper_demo.png")


# ---------------------------------------------------------------------------
# shared segmentation engine
# ---------------------------------------------------------------------------

def _build_unet(task_cfg: C.TaskConfig):
    # s2d_stem: the C_in=1 first conv's backward pass is the single worst op
    # on TPU; the space-to-depth stem makes training epochs ~1.5x faster
    # (measured, scripts/profile_ingest.py). Params are identical either
    # way, so serving (ops.pipeline, stem off — it loses there) can load
    # these checkpoints directly.
    m = task_cfg.model
    return UNet(widths=tuple(m.unet_widths), bridge=m.unet_bridge,
                dropout=m.unet_dropout, dtype=jnp.dtype(m.compute_dtype),
                bn_momentum=m.bn_momentum, bn_epsilon=m.bn_epsilon,
                s2d_stem=True)


def _model_input_shape(task_cfg: C.TaskConfig, x) -> tuple:
    """The model-facing input shape from ModelConfig (in_size, in_channels) —
    validated against the actual data so a config/data mismatch fails loudly
    instead of silently training a model at whatever shape arrived."""
    m = task_cfg.model
    shape = (m.in_size, m.in_size, m.in_channels)
    if tuple(x.shape[1:]) != shape:
        raise ValueError(
            f"dataset slices have shape {tuple(x.shape[1:])} but "
            f"ModelConfig expects {shape} (in_size={m.in_size}, "
            f"in_channels={m.in_channels}); adjust ModelConfig or the data")
    return shape


def _run_holdout_segmentation(model, task_cfg: C.TaskConfig, x, y, out_dir,
                              name: str, verbose=False, use_augmentation=False,
                              mesh=None, save_figures=True):
    """use_augmentation: False (reference's published runs — aug computed but
    never trained on, SURVEY.md §8 Q7), 'batch'/True (on-device joint aug of
    every training batch), or 'concat' (materialize augment.n_samples
    augmented pairs and append to the train set — the reference's
    commented-out merge, holdout.py:615-619).

    mesh: data-parallel training over the mesh's 'data' axis (batch sharded,
    grads pmean'd, sync-BN) — the reference is single-device; this is the
    SURVEY §2.4/§5.8 scaling path."""
    out_dir = _out(out_dir)
    sp = task_cfg.split
    tr_idx, te_idx = train_test_split_indices(len(x), sp.test_size, sp.seed)
    x_train, y_train = x[tr_idx], y[tr_idx]
    x_val, y_val = x[te_idx], y[te_idx]

    if use_augmentation == "concat":
        x_train, y_train = _concat_augmented(x_train, y_train, task_cfg.augment,
                                             task_cfg.train.shuffle_seed)
    per_batch = use_augmentation in (True, "batch")
    trainer = Trainer(model, task_cfg.train,
                      augment_cfg=task_cfg.augment if per_batch else None,
                      mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(task_cfg.train.init_seed),
                               _model_input_shape(task_cfg, x))
    t0 = time.perf_counter()
    state, history, best = trainer.fit(state, x_train, y_train, x_val, y_val,
                                       verbose=verbose)
    train_time = time.perf_counter() - t0

    # restore the best-val-dice snapshot (ModelCheckpoint load, ref :1073);
    # if the config monitors only val_loss, restore that best instead
    primary = "val_dice_coeff" if "val_dice_coeff" in best else next(iter(best), None)
    if primary is not None and best[primary]["params"] is not None:
        state = dataclasses.replace(
            state, params=best[primary]["params"],
            batch_stats=best[primary]["batch_stats"])

    probs = trainer.predict(state, x_val)
    sw = task_cfg.sweep
    report = sweep_report(y_val, probs, coarse=sw.coarse, fine=sw.fine,
                          pr_grid=sw.pr_grid,
                          batch_size=sw.eval_batch_size if sw.batchwise else None)
    val_loss, val_dice = trainer.evaluate(state, x_val, y_val)

    best_dice_val = (best["val_dice_coeff"]["value"]
                     if "val_dice_coeff" in best and best["val_dice_coeff"]["params"] is not None
                     else None)
    ckpt = out_dir / metric_stamped_name(name, best_dice_val or val_dice)
    save_checkpoint(ckpt, state.params, state.batch_stats,
                    {"val_dice": val_dice, "val_loss": val_loss,
                     "best_threshold": report["best_threshold"],
                     "qat": task_cfg.train.qat})
    results = {
        "name": name,
        "val_dice": val_dice, "val_loss": val_loss,
        "best_threshold": report["best_threshold"],
        "best_dice": report["best_dice"], "best_iou": report["best_iou"],
        "precision_at_best": report["precision_at_best"],
        "recall_at_best": report["recall_at_best"],
        "train_seconds": train_time,
        "checkpoint": str(ckpt),
        "n_train": len(x_train), "n_val": len(x_val),
    }
    _save_json(out_dir / f"{name}_report.json", {**results, "history": history})
    if save_figures:
        _holdout_figures(out_dir, name, history, report, (x_val, y_val, probs),
                         report["best_threshold"])
    return {**results, "history": history, "state": state, "trainer": trainer,
            "sweep": report, "val": (x_val, y_val, probs)}


def _concat_augmented_folds(x, y, folds, aug_cfg, seed: int):
    """Per-fold train-set merge for CV: materialize aug_cfg.n_samples
    augmented pairs from each fold's OWN train rows and append them to the
    global arrays, extending only that fold's train indices — augmented
    samples never reach any fold's validation split (the reference's
    commented-out merge, holdout.py:615-619, done without leakage)."""
    from onestop_tpu.ops.augment import sample_and_augment

    x_parts, y_parts, new_folds = [x], [y], []
    next_row = len(x)
    for f, (tr_idx, va_idx) in enumerate(folds):
        key = jax.random.PRNGKey(seed + 7919 * f)
        _, ax, ay = sample_and_augment(key, jnp.asarray(x[tr_idx][..., 0]),
                                       jnp.asarray(y[tr_idx][..., 0]), aug_cfg)
        n_new = len(ax)
        x_parts.append(np.asarray(ax)[..., None])
        y_parts.append(np.asarray(ay)[..., None])
        new_folds.append((np.concatenate([np.asarray(tr_idx),
                                          np.arange(next_row, next_row + n_new)]),
                          np.asarray(va_idx)))
        next_row += n_new
    return (np.concatenate(x_parts), np.concatenate(y_parts), new_folds)


def _run_cv_segmentation(task_cfg: C.TaskConfig, x, y, out_dir, name, mesh=None,
                         verbose=False, cv_mode: str = "auto", save_figures=True,
                         use_augmentation=False):
    """cv_mode:
    - 'auto': fold-parallel when a multi-device mesh is available, else
      sequential with fresh per-fold init (on one chip fold-vmapping only
      multiplies activation memory without any speedup);
    - 'parallel': fold-parallel over the mesh 'fold' axis, fresh init/fold;
    - 'sequential': the reference's loop shape but with fresh per-fold init;
    - 'sequential_reference': the reference's weight-carrying loop
      (SURVEY.md §8 Q5) for behavior-parity runs.

    use_augmentation: False | 'batch' (on-device joint aug of every training
    batch, per fold) | 'concat' (per-fold materialized merge — see
    ``_concat_augmented_folds``). The reference's CV scripts compute aug but
    never train on it (SURVEY.md §8 Q7)."""
    out_dir = _out(out_dir)
    sp = task_cfg.split
    folds = kfold_indices(len(x), sp.n_folds, sp.seed)
    if use_augmentation == "concat":
        x, y, folds = _concat_augmented_folds(x, y, folds, task_cfg.augment,
                                              task_cfg.train.shuffle_seed)
    aug_cfg = task_cfg.augment if use_augmentation in (True, "batch") else None
    _model_input_shape(task_cfg, x)   # validate data vs ModelConfig.in_size/in_channels
    model = _build_unet(task_cfg)
    t0 = time.perf_counter()
    if cv_mode == "auto":
        multi = mesh is not None and int(np.prod(mesh.devices.shape)) > 1
        cv_mode = "parallel" if multi else "sequential"
    if cv_mode.startswith("sequential"):
        from onestop_tpu.parallel.cv import sequential_cross_validate
        seq_tr, seq_state, hist, best = sequential_cross_validate(
            model, task_cfg.train, x, y, folds,
            epochs_per_fold=list(sp.fold_epochs) or None, verbose=verbose,
            carry_weights=(cv_mode == "sequential_reference"),
            augment_cfg=aug_cfg)
        states = seq_state

        class _SeqAdapter:
            cfg = task_cfg.train

            @staticmethod
            def predict_fold(params, bstats, xs, batch_size=None):
                st = dataclasses.replace(seq_state, params=params, batch_stats=bstats)
                return seq_tr.predict(st, xs)

        tr = _SeqAdapter()
    else:
        tr, states, hist, best = cross_validate(
            model, task_cfg.train, x, y, folds, mesh=mesh,
            epochs_per_fold=list(sp.fold_epochs) or None, verbose=verbose,
            augment_cfg=aug_cfg)
    train_time = time.perf_counter() - t0

    # per-fold sweeps on the best snapshot (the reference's
    # fold x threshold x metric recompile loop collapsed to one pass/fold)
    sw = task_cfg.sweep
    ths = grid(*sw.cv_grid)
    tables = {k: np.zeros((len(ths), len(folds))) for k in
              ("dice", "iou", "precision", "recall")}
    fold_summaries = []
    # a common gallery slice every fold model predicts (the reference's
    # 5/6-panel cross-fold compare, task1_crossval_3folds:1322-1363): the
    # busiest-mask slice of fold 1's validation split
    gal_i = folds[0][1][int(np.argmax(
        np.asarray(y)[folds[0][1]].reshape(len(folds[0][1]), -1).sum(axis=1)))]
    gallery_preds = []
    for f, (tr_idx, te_idx) in enumerate(folds):
        params = best[f]["params"] if best[f]["params"] is not None else \
            jax.tree_util.tree_map(lambda a: np.asarray(a[f]), jax.device_get(states.params))
        bstats = best[f]["batch_stats"] if best[f]["batch_stats"] is not None else \
            jax.tree_util.tree_map(lambda a: np.asarray(a[f]), jax.device_get(states.batch_stats))
        probs = tr.predict_fold(params, bstats, x[te_idx])
        gallery_preds.append(np.asarray(
            tr.predict_fold(params, bstats, x[gal_i:gal_i + 1])[0]))
        res = threshold_sweep(y[te_idx], probs, ths,
                              batch_size=sw.eval_batch_size if sw.batchwise else None)
        for k in tables:
            tables[k][:, f] = res[k]
        ckpt = out_dir / f"{name}_fold{f + 1}.msgpack"
        save_checkpoint(ckpt, params, bstats,
                        {"fold": f, "val_dice": best[f]["value"],
                         "qat": task_cfg.train.qat})
        fold_summaries.append({
            "fold": f + 1, "best_val_dice_during_training": best[f]["value"],
            "best_sweep_dice": float(res["dice"].max()),
            "best_threshold": float(ths[int(np.argmax(res["dice"]))]),
            "checkpoint": str(ckpt),
        })

    # the README's "mean of folds" numbers: max over thresholds per fold, mean
    summary = {}
    for k, tab in tables.items():
        per_fold_max = tab.max(axis=0)
        summary[f"mean_fold_{k}"] = float(per_fold_max.mean())
        summary[f"per_fold_max_{k}"] = per_fold_max.tolist()
        summary[f"best_thresholds_{k}"] = ths[tab.argmax(axis=0)].tolist()

    results = {
        "name": name, "n_folds": len(folds), **summary,
        "train_seconds": train_time, "folds": fold_summaries,
        "thresholds": ths.tolist(),
        "tables": {k: v.tolist() for k, v in tables.items()},
    }
    _save_json(out_dir / f"{name}_report.json", results)
    try:  # threshold x fold DataFrames, the reference's report artifact
        import pandas as pd
        for k, tab in tables.items():
            df = pd.DataFrame(tab, index=np.round(ths, 4),
                              columns=[f"fold{f + 1}" for f in range(len(folds))])
            df.index.name = "threshold"
            df.to_csv(out_dir / f"{name}_{k}_by_fold.csv")
    except ImportError:
        pass
    if save_figures:
        from onestop_tpu.analysis import viz

        viz.plot_cv_training_curves(hist, path=out_dir / f"{name}_training_curves.png")
        viz.plot_cv_sweep_tables(ths, tables, path=out_dir / f"{name}_sweep_by_fold.png")
        viz.compare_fold_predictions(
            x[gal_i], y[gal_i], gallery_preds,
            threshold=float(np.median(summary["best_thresholds_dice"])),
            path=out_dir / f"{name}_fold_compare.png")
    return {**results, "history": hist, "states": states, "trainer": tr,
            "fold_best": best, "data_folds": folds}


# ---------------------------------------------------------------------------
# the six runners
# ---------------------------------------------------------------------------

def _seg_data(data, data_dir, task_cfg, cache_dir, task_name, kw):
    if data is not None:
        return data
    def _build():
        triples = list(_case_slice_triples(data_dir, task_cfg.preprocess, **kw))
        return build_segmentation_dataset(triples, task_cfg.preprocess)
    return _maybe_cached(_build, cache_dir, task_name, task_cfg.preprocess,
                         ("cts_cropped_lungs_224", "infections_cropped_lungs_224"),
                         source_key=_source_key(data_dir, kw))


def holdout_runner_unet_infection_segmentation(
    data=None, data_dir=None, out_dir=None, small_run=False, verbose=False,
    cluster_analysis=True, use_augmentation=False, cache_dir=None, mesh=None,
    save_figures=True, **kw
):
    """Task1 holdout U-Net (ref task1_preprocessing_plus_unet_with_comments.py:6),
    including the latent PCA+KMeans clustering study on the last decoder
    block's activations (ref holdout.py:1386-1496)."""
    task_cfg = C.task1_holdout()
    if small_run:
        task_cfg = _small(task_cfg, epochs=kw.pop("epochs", 3))
    task_cfg = _pop_qat(task_cfg, kw)
    x, y = _seg_data(data, data_dir, task_cfg, cache_dir, "task1", kw)
    model = _build_unet(task_cfg)
    res = _run_holdout_segmentation(model, task_cfg, x, y, out_dir,
                                    "unet_covid_holdout", verbose=verbose,
                                    use_augmentation=use_augmentation, mesh=mesh,
                                    save_figures=save_figures)
    if save_figures and data is None:
        _preproc_demo_figures(_out(out_dir), data_dir, task_cfg.preprocess, kw)
    if cluster_analysis:
        from onestop_tpu.analysis.clustering import latent_cluster_analysis
        x_val, y_val, _ = res["val"]
        trainer, state = res["trainer"], res["state"]
        n_comp = min(1000, len(x_val))  # ref uses PCA(1000)
        cl = latent_cluster_analysis(
            model, state.params, state.batch_stats, x_val, y_val,
            layer_prefix="dec0_conv1", n_components=n_comp,
            evaluate=lambda xs, ys: dict(zip(("loss", "dice"),
                                             trainer.evaluate(state, xs, ys))),
            batch_size=task_cfg.train.batch_size,
        )
        res["clustering"] = {k: v for k, v in cl.items() if k != "labels"}
        res["clustering"]["labels"] = cl["labels"].tolist()
        _save_json(_out(out_dir) / "unet_covid_holdout_clustering.json",
                   res["clustering"])
    return res


def three_fold_runner_unet_infection_segmentation(
    data=None, data_dir=None, out_dir=None, small_run=False, mesh=None,
    verbose=False, cv_mode="auto", cache_dir=None, save_figures=True,
    use_augmentation=False, fold_epochs=None, **kw
):
    """Task1 3-fold CV U-Net (ref task1_crossval_3folds_unet.py:6); folds run
    in parallel on the mesh 'fold' axis, epochs 80/20/20 preserved via no-op
    masking. cv_mode='sequential_reference' reproduces the reference's
    weight-carrying sequential loop (its published 3-fold numbers depend on
    that carry-over — 20-epoch folds train from fold 1's weights)."""
    task_cfg = C.task1_3fold()
    if small_run:
        task_cfg = _small(task_cfg, epochs=3)
        task_cfg = dataclasses.replace(
            task_cfg, split=dataclasses.replace(task_cfg.split, fold_epochs=(3, 2, 2)))
    if fold_epochs is not None:  # budget override (e.g. longer aug training)
        task_cfg = dataclasses.replace(
            task_cfg, split=dataclasses.replace(task_cfg.split,
                                                fold_epochs=tuple(fold_epochs)))
    task_cfg = _pop_qat(task_cfg, kw)
    x, y = _seg_data(data, data_dir, task_cfg, cache_dir, "task1", kw)
    return _run_cv_segmentation(task_cfg, x, y, out_dir, "unet_covid_3fold",
                                mesh=mesh, verbose=verbose, cv_mode=cv_mode,
                                save_figures=save_figures,
                                use_augmentation=use_augmentation)


def four_fold_runner_unet_infection_segmentation(
    data=None, data_dir=None, out_dir=None, small_run=False, mesh=None,
    verbose=False, cv_mode="auto", cache_dir=None, save_figures=True,
    use_augmentation=False, fold_epochs=None, **kw
):
    """Task1 4-fold CV U-Net (ref task1_crossval_4folds_unet.py:6)."""
    task_cfg = C.task1_4fold()
    if small_run:
        task_cfg = _small(task_cfg, epochs=2)
        task_cfg = dataclasses.replace(
            task_cfg, split=dataclasses.replace(task_cfg.split, fold_epochs=(2, 2, 2, 2)))
    if fold_epochs is not None:  # budget override (e.g. longer aug training)
        task_cfg = dataclasses.replace(
            task_cfg, split=dataclasses.replace(task_cfg.split,
                                                fold_epochs=tuple(fold_epochs)))
    task_cfg = _pop_qat(task_cfg, kw)
    x, y = _seg_data(data, data_dir, task_cfg, cache_dir, "task1", kw)
    return _run_cv_segmentation(task_cfg, x, y, out_dir, "unet_covid_4fold",
                                mesh=mesh, verbose=verbose, cv_mode=cv_mode,
                                save_figures=save_figures,
                                use_augmentation=use_augmentation)


def holdout_runner_unetplusplus_infection_segmentation(
    data=None, data_dir=None, out_dir=None, small_run=False, verbose=False,
    use_augmentation=False, cache_dir=None, mesh=None, save_figures=True, **kw
):
    """Task1 U-Net++ holdout (ref task1_unet_plus_plus.py:6)."""
    task_cfg = C.task1_unetpp()
    if small_run:
        task_cfg = _small(task_cfg, epochs=kw.pop("epochs", 3))
    task_cfg = _pop_qat(task_cfg, kw)
    x, y = _seg_data(data, data_dir, task_cfg, cache_dir, "task1", kw)
    m = task_cfg.model
    model = UNetPP(widths=tuple(m.unetpp_widths),
                   backbone_dropout=m.unetpp_backbone_dropout,
                   block_dropout=m.unetpp_block_dropout,
                   dtype=jnp.dtype(m.compute_dtype),
                   bn_momentum=m.bn_momentum, bn_epsilon=m.bn_epsilon,
                   s2d_stem=True)
    return _run_holdout_segmentation(model, task_cfg, x, y, out_dir,
                                     "unetpp_covid_holdout", verbose=verbose,
                                     use_augmentation=use_augmentation, mesh=mesh,
                                     save_figures=save_figures)


def runner_classification(
    data=None, data_dir=None, out_dir=None, small_run=False, verbose=False,
    use_augmentation=False, cache_dir=None, mesh=None, save_figures=True,
    cls_dim=None, cls_head=None, **kw
):
    """Task2 COVID-19 slice classification (ref task2_covid19_classifcation.py:6):
    stratified 70/30 split, balanced class weights, AUC tracking (RocCallback
    equivalent), report at thresholds 0.50/0.81.

    use_augmentation: 'concat' materializes augment.n_samples image-only
    augmented samples appended to the train split with labels carried by
    index — the *fixed* form of the reference's corrupted-correspondence aug
    block (task2:575-619, SURVEY.md §8 Q6); 'batch'/True augments every
    training batch on device (image-only).

    cls_dim: train the classifier at this input resolution instead of the
    reference's 224 (preprocess + Flatten head move together). The serving
    motivation: the classifier's C<128-lane convs are position-bound, so a
    112² classifier quarters its measured one-stop overhead
    (production.one_stop_infer(cls_hw=...)).

    cls_head: 'gap' replaces the reference's Flatten head with global
    average pooling (opt-in transfer probe — the 1.6 M-param flatten fc0
    memorizes per-position patterns; VERDICT r4 item 4, study
    scripts/quality_cls_gap.py). Default keeps the reference topology."""
    task_cfg = C.task2_classification()
    if small_run:
        task_cfg = _small(task_cfg, epochs=kw.pop("epochs", 4))
    if cls_dim is not None:
        # applied AFTER _small so smoke runs still honor the requested
        # resolution — the Flatten head pins the input size, so silently
        # training at _small's 64 while serving cls_hw=cls_dim would be a
        # shape mismatch (VERDICT r4 weak #6)
        task_cfg = dataclasses.replace(
            task_cfg,
            preprocess=dataclasses.replace(task_cfg.preprocess, new_dim=cls_dim),
            model=dataclasses.replace(task_cfg.model, in_size=cls_dim))
    if cls_head is not None:
        task_cfg = dataclasses.replace(
            task_cfg, model=dataclasses.replace(task_cfg.model,
                                                cls_head=cls_head))
    task_cfg = _pop_qat(task_cfg, kw)
    out_path = _out(out_dir)
    if data is None:
        def _build():
            t = list(_case_slice_triples(data_dir, task_cfg.preprocess, **kw))
            return build_classification_dataset(t, task_cfg.preprocess)
        x, y = _maybe_cached(_build, cache_dir, "task2", task_cfg.preprocess,
                             ("cts_cropped_lungs_224", "y_label"),
                             source_key=_source_key(data_dir, kw))
    else:
        x, y = data
    y = np.asarray(y).astype(np.float32)

    # cfg.split.stratified selects the splitter (ref task2:647-651 uses
    # StratifiedShuffleSplit; the plain holdout split is train_test_split)
    if task_cfg.split.stratified:
        tr_idx, te_idx = stratified_shuffle_split_indices(
            y, task_cfg.split.test_size, task_cfg.split.seed)
    else:
        tr_idx, te_idx = train_test_split_indices(
            len(y), task_cfg.split.test_size, task_cfg.split.seed)
    x_train, y_train = x[tr_idx], y[tr_idx][:, None]
    x_val, y_val = x[te_idx], y[te_idx][:, None]

    if use_augmentation == "concat":
        x_train, y_train = _concat_augmented(x_train, y_train, task_cfg.augment,
                                             task_cfg.train.shuffle_seed,
                                             images_only=True)
    per_batch = use_augmentation in (True, "batch")
    m = task_cfg.model
    model = ClassifierCNN(widths=tuple(m.cls_widths), dense=m.cls_dense,
                          dropout=m.cls_dropout, dtype=jnp.dtype(m.compute_dtype),
                          bn_momentum=m.bn_momentum, bn_epsilon=m.bn_epsilon,
                          s2d_stem=True, head=m.cls_head)
    trainer = Trainer(model, task_cfg.train, seg_metrics=False,
                      augment_cfg=task_cfg.augment if per_batch else None,
                      augment_images_only=True, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(task_cfg.train.init_seed),
                               _model_input_shape(task_cfg, x))

    sw = None
    if task_cfg.train.use_class_weight:
        cw = np.asarray(L.balanced_class_weights(jnp.asarray(y_train.ravel())))
        sw = cw[y_train.ravel().astype(int)]

    t0 = time.perf_counter()
    state, history, best = trainer.fit(state, x_train, y_train, x_val, y_val,
                                       sample_weights=sw, track_auc=True,
                                       verbose=verbose)
    train_time = time.perf_counter() - t0

    if best["val_auc"]["params"] is not None:  # best_val_auc_weights.h5 parity
        state = dataclasses.replace(state, params=best["val_auc"]["params"],
                                    batch_stats=best["val_auc"]["batch_stats"])
    probs = trainer.predict(state, x_val).ravel()
    report = classification_report(y_val.ravel(), probs, thresholds=(0.50, 0.81))
    fpr, tpr, _ = roc_curve_points(y_val.ravel(), probs)

    ckpt = out_path / metric_stamped_name("covid_classifier", report["auc"], "auc")
    save_checkpoint(ckpt, state.params, state.batch_stats,
                    {"auc": report["auc"], "qat": task_cfg.train.qat,
                     "cls_head": task_cfg.model.cls_head})
    results = {
        "name": "covid_classification", "auc": report["auc"],
        "report": report["at_threshold"],
        "best_threshold": report["best_threshold"],
        "at_best_threshold": report["at_best_threshold"],
        "calibration": report["calibration"],
        "train_seconds": train_time, "checkpoint": str(ckpt),
        "n_train": len(x_train), "n_val": len(x_val),
        "class_balance": [int((y == 0).sum()), int((y == 1).sum())],
    }
    _save_json(out_path / "classification_report.json", results)
    if save_figures:
        from onestop_tpu.analysis import viz

        viz.plot_training_curves(history, metric_name="f1",
                                 path=out_path / "classifier_training_curves.png")
        viz.plot_roc(fpr, tpr, report["auc"], path=out_path / "classifier_roc.png")
        for t in (0.50, 0.81):
            viz.plot_confusion_matrix(
                report["at_threshold"][t]["confusion"], threshold=t,
                path=out_path / f"classifier_confusion_{t:.2f}.png")
        viz.plot_probability_distribution(
            y_val.ravel(), probs, threshold=report["best_threshold"],
            path=out_path / "classifier_prob_dist.png")
        from onestop_tpu.metrics.classification import apply_platt

        cal = report["calibration"]
        viz.plot_reliability_diagram(
            y_val.ravel(), probs,
            apply_platt(probs, cal["platt_a"], cal["platt_b"]),
            path=out_path / "classifier_reliability.png")
    return {**results, "history": history, "state": state, "trainer": trainer,
            "roc": (fpr, tpr), "val": (x_val, y_val, probs)}


def runner_lung_segmentation(
    data=None, data_dir=None, out_dir=None, small_run=False, verbose=False,
    use_augmentation=False, cache_dir=None, mesh=None, save_figures=True, **kw
):
    """Task3 lung segmentation U-Net (ref task3_lung_segmentation_unet.py:6) —
    the minimum end-to-end slice M1 (SURVEY.md §7)."""
    task_cfg = C.task3_lung()
    if small_run:
        task_cfg = _small(task_cfg, epochs=kw.pop("epochs", 3))
    task_cfg = _pop_qat(task_cfg, kw)
    if data is None:
        def _build():
            pairs = list(_case_slice_triples(data_dir, task_cfg.preprocess,
                                             with_infection=False, **kw))
            return build_lung_dataset(pairs, task_cfg.preprocess)
        x, y = _maybe_cached(_build, cache_dir, "task3", task_cfg.preprocess,
                             ("cts_cropped_lungs_224", "lungs_cropped_224"),
                             source_key=_source_key(data_dir, kw))
    else:
        x, y = data
    model = _build_unet(task_cfg)
    return _run_holdout_segmentation(model, task_cfg, x, y, out_dir,
                                     "unet_lung_segmentation", verbose=verbose,
                                     use_augmentation=use_augmentation, mesh=mesh,
                                     save_figures=save_figures)


def runner_production_chain(
    data_dir=None, out_dir=None, small_run=False, verbose=False,
    cache_dir=None, mesh=None, threshold=0.5, save_figures=True,
    lung_dim=None, classify=False, cls_dim=None, cls_head=None,
    use_augmentation=False, epochs=None, **kw
):
    """CLI menu 'seven' — the chained no-ground-truth pipeline the
    reference's menu advertises but never implements (ref ``app.py:29``
    prompts for a nonexistent 'seven'; SURVEY.md §8 Q2/Q13).

    Trains (a) a full-frame lung U-Net on uncropped CLAHE'd pairs
    (``production.build_plain_lung_dataset`` — the distribution
    ``chained_infer`` feeds it at serving time) and (b) the standard task1
    infection U-Net; then, on a held-out case's raw slices, runs
    ``production.chained_infer`` (lung model → predicted boxes → CLAHE+crop →
    infection model) and the same serving chain with ground-truth lung boxes.
    Reports both dice scores and their delta — the cost of replacing the
    reference's GT-leaky boxes with predicted ones.

    classify=True additionally trains the task2 classifier (on the standard
    cropped classification dataset) and serves the full one-stop chain
    (``production.one_stop_infer``): lung seg + infection seg + per-slice
    infection classification in one jit program — the three reference tasks,
    which its notebooks can only run disconnected and GT-fed, unified with
    no ground truth at inference.

    use_augmentation/epochs: the bed-robust training recipe for the
    deployed chain is ``use_augmentation='batch', epochs=160`` (2x the
    reference budget — per-batch warps make every epoch a fresh draw;
    round-4 CV study, RESULTS.md), optionally with ``qat=True`` when the
    checkpoint will serve int8."""
    from onestop_tpu.data.ingest import _kernel_boxes, _kernel_mask, _to_u8
    from onestop_tpu.ops.pipeline import fused_infer
    from onestop_tpu.production import build_plain_lung_dataset, chained_infer

    task1 = C.task1_holdout()
    task3 = C.task3_lung()
    if small_run:
        task1 = _small(task1, epochs=3 if epochs is None else epochs)
        task3 = _small(task3, epochs=3 if epochs is None else epochs)
    elif epochs is not None:
        # deployment-recipe override: per-batch augmentation makes every
        # epoch a fresh draw, so the bed-robust training recipe runs the
        # chain stages at 2x the reference budget (round-4 CV study,
        # RESULTS.md — aug@160 scores 0.978 mean-fold dice on both beds)
        task1 = dataclasses.replace(
            task1, train=dataclasses.replace(task1.train, epochs=epochs))
        task3 = dataclasses.replace(
            task3, train=dataclasses.replace(task3.train, epochs=epochs))
    qat = kw.pop("qat", False)     # QAT for every model the chain trains
    if qat:
        task1 = _pop_qat(task1, {"qat": True})
        task3 = _pop_qat(task3, {"qat": True})
    if lung_dim is not None:
        # stage-1 lung model at reduced resolution (chained_infer lung_hw):
        # boxes only need lung-scale precision; ~(dim/new_dim)^2 of the
        # stage-1 FLOPs. The lung dataset, training, and serving all move to
        # lung_dim together so there is no train/serve skew.
        task3 = dataclasses.replace(
            task3,
            preprocess=dataclasses.replace(task3.preprocess, new_dim=lung_dim),
            model=dataclasses.replace(task3.model, in_size=lung_dim),
        )
    pre = task1.preprocess
    out_path = _out(out_dir)

    if classify and data_dir is None:
        # synthetic fallback: balance infected/clean cases so the task2
        # stratified split always has both classes (the 0.9 segmentation
        # default can yield <2 negative slices on tiny smoke runs)
        kw.setdefault("infected_fraction", 0.5)
    triples = list(_case_slice_triples(data_dir, pre, **kw))
    if len(triples) < 2:
        raise ValueError("production chain needs >=2 cases (train + held-out)")
    train_triples, (ct_e, lung_e, inf_e) = triples[:-1], triples[-1]

    # stage-1 model: full-frame lung U-Net
    src_key = _source_key(data_dir, kw) + "|trainset=all-but-last"
    xl, yl = _maybe_cached(
        lambda: build_plain_lung_dataset(
            [(ct, lung) for ct, lung, _ in train_triples], task3.preprocess),
        cache_dir, "chain_lung_plain", task3.preprocess,
        ("cts_fullframe", "lungs_fullframe"), source_key=src_key)
    lung_model = _build_unet(task3)
    lung_res = _run_holdout_segmentation(
        lung_model, task3, xl, yl, out_dir, "unet_lung_fullframe",
        verbose=verbose, mesh=mesh, save_figures=save_figures,
        use_augmentation=use_augmentation)

    # stage-3 model: the standard task1 infection U-Net
    xi, yi = _maybe_cached(
        lambda: build_segmentation_dataset(train_triples, pre),
        cache_dir, "chain_task1", pre,
        ("cts_cropped_lungs_224", "infections_cropped_lungs_224"),
        source_key=src_key)
    seg_model = _build_unet(task1)
    seg_res = _run_holdout_segmentation(
        seg_model, task1, xi, yi, out_dir, "unet_infection_for_chain",
        verbose=verbose, mesh=mesh, save_figures=save_figures,
        use_augmentation=use_augmentation)

    # optional stage-3 passenger: the task2 classifier, trained on the
    # standard cropped classification dataset (the same distribution the
    # chain's stage-3 input reproduces with predicted boxes)
    cls_res = cls_model = None
    if classify:
        task2 = C.task2_classification()
        if small_run:
            task2 = _small(task2, epochs=task1.train.epochs)
        if cls_dim is not None:
            # low-res serving classifier (one_stop_infer cls_hw): trained on
            # the same crops at cls_dim; at serving the stage-3 crop is
            # linear-resized once for it (profile: scripts/profile_cls_overhead.py).
            # Applied AFTER _small so --small-run --cls-dim smoke runs train
            # AND serve at cls_dim instead of silently dropping the flag
            # (VERDICT r4 weak #6).
            task2 = dataclasses.replace(
                task2,
                preprocess=dataclasses.replace(task2.preprocess, new_dim=cls_dim),
                model=dataclasses.replace(task2.model, in_size=cls_dim))
        x_cls, y_cls = _maybe_cached(
            lambda: build_classification_dataset(train_triples, task2.preprocess),
            cache_dir, "chain_task2", task2.preprocess,
            ("cts_cropped_lungs_224", "y_label"), source_key=src_key)
        cls_kw = {"epochs": task1.train.epochs} if small_run else {}
        if qat:
            cls_kw["qat"] = True
        # the chain's aug flag reaches the classifier too: with the default
        # flatten head augmentation measurably HURTS transfer
        # (round4_cls_transfer.json — every aug arm below no-aug), but with
        # cls_head='gap' it is the best measured recipe (held-out AUC 0.938
        # vs 0.919 no-aug, round5_cls_gap.json)
        cls_res = runner_classification(
            data=(x_cls, y_cls), out_dir=out_dir, small_run=small_run,
            verbose=verbose, mesh=mesh, save_figures=save_figures,
            use_augmentation=use_augmentation,
            cls_dim=cls_dim, cls_head=cls_head, **cls_kw)
        m2 = task2.model
        cls_model = ClassifierCNN(
            widths=tuple(m2.cls_widths), dense=m2.cls_dense,
            dropout=m2.cls_dropout, dtype=jnp.dtype(m2.compute_dtype),
            bn_momentum=m2.bn_momentum, bn_epsilon=m2.bn_epsilon,
            head=cls_head or m2.cls_head)

    def _vars(res):
        st = res["state"]
        return {"params": st.params, "batch_stats": st.batch_stats}

    # held-out raw slices (drop empty-lung slices like the dataset builds do)
    lungs_bin = (lung_e > 0)
    keep = lungs_bin.reshape(len(lungs_bin), -1).max(axis=1) > 0
    raw_u8 = jnp.asarray(_to_u8(ct_e[keep]))
    inf_u8 = jnp.asarray(_to_u8(inf_e[keep]))
    d = pre.new_dim
    interp = jax.default_backend() == "cpu"

    lung_hw = None if lung_dim is None else (lung_dim, lung_dim)
    masks_chain, b1p, b2p = chained_infer(
        lung_model, _vars(lung_res), seg_model, _vars(seg_res), raw_u8,
        model_hw=(d, d), threshold=threshold, interpret=interp,
        lung_hw=lung_hw)
    b1g, b2g, _ = _kernel_boxes(jnp.asarray(lungs_bin[keep], jnp.float32), (d, d // 2))
    masks_gtbox = fused_infer(seg_model, _vars(seg_res), raw_u8, b1g, b2g,
                              out_hw=(d, d), threshold=threshold, interpret=interp)

    # targets cropped into each prediction's own frame
    tgt_chain = _kernel_mask(inf_u8, b1p, b2p, (d, d // 2)) / 255.0 > 0.5
    tgt_gtbox = _kernel_mask(inf_u8, b1g, b2g, (d, d // 2)) / 255.0 > 0.5

    def _dice(pred, tgt):
        p = np.asarray(pred[..., 0] if pred.ndim == 4 else pred, np.float64)
        t = np.asarray(tgt, np.float64)
        return float((2 * (p * t).sum() + 1.0) / (p.sum() + t.sum() + 1.0))

    dice_chain = _dice(masks_chain, tgt_chain)
    dice_gtbox = _dice(masks_gtbox, tgt_gtbox)
    results = {
        "name": "production_chain",
        "dice_chained": dice_chain,
        "dice_gt_boxes": dice_gtbox,
        "dice_delta": dice_gtbox - dice_chain,
        "lung_val_dice": lung_res["val_dice"],
        "infection_val_dice": seg_res["val_dice"],
        "n_eval_slices": int(keep.sum()),
        "threshold": threshold,
    }
    if not qat:
        # the produced checkpoints are the chain's deployment artifacts —
        # remind the operator of the per-checkpoint int8 gate before they
        # reach the --int8/mixed serving paths (VERDICT r4 item 7)
        results["int8_serving_note"] = INT8_GATE_NOTE
        print(f"NOTE: {INT8_GATE_NOTE}")
    if classify:
        from onestop_tpu.production import one_stop_infer

        cd = cls_dim
        masks_os, cls_probs, _, _ = one_stop_infer(
            lung_model, _vars(lung_res), seg_model, _vars(seg_res),
            cls_model, _vars(cls_res), raw_u8,
            model_hw=(d, d), threshold=threshold, interpret=interp,
            lung_hw=lung_hw, cls_hw=None if cd is None else (cd, cd))
        # sanity: the classifier must not perturb the segmentation stage
        assert np.array_equal(np.asarray(masks_os), np.asarray(masks_chain))
        # per-slice GT label = infection present anywhere on the raw slice
        # (the reference's emptiness test, task2:413-418)
        y_true = (np.asarray(inf_u8).reshape(len(inf_u8), -1) > 0).any(axis=1)
        cls_probs = np.asarray(cls_probs, np.float64)
        results["cls_accuracy_at_0.5"] = float(
            ((cls_probs > 0.5) == y_true).mean())
        results["cls_n_positive"] = int(y_true.sum())
        if 0 < y_true.sum() < len(y_true):  # AUC needs both classes
            from onestop_tpu.metrics.classification import roc_auc

            results["cls_auc"] = float(roc_auc(y_true.astype(np.float32),
                                               cls_probs))
            # the free alternative: predicted-mask area as the infection
            # score — zero marginal cost (the chain already computed the
            # masks) and grounded in the segmentation stage, which is the
            # part of the chain that transfers to unseen volumes
            mask_area = np.asarray(masks_os, np.float64).reshape(
                len(masks_os), -1).sum(axis=1)
            results["cls_auc_mask_area"] = float(
                roc_auc(y_true.astype(np.float32), mask_area))
        results["cls_val_auc"] = cls_res["auc"]
        # the classifier run's Platt constants, fitted on ITS validation
        # split — paste into `python -m onestop_tpu.serve --cls-calibration`
        results["cls_calibration"] = [cls_res["calibration"]["platt_a"],
                                      cls_res["calibration"]["platt_b"]]
    _save_json(out_path / "production_chain_report.json", results)
    if save_figures:
        from onestop_tpu.analysis import viz
        from onestop_tpu.ops.resize import resize2d

        # the chain gallery needs the stage-1 lung mask, which chained_infer
        # consumes internally — recompute it for the one displayed slice
        ld = d if lung_dim is None else lung_dim
        x_l = (resize2d(raw_u8[:1].astype(jnp.float32), (ld, ld), "area") / 255.0)[..., None]
        lung_mask0 = np.asarray(
            lung_model.apply(_vars(lung_res), x_l, train=False)[0, ..., 0] > 0.5)
        viz.plot_production_chain(
            np.asarray(raw_u8[0]), lung_mask0,
            np.asarray(b1p[0]), np.asarray(b2p[0]),
            np.asarray(masks_chain[0, ..., 0]),
            path=out_path / "production_chain_gallery.png")
    return {**results, "lung": lung_res, "infection": seg_res,
            "classifier": cls_res}


RUNNERS = {
    "one": three_fold_runner_unet_infection_segmentation,
    "two": four_fold_runner_unet_infection_segmentation,
    "three": holdout_runner_unet_infection_segmentation,
    "four": holdout_runner_unetplusplus_infection_segmentation,
    "five": runner_classification,
    "six": runner_lung_segmentation,
    "seven": runner_production_chain,
}
