"""Visualization suite (matplotlib, host-side) — the reference's L9 layer
(SURVEY.md §1): CT+mask overlays (``holdout.py:719-756``), training curves
(``:1108-1124``), actual-vs-predicted galleries (``:1136-1163``; per-fold
variants ``task1_crossval_3folds:1322-1363``), ROC/confusion plots
(``task2:919-989``). All figures are optional: import matplotlib lazily so
headless training never touches it."""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_sample(ct, mask, path=None):
    """CT with infection-mask overlay (ref plot_sample, holdout.py:719-756)."""
    plt = _plt()
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    axes[0].imshow(np.squeeze(ct), cmap="bone")
    axes[0].set_title("CT")
    axes[1].imshow(np.squeeze(mask), cmap="bone")
    axes[1].set_title("Mask")
    axes[2].imshow(np.squeeze(ct), cmap="bone")
    axes[2].imshow(np.ma.masked_where(np.squeeze(mask) == 0, np.squeeze(mask)),
                   cmap="autumn", alpha=0.6)
    axes[2].set_title("Overlay")
    for ax in axes:
        ax.axis("off")
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_training_curves(history: dict, path=None, metric_name: str = "dice_coeff"):
    """Loss/metric curves (ref holdout.py:1108-1124)."""
    plt = _plt()
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    axes[0].plot(history["loss"], label="train")
    if "val_loss" in history:
        axes[0].plot(history["val_loss"], label="val")
    axes[0].set_title("loss")
    axes[0].legend()
    axes[0].grid(True)
    axes[1].plot(history["metric"], label="train")
    if "val_metric" in history:
        axes[1].plot(history["val_metric"], label="val")
    axes[1].set_title(metric_name)
    axes[1].legend()
    axes[1].grid(True)
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def compare_actual_and_predicted(ct, actual, predicted, threshold=0.5, path=None):
    """3-panel CT / ground truth / thresholded prediction
    (ref holdout.py:1136-1163)."""
    plt = _plt()
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, (img, title) in zip(axes, [
        (np.squeeze(ct), "CT"),
        (np.squeeze(actual), "Actual mask"),
        (np.squeeze(predicted) > threshold, f"Predicted (t={threshold:g})"),
    ]):
        ax.imshow(img, cmap="bone")
        ax.set_title(title)
        ax.axis("off")
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def compare_fold_predictions(ct, actual, fold_preds: list, threshold=0.5, path=None):
    """Per-fold prediction gallery (ref 5/6-panel compares,
    task1_crossval_3folds:1322-1363)."""
    plt = _plt()
    n = 2 + len(fold_preds)
    fig, axes = plt.subplots(1, n, figsize=(3 * n, 3.2))
    axes[0].imshow(np.squeeze(ct), cmap="bone")
    axes[0].set_title("CT")
    axes[1].imshow(np.squeeze(actual), cmap="bone")
    axes[1].set_title("Actual")
    for i, pred in enumerate(fold_preds):
        axes[2 + i].imshow(np.squeeze(pred) > threshold, cmap="bone")
        axes[2 + i].set_title(f"Fold {i + 1}")
    for ax in axes:
        ax.axis("off")
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_roc(fpr, tpr, auc_value, path=None):
    plt = _plt()
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.plot(fpr, tpr, label=f"AUC = {auc_value:.4f}")
    ax.plot([0, 1], [0, 1], "--", color="gray")
    ax.set_xlabel("FPR")
    ax.set_ylabel("TPR")
    ax.legend()
    ax.grid(True)
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_probability_distribution(y_true, y_score, threshold=0.5, path=None):
    """Predicted-probability histograms per class with the decision threshold
    — the reference's plot_metric class-distribution panel (task2:919-989)."""
    plt = _plt()
    y = np.asarray(y_true).ravel() > 0.5
    s = np.asarray(y_score).ravel()
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(s[~y], bins=30, alpha=0.6, label="class 0", color="tab:blue")
    ax.hist(s[y], bins=30, alpha=0.6, label="class 1", color="tab:orange")
    ax.axvline(threshold, color="red", linestyle="--", label=f"t={threshold:g}")
    ax.set_xlabel("predicted probability")
    ax.legend()
    ax.grid(True)
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_reliability_diagram(y_true, y_score, y_calibrated=None,
                             n_bins: int = 15, path=None):
    """Confidence-binned observed frequency vs mean confidence (the ECE
    panel), raw and — when given — Platt-calibrated probabilities
    (``metrics.classification.fit_platt``). The diagonal is perfect
    calibration; the task2 classifier's saturated sigmoid shows as points
    far below the diagonal at the right edge."""
    plt = _plt()
    y = np.asarray(y_true).ravel() > 0.5
    edges = np.linspace(0.0, 1.0, n_bins + 1)
    mid = (edges[:-1] + edges[1:]) / 2

    def _bins(p):
        p = np.asarray(p).ravel()
        conf, acc = np.full(n_bins, np.nan), np.full(n_bins, np.nan)
        for i in range(n_bins):
            m = ((p >= edges[i]) if i == 0 else (p > edges[i])) & (p <= edges[i + 1])
            if m.any():
                conf[i], acc[i] = p[m].mean(), y[m].mean()
        return conf, acc

    fig, ax = plt.subplots(figsize=(5, 5))
    ax.plot([0, 1], [0, 1], "--", color="gray", label="perfect")
    c, a = _bins(y_score)
    ax.plot(c, a, "o-", label="raw")
    if y_calibrated is not None:
        c2, a2 = _bins(y_calibrated)
        ax.plot(c2, a2, "s-", label="calibrated")
    ax.set_xlabel("mean predicted probability (bin)")
    ax.set_ylabel("observed infected fraction")
    ax.set_xticks(mid, minor=True)
    ax.legend()
    ax.grid(True)
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_clahe_demo(img01, enhanced=None, path=None):
    """CLAHE before/after demo: original CT + histogram, enhanced CT +
    histogram in a 2×2 grid — the reference's ``clahe_enhancer(img, demo=1)``
    panel (holdout.py:171-194). img01: float [0,1] (H, W); enhanced: optional
    precomputed uint8 CLAHE output (computed here if omitted)."""
    plt = _plt()
    u8 = np.uint8(np.clip(np.asarray(img01, np.float64) * 255.0, 0, 255))
    if enhanced is None:
        from onestop_tpu.ops.clahe import clahe

        enhanced = np.asarray(clahe(u8))
    enhanced = np.asarray(enhanced)
    fig, axes = plt.subplots(2, 2, figsize=(10, 10))
    axes[0, 0].imshow(u8, cmap="bone")
    axes[0, 0].set_title("Original CT-Scan")
    axes[0, 0].axis("off")
    axes[0, 1].hist(u8.ravel())
    axes[0, 1].set_title("Histogram of Original CT-Scan")
    axes[1, 0].imshow(enhanced, cmap="bone")
    axes[1, 0].set_title("CLAHE Enhanced CT-Scan")
    axes[1, 0].axis("off")
    axes[1, 1].hist(enhanced.ravel())
    axes[1, 1].set_title("Histogram of CLAHE Enhanced CT-Scan")
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_cropper_demo(img01, fused=None, mask=None, path=None):
    """ROI-cropper demo: original image, binary mask, fused two-lung crop —
    the reference's ``cropper(img, demo=1)`` panel (holdout.py:249-273; the
    demo branch there is commented out and references an undefined ``thresh``
    — SURVEY.md §8 Q1 — so this is the working form of that intent).
    img01: float [0,1] binary-valued lung mask; fused: optional precomputed
    (250, 250) crop (computed via ops.crop.cropper if omitted)."""
    plt = _plt()
    u8 = np.uint8(np.clip(np.asarray(img01, np.float64) * 255.0, 0, 255))
    if mask is None:
        mask = u8 > 0
    if fused is None:
        from onestop_tpu.ops.crop import cropper

        fused, _, _ = cropper(np.asarray(img01))
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    axes[0].imshow(u8, cmap="bone")
    axes[0].set_title("Original CT-Scan")
    axes[1].imshow(np.asarray(mask), cmap="bone")
    axes[1].set_title("Binary Mask")
    axes[2].imshow(np.asarray(fused), cmap="bone")
    axes[2].set_title("Cropped CT scan after making bounding rectangle")
    for ax in axes:
        ax.axis("off")
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_confusion_matrix(confusion, threshold=0.5, path=None):
    """Confusion-matrix plot — the reference's plot_metric.BinaryClassification
    panel (task2:926-989). confusion: (tn, fp, fn, tp) as produced by
    ``metrics.classification.confusion_at_threshold``."""
    plt = _plt()
    tn, fp, fn, tp = (int(v) for v in confusion)
    cm = np.array([[tn, fp], [fn, tp]])
    fig, ax = plt.subplots(figsize=(5, 4.5))
    im = ax.imshow(cm, cmap="Blues")
    for (i, j), v in np.ndenumerate(cm):
        ax.text(j, i, f"{v:,}", ha="center", va="center",
                color="white" if v > cm.max() / 2 else "black", fontsize=14)
    ax.set_xticks([0, 1], ["pred 0", "pred 1"])
    ax.set_yticks([0, 1], ["true 0", "true 1"])
    ax.set_title(f"Confusion matrix (t={threshold:g})")
    fig.colorbar(im, ax=ax, shrink=0.85)
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_sweep_curves(report: dict, path=None):
    """Threshold-sweep curves from a ``metrics.segmentation.sweep_report``
    dict: coarse+fine dice/IoU vs threshold with the best threshold marked,
    plus the precision/recall grid — the reference's sweep printouts
    (holdout.py:1196-1343) as the plots it never drew."""
    plt = _plt()
    fig, axes = plt.subplots(1, 2, figsize=(12, 4.2))
    for key, style in (("coarse", "o--"), ("fine", "-")):
        res = report[key]
        axes[0].plot(res["thresholds"], res["dice"], style, label=f"dice ({key})")
        axes[0].plot(res["thresholds"], res["iou"], style, label=f"IoU ({key})",
                     alpha=0.7)
    axes[0].axvline(report["best_threshold"], color="red", linestyle=":",
                    label=f"best t={report['best_threshold']:.3f}")
    axes[0].set_xlabel("threshold")
    axes[0].set_title(f"dice/IoU sweep (best dice {report['best_dice']:.4f})")
    axes[0].legend(fontsize=8)
    axes[0].grid(True)
    pr = report["pr"]
    axes[1].plot(pr["thresholds"], pr["precision"], label="precision")
    axes[1].plot(pr["thresholds"], pr["recall"], label="recall")
    axes[1].set_xlabel("threshold")
    axes[1].set_title("precision / recall sweep")
    axes[1].legend()
    axes[1].grid(True)
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_cv_sweep_tables(thresholds, tables: dict, path=None):
    """Per-fold threshold×metric curves — the reference's CV DataFrame
    reports (task1_crossval_3folds:1160-1304) drawn as curves. ``tables``
    maps metric name -> (n_thresholds, n_folds) array."""
    plt = _plt()
    names = list(tables)
    fig, axes = plt.subplots(1, len(names), figsize=(4.2 * len(names), 3.6))
    ths = np.asarray(thresholds)
    for ax, name in zip(np.atleast_1d(axes), names):
        tab = np.asarray(tables[name])
        for f in range(tab.shape[1]):
            ax.plot(ths, tab[:, f], label=f"fold {f + 1}")
        ax.set_xlabel("threshold")
        ax.set_title(name)
        ax.legend(fontsize=8)
        ax.grid(True)
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_cv_training_curves(history, path=None):
    """Per-fold training curves. ``history`` is either the fold-parallel dict
    of (epochs, n_folds) arrays (parallel CV) or a list of per-fold History
    dicts (sequential CV)."""
    plt = _plt()
    if isinstance(history, dict):
        loss = np.asarray(history["loss"])
        val = np.asarray(history.get("val_dice", history.get("val_metric")))
        folds = [(loss[:, f], val[:, f]) for f in range(loss.shape[1])]
    else:
        folds = [(np.asarray(h["loss"]), np.asarray(h["val_metric"]))
                 for h in history]
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    for f, (l, v) in enumerate(folds):
        axes[0].plot(l, label=f"fold {f + 1}")
        axes[1].plot(v, label=f"fold {f + 1}")
    axes[0].set_title("train loss")
    axes[1].set_title("val dice")
    for ax in axes:
        ax.legend(fontsize=8)
        ax.grid(True)
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_lr_schedule(lrs, title="Learning rate", path=None):
    """LR schedule plots (ref holdout.py:941-1035)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(np.asarray(lrs))
    ax.set_xlabel("Epochs")
    ax.set_ylabel("Learning rate")
    ax.set_title(title)
    ax.grid(True)
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_schedule_zoo(path=None, epochs: int = 100):
    """The reference's LR-schedule demo panel (ref holdout.py:941-1035):
    step vs continuous exponential decay, plain cosine annealing, and the
    cosine + exponentially-decaying-max blend, over 100 epochs."""
    from onestop_tpu.train import schedules as S

    plt = _plt()
    es = np.arange(epochs)
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    axes[0].plot(es, [S.step_decay_lr(e) for e in es], "g", label="Step decay")
    axes[0].plot(es, [S.continuous_decay_lr(e) for e in es], "r",
                 label="Continuous decay")
    axes[0].set_title("Exponential decaying learning rate")
    axes[1].plot(es, [S.cosine_annealing_lr(e, eta_max=2e-3) for e in es],
                 "grey", label="Cosine annealing")
    axes[1].plot(es, [S.cosine_exponential_blend_lr(e) for e in es], "c",
                 label="Cosine + exp-decaying max lr")
    axes[1].set_title("Cosine annealing learning rate")
    for ax in axes:
        ax.set_xlabel("Epochs")
        ax.set_ylabel("Learning rates")
        ax.grid(True)
        ax.legend()
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_production_chain(raw_u8, lung_mask, boxes1, boxes2, infection_mask,
                          path=None):
    """Gallery for the chained no-GT pipeline (onestop_tpu.production): raw
    slice -> predicted lung mask -> predicted boxes on the raw slice ->
    infection mask in the crop frame. The reference has no counterpart —
    its pipeline cannot run without ground-truth boxes (SURVEY.md §8 Q2)."""
    plt = _plt()
    import matplotlib.patches as patches

    fig, axes = plt.subplots(1, 4, figsize=(18, 4.6))
    axes[0].imshow(np.asarray(raw_u8), cmap="bone")
    axes[0].set_title("raw CT slice")
    axes[1].imshow(np.asarray(lung_mask), cmap="bone")
    axes[1].set_title("predicted lung mask")
    axes[2].imshow(np.asarray(raw_u8), cmap="bone")
    for b, color in ((boxes1, "tab:orange"), (boxes2, "tab:cyan")):
        x, y, w, h = (float(v) for v in np.asarray(b))
        axes[2].add_patch(patches.Rectangle((x, y), w, h, linewidth=2,
                                            edgecolor=color, facecolor="none"))
    axes[2].set_title("predicted lung boxes")
    axes[3].imshow(np.asarray(infection_mask), cmap="bone")
    axes[3].set_title("infection mask (crop frame)")
    for ax in axes:
        ax.axis("off")
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig
