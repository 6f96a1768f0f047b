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
