"""Classification evaluation: ROC-AUC (rank-based, tie-averaged — sklearn
``roc_auc_score`` parity), ROC curve points, confusion matrix and the
acc/precision/recall/F1 report the reference derives manually from TP/FP/FN/TN
at thresholds 0.50 and 0.81 (``task2:919-989``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@jax.jit
def roc_auc(y_true: Array, y_score: Array) -> Array:
    """Mann-Whitney U formulation with average ranks for ties
    (== sklearn.metrics.roc_auc_score on binary labels)."""
    y = jnp.asarray(y_true).ravel().astype(jnp.float32)
    s = jnp.asarray(y_score).ravel().astype(jnp.float32)
    n = s.shape[0]
    order = jnp.argsort(s)
    sorted_s = s[order]
    ranks_sorted = jnp.arange(1, n + 1, dtype=jnp.float32)
    # average ranks across tied groups: group by equal score
    is_new = jnp.concatenate([jnp.array([True]), sorted_s[1:] != sorted_s[:-1]])
    group_id = jnp.cumsum(is_new) - 1
    group_sum = jax.ops.segment_sum(ranks_sorted, group_id, num_segments=n)
    group_cnt = jax.ops.segment_sum(jnp.ones_like(ranks_sorted), group_id, num_segments=n)
    avg_rank_sorted = (group_sum / jnp.maximum(group_cnt, 1.0))[group_id]
    ranks = jnp.zeros(n, jnp.float32).at[order].set(avg_rank_sorted)
    npos = jnp.sum(y)
    nneg = n - npos
    auc = (jnp.sum(ranks * y) - npos * (npos + 1) / 2.0) / jnp.maximum(npos * nneg, 1.0)
    return auc


def roc_curve_points(y_true, y_score, n_thresholds: int = 201):
    """(fpr, tpr, thresholds) on a uniform threshold grid (plot-ready)."""
    y = np.asarray(y_true).ravel().astype(np.float32)
    s = np.asarray(y_score).ravel().astype(np.float32)
    ths = np.linspace(0.0, 1.0, n_thresholds, dtype=np.float32)
    pred = s[None, :] > ths[:, None]
    tp = (pred & (y > 0.5)).sum(1)
    fp = (pred & (y <= 0.5)).sum(1)
    npos = (y > 0.5).sum()
    nneg = len(y) - npos
    return fp / max(nneg, 1), tp / max(npos, 1), ths


def confusion_at_threshold(y_true, y_score, threshold: float = 0.5):
    """(tn, fp, fn, tp) with predictions y_score > threshold."""
    y = np.asarray(y_true).ravel() > 0.5
    p = np.asarray(y_score).ravel() > threshold
    tp = int(np.sum(p & y))
    tn = int(np.sum(~p & ~y))
    fp = int(np.sum(p & ~y))
    fn = int(np.sum(~p & y))
    return tn, fp, fn, tp


def _threshold_stats(y_true, y_score, t: float) -> dict:
    tn, fp, fn, tp = confusion_at_threshold(y_true, y_score, t)
    acc = (tp + tn) / max(tp + tn + fp + fn, 1)
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-12)
    return {"confusion": (tn, fp, fn, tp), "accuracy": acc,
            "precision": prec, "recall": rec, "f1": f1}


def best_threshold(y_true, y_score, metric: str = "accuracy",
                   n_thresholds: int = 999) -> tuple[float, dict]:
    """Search a uniform threshold grid for the best ``metric`` — the step
    the reference performed by hand to find its 0.81 (ref ``task2:957-989``
    evaluates a second BinaryClassification at the threshold read off the
    ROC plot; README.md advertises the 0.81 numbers). One vectorized pass.

    Returns (threshold, stats_at_threshold)."""
    y = np.asarray(y_true).ravel() > 0.5
    s = np.asarray(y_score).ravel()
    ths = np.linspace(0.001, 0.999, n_thresholds)
    pred = s[None, :] > ths[:, None]
    tp = (pred & y).sum(1).astype(np.float64)
    fp = (pred & ~y).sum(1).astype(np.float64)
    fn = (~pred & y).sum(1).astype(np.float64)
    tn = (~pred & ~y).sum(1).astype(np.float64)
    acc = (tp + tn) / np.maximum(tp + tn + fp + fn, 1)
    prec = tp / np.maximum(tp + fp, 1)
    rec = tp / np.maximum(tp + fn, 1)
    f1 = 2 * prec * rec / np.maximum(prec + rec, 1e-12)
    scores = {"accuracy": acc, "precision": prec, "recall": rec, "f1": f1}[metric]
    t = float(ths[int(np.argmax(scores))])
    return t, _threshold_stats(y_true, y_score, t)


def classification_report(y_true, y_score, thresholds=(0.50, 0.81),
                          search_best: bool = True) -> dict:
    """The reference's manual report (ref task2:919-989): per threshold the
    confusion matrix and accuracy/precision/recall/F1, plus overall AUC.
    search_best additionally runs ``best_threshold`` (accuracy) — the
    reference's by-hand 0.81-finding step, automated."""
    out = {"auc": float(roc_auc(jnp.asarray(y_true), jnp.asarray(y_score)))}
    out["at_threshold"] = {float(t): _threshold_stats(y_true, y_score, t)
                           for t in thresholds}
    if search_best:
        t, stats = best_threshold(y_true, y_score, metric="accuracy")
        out["best_threshold"] = t
        out["at_best_threshold"] = stats
    return out
