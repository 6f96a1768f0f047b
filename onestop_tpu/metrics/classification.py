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


def fit_temperature(y_true, y_prob, eps: float = 1e-7) -> float:
    """Temperature scaling (Guo et al., "On Calibration of Modern Neural
    Networks", 2017): the single scalar T > 0 minimizing binary NLL of
    sigmoid(logit(p) / T) on held-out data.

    Motivation here: the task2 classifier's sigmoid sits saturated-high
    (probs ~0.99+ on most slices — RESULTS.md), which is why the reference
    had to hand-pick its 0.81 report threshold (ref task2:957-989). T > 1
    softens exactly that overconfidence; AUC/ranking are unchanged (the map
    is monotone), only probability calibration moves.

    Log-spaced grid bracket + golden-section refinement — no scipy, exact
    enough (NLL in T is smooth and unimodal for binary temperature scaling).
    """
    y = np.asarray(y_true).ravel().astype(np.float64)
    p = np.clip(np.asarray(y_prob).ravel().astype(np.float64), eps, 1 - eps)
    z = np.log(p) - np.log1p(-p)

    def nll(t):
        q = np.clip(1.0 / (1.0 + np.exp(-z / t)), eps, 1 - eps)
        return float(-np.mean(y * np.log(q) + (1 - y) * np.log1p(-q)))

    grid = np.logspace(-2, 2, 81)
    i = int(np.argmin([nll(t) for t in grid]))
    a, b = grid[max(i - 1, 0)], grid[min(i + 1, len(grid) - 1)]
    gr = (np.sqrt(5.0) - 1.0) / 2.0
    c, d = b - gr * (b - a), a + gr * (b - a)
    for _ in range(60):
        if nll(c) < nll(d):
            b, d = d, c
            c = b - gr * (b - a)
        else:
            a, c = c, d
            d = a + gr * (b - a)
    return float((a + b) / 2.0)


def apply_temperature(y_prob, temperature: float, eps: float = 1e-7):
    """sigmoid(logit(p) / T) — the calibrated probabilities."""
    p = np.clip(np.asarray(y_prob, np.float64), eps, 1 - eps)
    z = np.log(p) - np.log1p(-p)
    return 1.0 / (1.0 + np.exp(-z / float(temperature)))


def fit_platt(y_true, y_prob, eps: float = 1e-7,
              n_iter: int = 100) -> tuple[float, float]:
    """Platt scaling (Platt 1999): (a, b) minimizing binary NLL of
    sigmoid(a·logit(p) + b). Strictly more expressive than temperature
    scaling (a = 1/T, b = 0): the bias term is what a *shifted* saturated
    distribution needs — the task2 classifier parks negatives at ~0.95, and
    no T > 0 can move 0.95 below 0.5 (logit sign is T-invariant), while b
    re-centers it. Newton's method on the convex 2-parameter NLL."""
    y = np.asarray(y_true).ravel().astype(np.float64)
    p = np.clip(np.asarray(y_prob).ravel().astype(np.float64), eps, 1 - eps)
    z = np.log(p) - np.log1p(-p)
    a, b = 1.0, 0.0
    for _ in range(n_iter):
        q = 1.0 / (1.0 + np.exp(-(a * z + b)))
        ga, gb = np.mean((q - y) * z), np.mean(q - y)
        w = np.maximum(q * (1.0 - q), 1e-12)
        haa, hab, hbb = np.mean(w * z * z) + 1e-9, np.mean(w * z), np.mean(w) + 1e-9
        det = haa * hbb - hab * hab
        da = (hbb * ga - hab * gb) / det
        db = (haa * gb - hab * ga) / det
        a, b = a - da, b - db
        if abs(da) + abs(db) < 1e-10:
            break
    return float(a), float(b)


def apply_platt(y_prob, a: float, b: float, eps: float = 1e-7):
    """sigmoid(a·logit(p) + b) — Platt-calibrated probabilities."""
    p = np.clip(np.asarray(y_prob, np.float64), eps, 1 - eps)
    z = np.log(p) - np.log1p(-p)
    return 1.0 / (1.0 + np.exp(-(float(a) * z + float(b))))


def expected_calibration_error(y_true, y_prob, n_bins: int = 15) -> float:
    """ECE: confidence-binned |accuracy − mean confidence|, weighted by bin
    mass (the standard 15-bin protocol). 0 = perfectly calibrated."""
    y = np.asarray(y_true).ravel() > 0.5
    p = np.asarray(y_prob).ravel().astype(np.float64)
    edges = np.linspace(0.0, 1.0, n_bins + 1)
    ece = 0.0
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = (p > lo) & (p <= hi) if lo > 0 else (p >= lo) & (p <= hi)
        if not m.any():
            continue
        ece += m.mean() * abs(float(y[m].mean()) - float(p[m].mean()))
    return float(ece)


def classification_report(y_true, y_score, thresholds=(0.50, 0.81),
                          search_best: bool = True,
                          calibrate: bool = True) -> dict:
    """The reference's manual report (ref task2:919-989): per threshold the
    confusion matrix and accuracy/precision/recall/F1, plus overall AUC.
    search_best additionally runs ``best_threshold`` (accuracy) — the
    reference's by-hand 0.81-finding step, automated.

    calibrate adds temperature scaling fitted on the SAME data: ``temperature``,
    ECE before/after, and the calibrated-probability stats at 0.50. Like the
    reference's 0.81 (picked off this set's ROC plot), the fit is in-sample
    for the evaluation split — use the returned temperature on future data."""
    out = {"auc": float(roc_auc(jnp.asarray(y_true), jnp.asarray(y_score)))}
    out["at_threshold"] = {float(t): _threshold_stats(y_true, y_score, t)
                           for t in thresholds}
    if search_best:
        t, stats = best_threshold(y_true, y_score, metric="accuracy")
        out["best_threshold"] = t
        out["at_best_threshold"] = stats
    if calibrate:
        temp = fit_temperature(y_true, y_score)
        a, b = fit_platt(y_true, y_score)
        cal = apply_platt(y_score, a, b)
        out["calibration"] = {
            "temperature": temp,
            "platt_a": a,
            "platt_b": b,
            "ece_raw": expected_calibration_error(y_true, y_score),
            "ece_calibrated": expected_calibration_error(y_true, cal),
            "at_0.50_calibrated": _threshold_stats(y_true, cal, 0.50),
        }
    return out
