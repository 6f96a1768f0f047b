"""Single-pass multi-threshold segmentation metrics.

The reference sweeps sigmoid thresholds by *recompiling the Keras model and
re-running a full validation pass per (threshold, metric) pair* — 120–160
passes in the CV scripts (``holdout.py:1196-1343``,
``task1_crossval_3folds_unet.py:1160-1304``). Here one forward pass produces
probabilities once, and a vmap over the threshold grid reduces
dice/IoU/precision/recall for every threshold simultaneously on device.

Semantics match ``segmentation_models`` metrics (smooth=1e-5; predictions
thresholded with strict ``>``, ground truth left continuous — the
reference's masks contain gray interpolation values, SURVEY.md §8 Q8) and
Keras ``evaluate`` batch averaging: per-batch metric values averaged
weighted by batch size (``batch_size=32`` default). Set ``batch_size=None``
for a single global aggregation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SMOOTH = 1e-5  # segmentation_models default
Array = jax.Array


def _batch_stats(y_true: Array, y_pred: Array, thresholds: Array):
    """Per-threshold (intersection, gt_sum, pr_sum, tp, fp, fn) over one batch.

    y_true: (B, ...) continuous in [0,1]; y_pred: (B, ...) probabilities.
    Returns arrays of shape (T,).
    """
    t = y_true.reshape(-1).astype(jnp.float32)
    p = y_pred.reshape(-1).astype(jnp.float32)

    def one(th):
        pr = (p > th).astype(jnp.float32)
        inter = jnp.sum(t * pr)
        return inter, jnp.sum(t), jnp.sum(pr)

    inter, gt, pr = jax.vmap(one)(thresholds)
    return inter, gt, pr


def _metrics_from_stats(inter, gt, pr):
    dice = (2.0 * inter + SMOOTH) / (gt + pr + SMOOTH)
    iou = (inter + SMOOTH) / (gt + pr - inter + SMOOTH)
    precision = (inter + SMOOTH) / (pr + SMOOTH)
    recall = (inter + SMOOTH) / (gt + SMOOTH)
    return dice, iou, precision, recall


@functools.partial(jax.jit, static_argnames=("batch_size",))
def _sweep_device(y_true, y_pred, thresholds, batch_size):
    n = y_true.shape[0]
    if batch_size is None:
        inter, gt, pr = _batch_stats(y_true, y_pred, thresholds)
        return jnp.stack(_metrics_from_stats(inter, gt, pr))

    n_batches = -(-n // batch_size)
    pad = n_batches * batch_size - n
    yt = jnp.concatenate([y_true, jnp.zeros((pad,) + y_true.shape[1:], y_true.dtype)])
    yp = jnp.concatenate([y_pred, jnp.zeros((pad,) + y_pred.shape[1:], y_pred.dtype)])
    yt = yt.reshape((n_batches, batch_size) + y_true.shape[1:])
    yp = yp.reshape((n_batches, batch_size) + y_pred.shape[1:])
    counts = jnp.minimum(
        jnp.maximum(n - jnp.arange(n_batches) * batch_size, 0), batch_size
    ).astype(jnp.float32)

    def per_batch(t, p, cnt):
        # zero out padded samples inside the final batch
        mask = (jnp.arange(batch_size) < cnt).astype(jnp.float32)
        shape = (batch_size,) + (1,) * (t.ndim - 1)
        t = t * mask.reshape(shape)
        p = p * mask.reshape(shape)
        inter, gt, pr = _batch_stats(t, p, thresholds)
        return jnp.stack(_metrics_from_stats(inter, gt, pr))  # (4, T)

    vals = jax.vmap(per_batch)(yt, yp, counts)  # (n_batches, 4, T)
    w = counts / jnp.sum(counts)
    return jnp.einsum("b,bmt->mt", w, vals)


def threshold_sweep(
    y_true,
    y_pred,
    thresholds,
    batch_size: int | None = 32,
) -> dict[str, np.ndarray]:
    """Dice/IoU/precision/recall for every threshold in one device pass.

    Returns dict of (T,) numpy arrays keyed 'dice', 'iou', 'precision',
    'recall', plus 'thresholds'.
    """
    thresholds = jnp.asarray(np.asarray(thresholds, np.float32))
    out = _sweep_device(jnp.asarray(y_true), jnp.asarray(y_pred), thresholds, batch_size)
    out = np.asarray(out)
    return {
        "thresholds": np.asarray(thresholds),
        "dice": out[0],
        "iou": out[1],
        "precision": out[2],
        "recall": out[3],
    }


def grid(lo: float, hi: float, step: float) -> np.ndarray:
    """np.arange-compatible sweep grid (ref uses np.arange(lo, hi, step))."""
    return np.arange(lo, hi, step, dtype=np.float32)


def sweep_report(y_true, y_pred, coarse=(0.10, 0.80, 0.05), fine=(0.52, 0.60, 0.001),
                 pr_grid=(0.0, 1.0, 0.05), batch_size: int | None = 32) -> dict:
    """The reference's full three-stage sweep (coarse dice/IoU -> fine ->
    precision/recall grid, ``holdout.py:1196-1343``) as one report dict."""
    coarse_res = threshold_sweep(y_true, y_pred, grid(*coarse), batch_size)
    fine_res = threshold_sweep(y_true, y_pred, grid(*fine), batch_size)
    pr_res = threshold_sweep(y_true, y_pred, grid(*pr_grid), batch_size)
    best_i = int(np.argmax(fine_res["dice"]))
    return {
        "coarse": coarse_res,
        "fine": fine_res,
        "pr": pr_res,
        "best_threshold": float(fine_res["thresholds"][best_i]),
        "best_dice": float(fine_res["dice"][best_i]),
        "best_iou": float(fine_res["iou"][best_i]),
        "precision_at_best": float(fine_res["precision"][best_i]),
        "recall_at_best": float(fine_res["recall"][best_i]),
    }
