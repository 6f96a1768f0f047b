"""Loss family with Keras-parity semantics (ref ``holdout.py:784-847``,
classification metrics ``task2:688-703``).

All functions take probabilities (the models end in sigmoid, as the
reference's do) and accept an optional per-sample ``weights`` vector so a
padded final batch reproduces Keras's variable last-batch behavior exactly
(Keras runs a smaller final batch; we run a fixed-shape batch with zero
weights on the padding — same arithmetic, static shapes).

Numerics: K.epsilon() == 1e-7; binary_crossentropy clips probabilities to
[eps, 1-eps] like Keras's prob->logit path.

Data parallelism: every loss/metric here reduces over the *whole batch*
(dice sums, BCE weighted means). Under a sharded batch, passing
``axis_name='data'`` makes those reductions global (``lax.psum`` across the
mesh axis), so the loss VALUE — and therefore its gradients, after the
trainer psums the per-shard contributions — is bit-for-bit the single-device
batch-global quantity. Splitting a dice loss per shard and averaging would
be a *different* loss; this keeps the reference's batch-global semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPSILON = 1e-7  # Keras K.epsilon()
Array = jax.Array


def _sample_weights(y_true: Array, weights: Array | None) -> Array:
    if weights is None:
        return jnp.ones((y_true.shape[0],), jnp.float32)
    return weights.astype(jnp.float32)


def _broadcast(w: Array, ndim: int) -> Array:
    return w.reshape((-1,) + (1,) * (ndim - 1))


def _gsum(x: Array, axis_name: str | None) -> Array:
    """Batch-global sum: local sum, then psum over the DP mesh axis if any."""
    s = jnp.sum(x)
    return jax.lax.psum(s, axis_name) if axis_name else s


def binary_crossentropy(y_true: Array, y_pred: Array, weights: Array | None = None,
                        axis_name: str | None = None) -> Array:
    """Mean elementwise BCE on clipped probabilities (Keras semantics)."""
    p = jnp.clip(y_pred, EPSILON, 1.0 - EPSILON)
    ce = -(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log(1.0 - p))
    w = _broadcast(_sample_weights(y_true, weights), y_true.ndim)
    per_elem = jnp.ones_like(ce) * w
    return _gsum(ce * w, axis_name) / jnp.maximum(_gsum(per_elem, axis_name), EPSILON)


def dice_coeff(y_true: Array, y_pred: Array, weights: Array | None = None, smooth: float = 1.0,
               axis_name: str | None = None) -> Array:
    """Soft dice over the whole (weighted) batch, smooth=1 (ref :784-790)."""
    w = _broadcast(_sample_weights(y_true, weights), y_true.ndim)
    t = (y_true * w).astype(jnp.float32)
    p = (y_pred * w).astype(jnp.float32)
    intersection = _gsum(t * y_pred, axis_name)
    return (2.0 * intersection + smooth) / (_gsum(t, axis_name) + _gsum(p, axis_name) + smooth)


def dice_loss(y_true: Array, y_pred: Array, weights: Array | None = None,
              axis_name: str | None = None) -> Array:
    return 1.0 - dice_coeff(y_true, y_pred, weights, axis_name=axis_name)


def bce_dice_loss(y_true: Array, y_pred: Array, weights: Array | None = None,
                  axis_name: str | None = None) -> Array:
    """0.5·BCE + 0.5·dice_loss (ref :797-799) — the segmentation loss."""
    return (0.5 * binary_crossentropy(y_true, y_pred, weights, axis_name=axis_name)
            + 0.5 * dice_loss(y_true, y_pred, weights, axis_name=axis_name))


def tversky_loss(y_true: Array, y_pred: Array, weights: Array | None = None,
                 alpha: float = 0.5, beta: float = 0.5,
                 axis_name: str | None = None) -> Array:
    """Tversky over spatial+batch axes per channel, Ncl - sum(T) (ref :801-817).

    weights: per-sample batch mask (padded-batch support — masked rows
    contribute nothing to any of the four sums); axis_name: psum the
    per-channel sums across the DP axis (batch-global semantics)."""
    w = _broadcast(_sample_weights(y_true, weights), y_true.ndim)
    p0, g0 = y_pred * w, y_true * w
    p1, g1 = (1.0 - y_pred) * w, (1.0 - y_true) * w
    axes = tuple(range(y_true.ndim - 1))
    num = jnp.sum(p0 * g0, axes)
    den_a = jnp.sum(p0 * g1, axes)
    den_b = jnp.sum(p1 * g0, axes)
    if axis_name:
        num = jax.lax.psum(num, axis_name)
        den_a = jax.lax.psum(den_a, axis_name)
        den_b = jax.lax.psum(den_b, axis_name)
    t = jnp.sum(num / (num + alpha * den_a + beta * den_b))
    ncl = jnp.asarray(y_true.shape[-1], jnp.float32)
    return ncl - t


def weighted_bce_loss(y_true: Array, y_pred: Array, weight: Array,
                      axis_name: str | None = None) -> Array:
    """Logit-space numerically-stable weighted BCE (ref :819-825)."""
    p = jnp.clip(y_pred, EPSILON, 1.0 - EPSILON)
    logit = jnp.log(p / (1.0 - p))
    loss = weight * (
        logit * (1.0 - y_true)
        + jnp.log1p(jnp.exp(-jnp.abs(logit)))
        + jnp.maximum(-logit, 0.0)
    )
    return _gsum(loss, axis_name) / _gsum(weight, axis_name)


def weighted_dice_loss(y_true: Array, y_pred: Array, weight: Array, smooth: float = 1.0,
                       axis_name: str | None = None) -> Array:
    """(ref :827-833)"""
    intersection = y_true * y_pred
    score = (2.0 * _gsum(weight * intersection, axis_name) + smooth) / (
        _gsum(weight * y_true, axis_name) + _gsum(weight * y_pred, axis_name) + smooth
    )
    return 1.0 - score


def weighted_bce_dice_loss(y_true: Array, y_pred: Array, weights: Array | None = None,
                           axis_name: str | None = None) -> Array:
    """Boundary-weighted BCE-dice: weight map from a 50×50 same-padded
    average pool of the target (ref :835-847). NHWC input.

    weights: per-sample batch mask (padded rows drop out of the weight map's
    normalization and both loss terms); axis_name: batch-global sums."""
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    m = _broadcast(_sample_weights(y_true, weights), y_true.ndim)
    pooled = jax.lax.reduce_window(
        y_true, 0.0, jax.lax.add, (1, 50, 50, 1), (1, 1, 1, 1), "SAME"
    )
    counts = jax.lax.reduce_window(
        jnp.ones_like(y_true), 0.0, jax.lax.add, (1, 50, 50, 1), (1, 1, 1, 1), "SAME"
    )
    averaged = pooled / counts
    w0 = _gsum(m, axis_name)
    weight = 5.0 * jnp.exp(-5.0 * jnp.abs(averaged - 0.5)) * m
    weight = weight * (w0 / _gsum(weight, axis_name))
    return (0.5 * weighted_bce_loss(y_true, y_pred, weight, axis_name=axis_name)
            + 0.5 * dice_loss(y_true, y_pred, weights, axis_name=axis_name))


# --- classification metrics (batchwise, K.round/K.clip semantics) ----------

def recall_metric(y_true: Array, y_pred: Array, axis_name: str | None = None) -> Array:
    tp = _gsum(jnp.round(jnp.clip(y_true * y_pred, 0, 1)), axis_name)
    possible = _gsum(jnp.round(jnp.clip(y_true, 0, 1)), axis_name)
    return tp / (possible + EPSILON)


def precision_metric(y_true: Array, y_pred: Array, axis_name: str | None = None) -> Array:
    tp = _gsum(jnp.round(jnp.clip(y_true * y_pred, 0, 1)), axis_name)
    predicted = _gsum(jnp.round(jnp.clip(y_pred, 0, 1)), axis_name)
    return tp / (predicted + EPSILON)


def f1_metric(y_true: Array, y_pred: Array, axis_name: str | None = None) -> Array:
    p = precision_metric(y_true, y_pred, axis_name=axis_name)
    r = recall_metric(y_true, y_pred, axis_name=axis_name)
    return 2.0 * (p * r) / (p + r + EPSILON)


def balanced_class_weights(y: Array) -> Array:
    """sklearn class_weight='balanced': n / (n_classes * bincount)
    (ref task2:801-804). Returns (w_neg, w_pos)."""
    y = jnp.asarray(y).astype(jnp.int32).ravel()
    n = y.shape[0]
    pos = jnp.sum(y)
    neg = n - pos
    return jnp.stack([n / (2.0 * neg), n / (2.0 * pos)])


LOSSES = {
    "bce_dice": bce_dice_loss,
    "bce": binary_crossentropy,
    "dice": dice_loss,
    "tversky": tversky_loss,
    "weighted_bce_dice": weighted_bce_dice_loss,
}
