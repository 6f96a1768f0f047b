"""Image resize as dense weight-matrix matmuls — the TPU-native formulation.

The reference resizes every CT slice with ``cv2.resize`` (INTER_AREA at
``holdout.py:294,335,355-357``; INTER_LINEAR at ``holdout.py:486-488``),
one host call per slice. On TPU, a separable resize is two small matmuls

    out = W_rows @ img @ W_cols.T

which run on the MXU and fuse with neighboring ops under XLA. The weight
matrices are built from ``iota`` arithmetic, so they also work with *traced*
crop offsets/sizes — that is what makes the fused dynamic crop+resize
(`crop_resize`) possible inside ``jit`` with fully static shapes.

Semantics verified bit-for-bit (float) / ±1 LSB (uint8 fixed-point) against
OpenCV in ``tests/test_resize.py``:

- INTER_AREA == overlap weights  w[i,r] = |[r,r+1) ∩ [i·s,(i+1)·s)| / s
  for *all* scale factors (OpenCV's general resizeArea path).
- INTER_LINEAR == 2-tap weights at src = (i+0.5)·s − 0.5, clamped to borders.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# Static weight matrices (numpy, cached) — for fixed-shape resizes.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def area_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) INTER_AREA overlap weights (rows sum to 1)."""
    s = n_in / n_out
    i = np.arange(n_out, dtype=np.float64)[:, None]
    r = np.arange(n_in, dtype=np.float64)[None, :]
    lo, hi = i * s, (i + 1.0) * s
    w = np.clip(np.minimum(r + 1.0, hi) - np.maximum(r, lo), 0.0, None) / s
    return np.ascontiguousarray(w)


@functools.lru_cache(maxsize=None)
def linear_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) INTER_LINEAR 2-tap weights with border clamping."""
    s = n_in / n_out
    src = np.clip((np.arange(n_out, dtype=np.float64) + 0.5) * s - 0.5, 0.0, n_in - 1.0)
    f = np.floor(src).astype(np.int64)
    c = np.minimum(f + 1, n_in - 1)
    a = src - f
    w = np.zeros((n_out, n_in), dtype=np.float64)
    np.add.at(w, (np.arange(n_out), f), 1.0 - a)
    np.add.at(w, (np.arange(n_out), c), a)
    return w


# ---------------------------------------------------------------------------
# Traced weight matrices — crop window (start, size) may be traced scalars.
# ---------------------------------------------------------------------------

def _dyn_area_weights(n_in: int, n_out: int, start, size) -> Array:
    """(n_out, n_in) area weights for resampling the window [start, start+size)
    of an n_in-long axis down/up to n_out samples. start/size may be traced."""
    start = jnp.asarray(start, jnp.float32)
    size = jnp.asarray(size, jnp.float32)
    s = size / n_out
    i = jax.lax.broadcasted_iota(jnp.float32, (n_out, n_in), 0)
    r = jax.lax.broadcasted_iota(jnp.float32, (n_out, n_in), 1)
    lo = start + i * s
    hi = start + (i + 1.0) * s
    w = jnp.clip(jnp.minimum(r + 1.0, hi) - jnp.maximum(r, lo), 0.0, None)
    return w / jnp.maximum(s, 1e-30)


def _dyn_linear_weights(n_in: int, n_out: int, start, size) -> Array:
    """(n_out, n_in) 2-tap linear weights for the window [start, start+size).
    Border clamping happens at the *window* edges (crop-then-resize parity)."""
    start = jnp.asarray(start, jnp.float32)
    size = jnp.asarray(size, jnp.float32)
    s = size / n_out
    i = jnp.arange(n_out, dtype=jnp.float32)
    src = start + jnp.clip((i + 0.5) * s - 0.5, 0.0, jnp.maximum(size - 1.0, 0.0))
    f = jnp.floor(src)
    a = src - f
    last = start + jnp.maximum(size - 1.0, 0.0)
    c = jnp.minimum(f + 1.0, last)
    r = jax.lax.broadcasted_iota(jnp.float32, (n_out, n_in), 1)
    w = (1.0 - a)[:, None] * (r == f[:, None]) + a[:, None] * (r == jnp.floor(c)[:, None])
    return w


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _apply_sep(img: Array, wr: Array, wc: Array, precision=None) -> Array:
    """Apply row/col weight matrices to (..., H, W) or (..., H, W, C).

    Defaults to Precision.HIGHEST: resize weights are fp32 and TPU matmuls
    would otherwise round through bf16. Pass precision explicitly on the
    throughput path if bf16 is acceptable there.
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    x = jnp.asarray(img, jnp.float32)
    wr = wr.astype(jnp.float32)
    wc = wc.astype(jnp.float32)
    if x.ndim >= 3 and x.shape[-1] <= 8:  # channels-last layout
        y = jnp.einsum("oh,...hwc->...owc", wr, x, precision=precision)
        y = jnp.einsum("pw,...owc->...opc", wc, y, precision=precision)
    else:
        y = jnp.einsum("oh,...hw->...ow", wr, x, precision=precision)
        y = jnp.einsum("pw,...ow->...op", wc, y, precision=precision)
    return y


def resize2d(img: Array, out_hw: tuple[int, int], method: str = "area") -> Array:
    """Resize the trailing spatial dims of ``img`` to ``out_hw``.

    method: "area" (cv2.INTER_AREA parity) or "linear" (cv2.INTER_LINEAR).
    Accepts (H, W), (H, W, C≤8) or batched leading dims. Returns float32.
    """
    if img.ndim >= 3 and img.shape[-1] <= 8:
        h, w = img.shape[-3], img.shape[-2]
    else:
        h, w = img.shape[-2], img.shape[-1]
    oh, ow = out_hw
    make = area_weights if method == "area" else linear_weights
    wr = jnp.asarray(make(h, oh), jnp.float32)
    wc = jnp.asarray(make(w, ow), jnp.float32)
    return _apply_sep(img, wr, wc)


def crop_resize(
    img: Array,
    box,
    out_hw: tuple[int, int],
    method: str = "area",
    precision=None,
) -> Array:
    """Fused dynamic crop + resize, fully static shapes (jit/vmap friendly).

    ``box = (x, y, w, h)`` in the reference's cv2.boundingRect convention
    (x = col offset, y = row offset) — may be traced scalars. Equivalent to
    ``cv2.resize(img[y:y+h, x:x+w], (out_w, out_h), method)`` but runs as two
    MXU matmuls with no dynamic shapes (ref crop at ``holdout.py:352-358``).
    """
    x, y, w, h = box
    oh, ow = out_hw
    if img.ndim >= 3 and img.shape[-1] <= 8:
        H, W = img.shape[-3], img.shape[-2]
    else:
        H, W = img.shape[-2], img.shape[-1]
    make = _dyn_area_weights if method == "area" else _dyn_linear_weights
    wr = make(H, oh, y, h)
    wc = make(W, ow, x, w)
    return _apply_sep(img, wr, wc, precision=precision)


def to_uint8(x: Array) -> Array:
    """Round-and-saturate to uint8 (cv2 saturate_cast parity within ±1 LSB)."""
    return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)
