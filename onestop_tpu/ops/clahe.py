"""CLAHE (Contrast-Limited Adaptive Histogram Equalization), TPU-native.

Replaces the reference's per-slice ``cv2.createCLAHE(clipLimit=3.0,
tileGridSize=(8,8)).apply`` call (``holdout.py:163-194``) with a jittable,
vmappable JAX implementation of the exact OpenCV algorithm:

1. pad to a tile-grid multiple with BORDER_REFLECT_101,
2. per-tile 256-bin histogram,
3. clip at ``max(int(clip·tileArea/256), 1)``, redistribute the excess
   (uniform batch + residual spread at stride ``max(256//residual, 1)``),
4. LUT = round_half_even(cdf · 255/tileArea),
5. bilinear interpolation between the 4 neighboring tile LUTs.

Histograms are computed with a compare/one-hot reduction (VPU-friendly) and
the 4 LUT lookups vectorize as gathers; the Pallas kernel in
``clahe_pallas.py`` reformulates both as MXU matmuls for the hot path.
Parity vs OpenCV is exact (bit-for-bit) — see ``tests/test_clahe.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

_NBINS = 256


def _reflect101_pad(img: Array, ph: int, pw: int) -> Array:
    """Pad bottom/right by (ph, pw) with BORDER_REFLECT_101 (cv2 default)."""
    if ph == 0 and pw == 0:
        return img
    return jnp.pad(img, ((0, ph), (0, pw)), mode="reflect")


def _tile_histograms(tiles: Array) -> Array:
    """tiles: (T, P) uint8/int32 -> (T, 256) int32 histograms."""
    pix = tiles.astype(jnp.int32)
    bins = jnp.arange(_NBINS, dtype=jnp.int32)
    # (T, P, 256) compare -> sum over pixels. XLA fuses this reduction.
    return jnp.sum(pix[:, :, None] == bins[None, None, :], axis=1, dtype=jnp.int32)


def _clip_redistribute(hist: Array, clip_limit: float, tile_area: int) -> Array:
    """OpenCV histogram clipping + excess redistribution. hist: (T, 256)."""
    if clip_limit <= 0:
        return hist
    climit = max(int(clip_limit * tile_area / _NBINS), 1)
    excess = jnp.sum(jnp.maximum(hist - climit, 0), axis=1, keepdims=True)
    h = jnp.minimum(hist, climit)
    h = h + excess // _NBINS
    residual = (excess % _NBINS)  # (T, 1)
    step = jnp.maximum(_NBINS // jnp.maximum(residual, 1), 1)
    idx = jnp.arange(_NBINS, dtype=jnp.int32)[None, :]
    bump = ((idx % step) == 0) & ((idx // step) < residual) & (residual > 0)
    return h + bump.astype(jnp.int32)


def clahe_lut(
    img: Array,
    clip_limit: float = 3.0,
    grid: tuple[int, int] = (8, 8),
) -> tuple[Array, tuple[int, int]]:
    """Compute per-tile LUTs for a uint8 image.

    Returns (luts of shape (gy, gx, 256) uint8, (tile_h, tile_w)) where the
    tile size is that of the REFLECT_101-padded image (cv2 semantics).
    """
    gy, gx = grid
    h, w = img.shape
    th = -(-h // gy)
    tw = -(-w // gx)
    padded = _reflect101_pad(img, th * gy - h, tw * gx - w)
    tiles = padded.reshape(gy, th, gx, tw).transpose(0, 2, 1, 3).reshape(gy * gx, th * tw)
    hist = _tile_histograms(tiles)
    hist = _clip_redistribute(hist, clip_limit, th * tw)
    scale = (_NBINS - 1.0) / (th * tw)
    lut = jnp.round(jnp.cumsum(hist, axis=1) * scale)  # round half-to-even == cvRound
    lut = jnp.clip(lut, 0, 255).astype(jnp.uint8)
    return lut.reshape(gy, gx, _NBINS), (th, tw)


@functools.partial(jax.jit, static_argnames=("clip_limit", "grid"))
def clahe(
    img: Array,
    clip_limit: float = 3.0,
    grid: tuple[int, int] = (8, 8),
) -> Array:
    """Apply CLAHE to a single (H, W) uint8 image. Returns uint8.

    Bit-exact vs ``cv2.createCLAHE(clipLimit, tileGridSize).apply`` — the
    reference calls this with clip 3.0 and an 8×8 grid on 512² slices
    (``holdout.py:169-170``). vmap over the leading axis for batches.
    """
    img = img.astype(jnp.uint8)
    gy, gx = grid
    h, w = img.shape
    luts, (th, tw) = clahe_lut(img, clip_limit, grid)
    flat_luts = luts.reshape(-1)  # (gy*gx*256,)

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    tyf = ys / th - 0.5
    txf = xs / tw - 0.5
    ty1 = jnp.floor(tyf)
    tx1 = jnp.floor(txf)
    ya = tyf - ty1
    xa = txf - tx1
    ty1i = jnp.clip(ty1, 0, gy - 1).astype(jnp.int32)
    ty2i = jnp.clip(ty1 + 1, 0, gy - 1).astype(jnp.int32)
    tx1i = jnp.clip(tx1, 0, gx - 1).astype(jnp.int32)
    tx2i = jnp.clip(tx1 + 1, 0, gx - 1).astype(jnp.int32)

    v = img.astype(jnp.int32)

    def look(tyi, txi):
        return jnp.take(flat_luts, (tyi * gx + txi) * _NBINS + v).astype(jnp.float32)

    # association matches OpenCV's interpolation body exactly (row-pair lerp
    # then column lerp) so float rounding ties resolve identically
    top = look(ty1i, tx1i) * (1.0 - xa) + look(ty1i, tx2i) * xa
    bot = look(ty2i, tx1i) * (1.0 - xa) + look(ty2i, tx2i) * xa
    res = top * (1.0 - ya) + bot * ya
    return jnp.clip(jnp.round(res), 0, 255).astype(jnp.uint8)


def clahe_batch(imgs: Array, clip_limit: float = 3.0, grid: tuple[int, int] = (8, 8)) -> Array:
    """vmapped CLAHE over a (B, H, W) uint8 batch."""
    return jax.vmap(lambda x: clahe(x, clip_limit=clip_limit, grid=grid))(imgs)


def clahe_enhance_float(img01, clip_limit: float = 3.0, grid: tuple[int, int] = (8, 8)) -> Array:
    """Reference `clahe_enhancer` semantics: float [0,1] -> ×255 -> uint8 ->
    CLAHE -> uint8 result (``holdout.py:163-170``).

    The ×255 truncation is done host-side in float64 to match
    ``np.uint8(img*255)`` bit-for-bit: the reference truncates the *float64*
    product, and values like 0.6666666627 (×255 = 169.999999… in f64 but
    170.0 after f32 rounding) land in a different uint8 bin if the multiply
    happens in f32. Device (traced) inputs have already been rounded to f32;
    for those the f64 widening of the f32 value is exact, so the same host
    conversion applied to ``np.asarray(x)`` is still the correct truncation
    of the value actually held.
    """
    import numpy as np

    u8 = jnp.asarray(np.uint8(np.clip(np.asarray(img01, np.float64) * 255.0, 0, 255)))
    return clahe(u8, clip_limit=clip_limit, grid=grid)
