"""Batched CLAHE for the TPU hot path.

The generic ``ops.clahe`` is exact but computes per-tile histograms with a
one-hot broadcast that XLA materializes (fine for dataset builds, wrong for
the serving path). This module splits CLAHE into three stages shaped for the
hardware:

1. **tile histograms — Pallas kernel**: one grid step per image; the 512²
   uint8 slice sits in VMEM (256 KB) and 64 statically-unrolled tile loops
   do compare-and-accumulate on the VPU. No scatter, no HBM round-trips.
2. **LUT finalize — XLA**: clip/redistribute (elementwise over (B,64,256))
   and CDF via a triangular matmul on the MXU (cumsum lowers poorly).
3. **apply — XLA**: per-pixel bilinear interpolation between the 4
   neighboring tile LUTs; LUT lookups as a batched gather from a 16 KB/image
   table (VMEM-resident), weights from iota arithmetic.

Same algorithm as ``ops.clahe`` (OpenCV parity); equality is asserted in
``tests/test_clahe_pallas.py``. Fixed to 8×8 grids; pads to a tile multiple
with REFLECT_101 like OpenCV.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NBINS = 256
_GRID = 8


def _hist_kernel(img_ref, out_ref, *, tile_h: int, width: int):
    """img block (1, H, W) int32 in VMEM -> out (1, 64, 256) float32.

    Strategy shaped by Mosaic's alignment rules: slices along the lane (last)
    dim must be 128-aligned, so tiles are never sliced by column. Instead,
    per tile-ROW we accumulate a full-width column histogram
    colhist[c, bin] = #{rows in tile-row : pixel == bin} from 8-row strips
    (VPU compare+reduce), then split it into the 8 per-tile histograms with a
    block-diagonal selector matmul on the MXU. Requires tile_h % 8 == 0
    (callers fall back to the exact XLA path otherwise)."""
    bins = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _NBINS), 2)
    tile_w = width // _GRID
    rows_per_chunk = 8
    n_chunks = tile_h // rows_per_chunk
    # selector[i, c] = 1 if column c belongs to tile i of this tile-row
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (_GRID, width), 1) // tile_w
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (_GRID, width), 0)
    selector = (col_ids == row_ids).astype(jnp.float32)

    def tile_row_body(ty, carry):
        def chunk_body(c, colhist):
            strip = img_ref[0, pl.ds(ty * tile_h + c * rows_per_chunk, rows_per_chunk), :]
            eq = (strip[:, :, None] == bins).astype(jnp.float32)
            return colhist + jnp.sum(eq, axis=0)

        colhist = jax.lax.fori_loop(
            0, n_chunks, chunk_body, jnp.zeros((width, _NBINS), jnp.float32)
        )
        hists = jnp.dot(selector, colhist, preferred_element_type=jnp.float32)
        out_ref[0, pl.ds(ty * _GRID, _GRID), :] = hists
        return carry

    jax.lax.fori_loop(0, _GRID, tile_row_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def tile_histograms(imgs: jax.Array, interpret: bool = False) -> jax.Array:
    """(B, H, W) uint8 (tile height H/8 a multiple of 8) -> (B, 64, 256) f32."""
    b, h, w = imgs.shape
    th = h // _GRID
    kernel = functools.partial(_hist_kernel, tile_h=th, width=w)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, _GRID * _GRID, _NBINS), jnp.float32),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _GRID * _GRID, _NBINS), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(imgs.astype(jnp.int32).reshape(b, h, w))


def _hist_kernel_nibble(img_ref, out_ref, *, tile_px: int):
    """Nibble-split tile histograms: img_ref (1, 8, 8·tile_px) int32 — one
    tile-ROW per sublane, each tile's pixels contiguous on lanes — ->
    out (1, 128, 16) f32 per tile-row slab, hist[(t·16+hi)·..., lo].

    hist256[v] needs 256 compares/pixel in one-hot form (the VPU-bound
    ``_hist_kernel``, ~70 ms/1024×256² batch). Splitting v = 16·hi + lo
    needs only 16+16 compares to build hi/lo one-hots, and the joint
    (16, 16) count per tile is their outer product accumulated over pixels —
    an MXU contraction over the lane (pixel) axis:

        hist[t, hi, lo] = Σ_p hi_oh[hi, p_t] · lo_oh[lo, p_t]

    The (hi, lo) -> 256-bin unflatten happens OUTSIDE the kernel (XLA
    reshape; Mosaic cannot merge the sublane pair into the lane dim).
    Requires tile_px % 128 == 0 (true for 256²/512² inputs: 1024/4096)."""
    nib = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    for ty in range(_GRID):
        v = img_ref[0, ty : ty + 1, :]                       # (1, 8·tile_px)
        hi_oh = (nib == (v >> 4)).astype(jnp.bfloat16)       # (16, 8·tile_px)
        lo_oh = (nib == (v & 15)).astype(jnp.bfloat16)
        for t in range(_GRID):
            hi_t = jax.lax.slice_in_dim(hi_oh, t * tile_px, (t + 1) * tile_px, axis=1)
            lo_t = jax.lax.slice_in_dim(lo_oh, t * tile_px, (t + 1) * tile_px, axis=1)
            hist = jax.lax.dot_general(
                hi_t, lo_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (16 hi, 16 lo)
            out_ref[0, pl.ds((ty * _GRID + t) * 16, 16), :] = hist


@functools.partial(jax.jit, static_argnames=("interpret",))
def tile_histograms_nibble(imgs: jax.Array, interpret: bool = False) -> jax.Array:
    """(B, H, W) uint8 (tile area a multiple of 128) -> (B, 64, 256) f32.
    Same result as ``tile_histograms``; ~4x faster (see ``_hist_kernel_nibble``)."""
    b, h, w = imgs.shape
    th, tw = h // _GRID, w // _GRID
    tile_px = th * tw
    # per-tile-contiguous pixel layout: (B, ty, tx, th, tw) -> (B, 8, 8·th·tw)
    x = (imgs.astype(jnp.int32)
         .reshape(b, _GRID, th, _GRID, tw)
         .transpose(0, 1, 3, 2, 4)
         .reshape(b, _GRID, _GRID * tile_px))
    kernel = functools.partial(_hist_kernel_nibble, tile_px=tile_px)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, _GRID * _GRID * 16, 16), jnp.float32),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, _GRID, _GRID * tile_px), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _GRID * _GRID * 16, 16), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
    # (B, 64·16hi, 16lo) -> (B, 64, 256): bin = 16·hi + lo
    return out.reshape(b, _GRID * _GRID, _NBINS)


def _finalize_luts(hist: jax.Array, clip_limit: float, tile_area: int) -> jax.Array:
    """(B, 64, 256) histograms -> (B, 64, 256) uint8 LUTs (OpenCV clip +
    redistribution + rounded CDF). Pure XLA; the cumsum is a triangular
    matmul so it lands on the MXU."""
    h = hist.astype(jnp.int32)
    if clip_limit > 0:
        climit = max(int(clip_limit * tile_area / _NBINS), 1)
        excess = jnp.sum(jnp.maximum(h - climit, 0), axis=-1, keepdims=True)
        h = jnp.minimum(h, climit) + excess // _NBINS  # const divisor: a shift
        residual = excess % _NBINS
        # (idx % step == 0) & (idx // step < residual) without variable-divisor
        # integer div/mod, which lower to bit-serial loops on the VPU (~30 ms
        # per 1024-image batch). All operands are < 2^24 so f32 division
        # (correctly rounded, quotient < 256) and products are exact.
        step = jnp.maximum(_NBINS // jnp.maximum(residual, 1), 1).astype(jnp.float32)
        idx = jnp.arange(_NBINS, dtype=jnp.float32)[None, None, :]
        q = jnp.floor(idx / step)
        hit = (q * step == idx) & (q < residual.astype(jnp.float32)) & (residual > 0)
        h = h + hit.astype(jnp.int32)
    tri = jnp.asarray(np.tril(np.ones((_NBINS, _NBINS), np.float32)))
    cdf = jnp.einsum("btk,jk->btj", h.astype(jnp.float32), tri,
                     precision=jax.lax.Precision.HIGHEST)
    scale = (_NBINS - 1.0) / tile_area
    return jnp.clip(jnp.round(cdf * scale), 0, 255).astype(jnp.uint8)


def _apply_luts(imgs: jax.Array, luts: jax.Array) -> jax.Array:
    """(B, H, W) uint8 + (B, 64, 256) LUTs -> (B, H, W) uint8 via bilinear
    LUT interpolation (OpenCV association order for tie parity).

    Gather-free: per-pixel LUT lookups run as one-hot int8 matmuls on the
    MXU. The image splits into 2·GRID horizontal half-bands, inside which
    the two relevant LUT *rows* are fixed; a (pixels, 256) one-hot contracts
    with the 16 stacked tile LUTs, and the column interpolation weights
    collapse the 16 values per pixel. A per-pixel gather formulation
    measured ~70x slower on v5e (TPU gathers serialize); this is pure
    VPU compare + MXU int8 matmul."""
    b, h, w = imgs.shape
    th, tw = h // _GRID, w // _GRID
    hbr = th // 2  # half-band rows
    bins = jnp.arange(_NBINS, dtype=jnp.int32)

    # column interpolation weights: (W, 2*GRID); first GRID entries weight the
    # ty1 LUT row's tiles, last GRID the ty2 row's (same column weights)
    xs = np.arange(w, dtype=np.float64)
    txf = xs / tw - 0.5
    tx1 = np.floor(txf)
    xa = (txf - tx1).astype(np.float32)
    tx1c = np.clip(tx1, 0, _GRID - 1).astype(np.int64)
    tx2c = np.clip(tx1 + 1, 0, _GRID - 1).astype(np.int64)
    colw = np.zeros((w, _GRID), np.float32)
    np.add.at(colw, (np.arange(w), tx1c), 1.0 - xa)
    np.add.at(colw, (np.arange(w), tx2c), xa)
    colw = jnp.asarray(colw)

    pieces = []
    for hb in range(2 * _GRID):
        ty1c = max((hb - 1) // 2, 0)
        ty2c = min((hb - 1) // 2 + 1, _GRID - 1)
        pix = jax.lax.slice_in_dim(imgs, hb * hbr, (hb + 1) * hbr, axis=1).astype(jnp.int32)
        # bf16 one-hot: LUT values <=255 and 0/1 indicators are exact in bf16,
        # accumulation in f32 — bit-identical to an integer contraction
        onehot = (pix[..., None] == bins).astype(jnp.bfloat16)    # (B, hbr, W, 256)
        lutrows = jnp.concatenate(
            [luts[:, ty1c * _GRID:(ty1c + 1) * _GRID],
             luts[:, ty2c * _GRID:(ty2c + 1) * _GRID]], axis=1
        ).astype(jnp.bfloat16)                                     # (B, 16, 256)
        p = jnp.einsum("bhwk,btk->bhwt", onehot, lutrows,
                       preferred_element_type=jnp.float32)
        top = jnp.einsum("bhwt,wt->bhw", p[..., :_GRID], colw)     # A(1-xa)+B·xa
        bot = jnp.einsum("bhwt,wt->bhw", p[..., _GRID:], colw)     # C(1-xa)+D·xa
        ys = hb * hbr + jnp.arange(hbr, dtype=jnp.float32)
        tyf = ys / th - 0.5
        # ya relative to the *unclamped* ty1 = floor(tyf); at the clamped
        # borders top == bot so ya's value is irrelevant there
        ya = (tyf - jnp.floor(tyf))[None, :, None]
        pieces.append(top * (1.0 - ya) + bot * ya)
    res = jnp.concatenate(pieces, axis=1)
    return jnp.clip(jnp.round(res), 0, 255).astype(jnp.uint8)


def _apply_kernel_block(colw1_ref, colw2_ref, img_ref, luts_ref, out_ref, *,
                        tile_h: int, width: int, block_rows: int):
    """Block LUT apply: one (16, 256) @ (256, R·W) MXU matmul per R-row block.

    A per-row variant (one (16, 256) @ (256, W) matmul per image row) is
    latency-bound (~43 ms/1024×256² batch on v5e); flattening the R rows into
    the lane dim makes N = R·W (4096 for R=16, W=256) so each matmul is a
    well-shaped MXU op. Row flattening happens OUTSIDE the kernel (XLA
    reshape) because Mosaic cannot merge sublanes into the lane dim; each
    grid step sees 8 consecutive R-row blocks as img_ref (1, 8, R·W)
    (a sublane-dim of 8 keeps the BlockSpec legal) and unrolls over them.

    Each R-row block must lie inside one interpolation half-band (same
    ty1/ty2 for all R rows): callers guarantee (tile_h // 2) % block_rows == 0.

    Float association order matches OpenCV exactly: A(1-xa) + B·xa per LUT
    row (colw sums each have one nonzero term), then the row lerp
    top·(1-ya) + bot·ya with ya from the same f32 iota arithmetic as the
    reference XLA path — bit-for-bit parity is asserted in
    tests/test_clahe_pallas.py."""
    n = block_rows * width
    bins = jax.lax.broadcasted_iota(jnp.int32, (_NBINS, 1), 0)
    # per-lane row offset r = lane // width (static divisor: multiply-shift)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    r = lane // width
    cw1 = colw1_ref[...]                                     # (8, R·W)
    cw2 = colw2_ref[...]
    j8 = pl.program_id(1)

    for s in range(8):
        jblk = j8 * 8 + s
        y0 = jblk * block_rows
        tyf0 = y0.astype(jnp.float32) / tile_h - 0.5
        ty1 = jnp.floor(tyf0)
        ty1c = jnp.clip(ty1, 0, _GRID - 1).astype(jnp.int32)
        ty2c = jnp.clip(ty1 + 1, 0, _GRID - 1).astype(jnp.int32)
        lut1 = luts_ref[0, pl.ds(ty1c * _GRID, _GRID), :]    # (8, 256)
        lut2 = luts_ref[0, pl.ds(ty2c * _GRID, _GRID), :]
        luts = jnp.concatenate([lut1, lut2], axis=0).astype(jnp.bfloat16)

        rows = img_ref[0, s : s + 1, :]                      # (1, R·W) int32
        onehot = (bins == rows).astype(jnp.bfloat16)         # (256, R·W)
        p = jnp.dot(luts, onehot, preferred_element_type=jnp.float32)  # (16, R·W)

        top = (jnp.sum(p[0:_GRID] * cw1, axis=0, keepdims=True)
               + jnp.sum(p[0:_GRID] * cw2, axis=0, keepdims=True))
        bot = (jnp.sum(p[_GRID:] * cw1, axis=0, keepdims=True)
               + jnp.sum(p[_GRID:] * cw2, axis=0, keepdims=True))
        y = y0 + r
        tyf = y.astype(jnp.float32) / tile_h - 0.5
        ya = tyf - jnp.floor(tyf)                            # (1, R·W)
        res = top * (1.0 - ya) + bot * ya
        out_ref[0, s : s + 1, :] = jnp.clip(jnp.round(res), 0.0, 255.0)


def _colw_split(w: int, tw: int):
    """Separate (8, W) column-weight planes for tx1 ((1-xa)) and tx2 (xa)."""
    xs = np.arange(w, dtype=np.float64)
    txf = xs / tw - 0.5
    tx1 = np.floor(txf)
    xa = (txf - tx1).astype(np.float32)
    tx1c = np.clip(tx1, 0, _GRID - 1).astype(np.int64)
    tx2c = np.clip(tx1 + 1, 0, _GRID - 1).astype(np.int64)
    w1 = np.zeros((_GRID, w), np.float32)
    w2 = np.zeros((_GRID, w), np.float32)
    w1[tx1c, np.arange(w)] = 1.0 - xa
    w2[tx2c, np.arange(w)] = xa
    return w1, w2


@functools.partial(jax.jit, static_argnames=("interpret",))
def _apply_luts_pallas(imgs: jax.Array, luts: jax.Array, interpret: bool = False) -> jax.Array:
    b, h, w = imgs.shape
    th, tw = h // _GRID, w // _GRID
    # largest block that stays inside one interpolation half-band
    R = 16 if th % 32 == 0 else 8
    w1, w2 = _colw_split(w, tw)
    w1r = np.ascontiguousarray(np.tile(w1, (1, R)))
    w2r = np.ascontiguousarray(np.tile(w2, (1, R)))
    kernel = functools.partial(_apply_kernel_block, tile_h=th, width=w, block_rows=R)
    x = imgs.astype(jnp.int32).reshape(b, h // R, R * w)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h // R, R * w), jnp.float32),
        grid=(b, (h // R) // 8),
        in_specs=[
            pl.BlockSpec((_GRID, R * w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_GRID, R * w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, R * w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _GRID * _GRID, _NBINS), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, R * w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(w1r), jnp.asarray(w2r), x, luts.astype(jnp.float32))
    return out.reshape(b, h, w).astype(jnp.uint8)


def clahe_fused(imgs: jax.Array, clip_limit: float = 3.0,
                interpret: bool = False) -> jax.Array:
    """Batched CLAHE, Pallas-accelerated. (B, H, W) uint8 -> uint8.

    Equals ``ops.clahe.clahe`` / cv2 bit-for-bit (8×8 grid). H, W need not be
    tile multiples — pads with REFLECT_101 and computes LUTs on the padded
    image, applying on original coordinates (OpenCV semantics)."""
    b, h, w = imgs.shape
    th = -(-h // _GRID)
    tw = -(-w // _GRID)
    if th % 2 != 0:
        # odd tile heights break the half-band decomposition; take the exact
        # per-image path (rare: only non-even-tile inputs)
        from onestop_tpu.ops.clahe import clahe as _exact
        return jax.vmap(lambda im: _exact(im, clip_limit=clip_limit))(imgs)
    ph, pw = th * _GRID - h, tw * _GRID - w
    padded = imgs if (ph == 0 and pw == 0) else \
        jnp.pad(imgs, ((0, 0), (0, ph), (0, pw)), mode="reflect")
    if (th * tw) % 128 == 0:
        # nibble-split MXU histogram (fastest; 256²/512² inputs land here)
        hist = tile_histograms_nibble(padded, interpret=interpret)
    elif th % 8 == 0:
        hist = tile_histograms(padded, interpret=interpret)
    else:
        # Mosaic sublane alignment wants 8-row strips; odd tile heights take
        # the exact XLA histogram path instead (rare: non-512/256 inputs)
        from onestop_tpu.ops.clahe import _tile_histograms as _xla_hist
        tiles = padded.reshape(b, _GRID, th, _GRID, tw).transpose(0, 1, 3, 2, 4)
        tiles = tiles.reshape(b * _GRID * _GRID, th * tw)
        hist = _xla_hist(tiles).reshape(b, _GRID * _GRID, _NBINS).astype(jnp.float32)
    luts = _finalize_luts(hist, clip_limit, th * tw)
    # apply uses the padded tile size but original pixel grid; the Pallas
    # apply kernel needs 8-row blocks to stay inside one interpolation
    # half-band (tile_h % 16 == 0 — true for 512/256 inputs)
    apply = (functools.partial(_apply_luts_pallas, interpret=interpret)
             if th % 16 == 0 else _apply_luts)
    if ph or pw:
        out = apply(padded, luts)[:, :h, :w]
    else:
        out = apply(imgs, luts)
    return out
