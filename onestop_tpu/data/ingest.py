"""Volume ingestion + dataset assembly — the reference's L1–L3 layers
(SURVEY.md §1), rebuilt around batched on-device preprocessing.

Reference protocol (``holdout.py:281-429``): per volume, ``read_nii`` makes
three passes — 'lungs' (binarize, crop boxes recorded in globals), 'cts'
(CLAHE + crop by the recorded boxes), 'infections' (×255 + crop) — followed
by black-mask filtering, resize-to-224, uint8 quantization and /255.

This rebuild replaces the global-coupled three-pass protocol with one
explicit per-case function whose hot ops (bbox, CLAHE, crop-resize) run
batched under ``jit`` on device. Slices whose lung mask is empty are dropped
from *all* modalities together — a deliberate, documented divergence fixing
the reference's index-misalignment quirks (SURVEY.md §8 Q3/Q4: there, empty
lung slices shift the recorded boxes relative to ct slice indices, so some
CTs are cropped with another slice's boxes, and overflow slices pass through
uncropped at 512²). The misaligned behavior is a latent bug, not advertised
semantics, so it is not reproduced.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from onestop_tpu.config import PreprocessConfig
from onestop_tpu.ops.bbox import two_lung_bboxes
from onestop_tpu.ops.clahe import clahe
from onestop_tpu.ops.clahe_pallas import clahe_fused
from onestop_tpu.ops.crop import fuse_lung_crops
from onestop_tpu.ops.resize import area_weights, linear_weights

def _chunk_size() -> int:
    """Ingest batch chunk: small on CPU (XLA one-hot CLAHE materializes
    ~268 MB/image of histogram one-hot), large on TPU where the Pallas
    CLAHE keeps everything in VMEM and bigger batches amortize dispatch."""
    return 64 if jax.default_backend() == "tpu" else 8


def _use_pallas_clahe() -> bool:
    """The Pallas CLAHE (clahe_fused) is bit-equal to ops.clahe.clahe
    (asserted in tests/test_clahe_pallas.py) and ~3.5x faster on TPU; on CPU
    backends Mosaic kernels only run in interpret mode (Python-speed), so the
    exact XLA path stays the CPU default."""
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# L1: volume -> windowed, resized, normalized slices (host numpy, exact)
# ---------------------------------------------------------------------------

def load_slices(
    fdata: np.ndarray,
    img_size: int = 512,
    slice_lo: float = 0.2,
    slice_hi: float = 0.8,
) -> np.ndarray:
    """(H, W, S) volume -> (S', img_size, img_size) float64 slices.

    rot90, keep slices [round(S·lo), round(S·hi)), per-slice INTER_AREA
    resize to img_size², per-slice min-max normalize
    (ref ``holdout.py:317-337``). Constant slices normalize to zeros instead
    of the reference's 0/0 NaNs (the NaN slices are later deleted by the
    black-mask filter there; here they never exist).
    """
    array = np.rot90(np.asarray(fdata, np.float64))
    s = array.shape[2]
    array = array[:, :, round(s * slice_lo) : round(s * slice_hi)]
    array = np.moveaxis(array, 2, 0)  # (S', H, W)
    h, w = array.shape[1], array.shape[2]
    wr = area_weights(h, img_size)
    wc = area_weights(w, img_size)
    out = np.einsum("oh,shw,pw->sop", wr, array, wc, optimize=True)
    mn = out.min(axis=(1, 2), keepdims=True)
    mx = out.max(axis=(1, 2), keepdims=True)
    rng = mx - mn
    rng[rng == 0] = 1.0
    return (out - mn) / rng


# ---------------------------------------------------------------------------
# L2: batched on-device preprocessing (chunked to bound compile/memory)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("tile_hw",))
def _kernel_boxes(masks01, tile_hw):
    """(B, H, W) float binarized lung masks -> boxes (B,4),(B,4), empties (B,)."""
    def one(m):
        b1, b2, sizes = two_lung_bboxes(m > 0)
        return b1, b2, sizes[0] == 0
    return jax.vmap(one)(masks01)


@functools.partial(jax.jit, static_argnames=("tile_hw", "use_pallas"))
def _kernel_ct(cts_u8, b1, b2, tile_hw, use_pallas=False):
    """CLAHE + two-lung crop: the 'cts' pass (ref holdout.py:347-358).

    Takes uint8 input: the reference's ``np.uint8(img*255)`` truncates the
    *float64* product, so the conversion happens host-side in f64
    (``_to_u8``) — doing it on-device in f32 shifts ties like
    0.6666666627×255 into the wrong bin.

    use_pallas selects the batched Pallas CLAHE (TPU hot path; bit-equal to
    the exact XLA path, see ``_use_pallas_clahe``)."""
    if use_pallas:
        enhanced = clahe_fused(cts_u8)
        def one(enh, bb1, bb2):
            return fuse_lung_crops(enh.astype(jnp.float32), bb1, bb2, tile_hw)
        return jax.vmap(one)(enhanced, b1, b2)
    def one(u8, bb1, bb2):
        enh = clahe(u8)
        return fuse_lung_crops(enh.astype(jnp.float32), bb1, bb2, tile_hw)
    return jax.vmap(one)(cts_u8, b1, b2)


@functools.partial(jax.jit, static_argnames=("tile_hw",))
def _kernel_mask(masks_u8, b1, b2, tile_hw):
    """×255 uint8 + two-lung crop: the 'infections' pass (ref holdout.py:360-368).
    uint8 input, converted host-side in f64 (see ``_kernel_ct``)."""
    def one(u8, bb1, bb2):
        return fuse_lung_crops(u8.astype(jnp.float32), bb1, bb2, tile_hw)
    return jax.vmap(one)(masks_u8, b1, b2)


def _to_u8(x01: np.ndarray) -> np.ndarray:
    """``np.uint8(img*255)`` reference semantics: float64 product, truncation
    (ref holdout.py:165-166, 360-364). Must stay in f64 until the cast."""
    return np.uint8(np.clip(np.asarray(x01, np.float64) * 255.0, 0, 255))


def _run_chunked(kernel, arrays, tile_hw=None):
    n = arrays[0].shape[0]
    # adapt the chunk to the stack: a 13-slice case padded to a 64-chunk
    # wastes 5x the compute; rounding up to a multiple of 8 keeps the set of
    # compiled shapes small (8, 16, ..., cap) while bounding pad waste <=1.6x
    size = min(_chunk_size(), max(8, -(-n // 8) * 8))
    outs = None
    for i in range(0, n, size):
        chunk = [np.asarray(a[i : i + size]) for a in arrays]
        k = chunk[0].shape[0]
        if k < size:
            chunk = [np.concatenate([c, np.repeat(c[-1:], size - k, axis=0)]) for c in chunk]
        res = kernel(*[jnp.asarray(c) for c in chunk], tile_hw) if tile_hw else kernel(*chunk)
        res = jax.tree_util.tree_map(lambda r: np.asarray(r)[:k], res)
        if outs is None:
            outs = [[] for _ in (res if isinstance(res, tuple) else (res,))]
        for lst, r in zip(outs, res if isinstance(res, tuple) else (res,)):
            lst.append(r)
    parts = [np.concatenate(lst, axis=0) for lst in outs]
    return parts if len(parts) > 1 else parts[0]


# ---------------------------------------------------------------------------
# Per-case ingestion (the read_nii three-pass protocol, made explicit)
# ---------------------------------------------------------------------------

def ingest_case(
    ct_slices: np.ndarray,
    lung_slices: np.ndarray,
    infection_slices: np.ndarray | None = None,
    cfg: PreprocessConfig = PreprocessConfig(),
) -> dict:
    """Preprocess one case's windowed/normalized slice stacks.

    Inputs are the outputs of ``load_slices`` for each modality, aligned on
    the slice axis. Slices whose lung mask is empty are dropped from every
    modality (fixed-alignment semantics; see module docstring).

    Returns dict with:
      cts:    (N, 250, 250) float32 — CLAHE'd, two-lung-cropped CT (0..255)
      masks:  (N, 250, 250) float32 or None — cropped infection mask (0..255)
      boxes1, boxes2: (N, 4) int32
      kept:   (N,) int — original slice indices kept
    """
    lungs_bin = (lung_slices > 0).astype(np.float32)
    nonempty = lungs_bin.reshape(lungs_bin.shape[0], -1).max(axis=1) > 0
    kept = np.nonzero(nonempty)[0]
    if len(kept) == 0:
        empty = np.zeros((0, cfg.crop_tile[0], cfg.crop_tile[0]), np.float32)
        return {"cts": empty, "masks": empty if infection_slices is not None else None,
                "boxes1": np.zeros((0, 4), np.int32), "boxes2": np.zeros((0, 4), np.int32),
                "kept": kept}

    tile_hw = tuple(cfg.crop_tile)
    b1, b2, _ = _run_chunked(_kernel_boxes, [lungs_bin[kept]], tile_hw)
    ct_kernel = functools.partial(_kernel_ct, use_pallas=_use_pallas_clahe())
    cts = _run_chunked(ct_kernel, [_to_u8(ct_slices[kept]), b1, b2], tile_hw)
    masks = None
    if infection_slices is not None:
        masks = _run_chunked(_kernel_mask, [_to_u8(infection_slices[kept]), b1, b2], tile_hw)
    return {"cts": cts, "masks": masks, "boxes1": b1, "boxes2": b2, "kept": kept}


def ingest_lung_case(
    ct_slices: np.ndarray,
    lung_slices: np.ndarray,
    cfg: PreprocessConfig = PreprocessConfig(),
) -> dict:
    """Task3 per-slice loop (ref task3:343-362): boxes from the binarized
    lung mask itself; the mask is cropped too (it is the target).
    Empty-lung slices are dropped in addition to the configured corrupt-slice
    excision (``excise_corrupt_slices``, applied by ``build_lung_dataset``
    before this runs) — crops of an all-empty mask are degenerate."""
    lungs_bin = (lung_slices > 0).astype(np.float32)
    nonempty = lungs_bin.reshape(lungs_bin.shape[0], -1).max(axis=1) > 0
    kept = np.nonzero(nonempty)[0]
    tile_hw = tuple(cfg.crop_tile)
    b1, b2, _ = _run_chunked(_kernel_boxes, [lungs_bin[kept]], tile_hw)
    ct_kernel = functools.partial(_kernel_ct, use_pallas=_use_pallas_clahe())
    cts = _run_chunked(ct_kernel, [_to_u8(ct_slices[kept]), b1, b2], tile_hw)
    lungs = _run_chunked(_kernel_mask, [_to_u8(lungs_bin[kept]), b1, b2], tile_hw)
    return {"cts": cts, "masks": lungs, "boxes1": b1, "boxes2": b2, "kept": kept}


# ---------------------------------------------------------------------------
# L3: dataset assembly
# ---------------------------------------------------------------------------

def _trunc_uint8(x: np.ndarray) -> np.ndarray:
    """np.uint8(x) semantics — truncation toward zero (ref holdout.py:520-521)."""
    return x.astype(np.uint8)


def _resize_batch_linear(x: np.ndarray, new_dim: int) -> np.ndarray:
    h, w = x.shape[1], x.shape[2]
    wr = linear_weights(h, new_dim)
    wc = linear_weights(w, new_dim)
    return np.einsum("oh,shw,pw->sop", wr, x.astype(np.float64), wc, optimize=True)


def _is_constant(batch: np.ndarray) -> np.ndarray:
    flat = batch.reshape(batch.shape[0], -1)
    return flat.max(axis=1) == flat.min(axis=1)


def build_segmentation_dataset(case_slices, cfg: PreprocessConfig = PreprocessConfig()):
    """Task1: (cts, infections) as (N, 224, 224, 1) float32 in [0, 1].

    case_slices: iterable of (ct_slices, lung_slices, infection_slices)
    triples from ``load_slices``. Applies the black-mask filter
    (ref holdout.py:421-429), 224 INTER_LINEAR resize, uint8 truncation
    and /255 (ref :485-521, 678-686).
    """
    cts_parts, mask_parts = [], []
    for ct_s, lung_s, inf_s in case_slices:
        out = ingest_case(ct_s, lung_s, inf_s, cfg)
        cts_parts.append(out["cts"])
        mask_parts.append(out["masks"])
    cts = np.concatenate(cts_parts, axis=0)
    masks = np.concatenate(mask_parts, axis=0)
    keep = ~_is_constant(masks)   # "no_masks" deletion
    cts, masks = cts[keep], masks[keep]
    cts = _trunc_uint8(_resize_batch_linear(cts, cfg.new_dim)).astype(np.float32) / 255.0
    masks = _trunc_uint8(_resize_batch_linear(masks, cfg.new_dim)).astype(np.float32) / 255.0
    return cts[..., None], masks[..., None]


def build_classification_dataset(case_slices, cfg: PreprocessConfig = PreprocessConfig()):
    """Task2: (cts (N,224,224,1) float32 in [0,1], y (N,) int32).

    Labels: slice's cropped infection mask non-constant -> 1
    (ref task2:413-418). No black-mask deletion, no uint8 quantization
    (task2 keeps floats, ref task2:495-512 then /255 at :639)."""
    cts_parts, mask_parts = [], []
    for ct_s, lung_s, inf_s in case_slices:
        out = ingest_case(ct_s, lung_s, inf_s, cfg)
        cts_parts.append(out["cts"])
        mask_parts.append(out["masks"])
    cts = np.concatenate(cts_parts, axis=0)
    masks = np.concatenate(mask_parts, axis=0)
    y = (~_is_constant(masks)).astype(np.int32)
    cts = _resize_batch_linear(cts, cfg.new_dim).astype(np.float32) / 255.0
    return cts[..., None], y


def excise_corrupt_slices(arrays, ranges):
    """Delete the configured global slice ranges from every aligned array —
    the reference's hardcoded ``del lungs[1368:1372]; del cts[1368:1372]`` etc.
    (ref task3:334-337). Ranges use Python slice semantics (out-of-range
    starts/stops clip silently, exactly like ``del list[a:b]``)."""
    if not ranges:
        return arrays
    n = arrays[0].shape[0]
    keep = np.ones(n, bool)
    for lo, hi in ranges:
        keep[lo:hi] = False
    return tuple(a[keep] for a in arrays)


def build_lung_dataset(case_slices, cfg: PreprocessConfig = PreprocessConfig()):
    """Task3: (cts, lungs) as (N, 224, 224, 1) float32 in [0, 1]
    (ref task3:343-362, 474-510).

    Corrupt-slice excision (``cfg.corrupt_slices``) applies to *global* slice
    indices across the concatenated per-case stacks, pre-preprocessing — the
    index space the reference's hardcoded ``del`` statements act on
    (ref task3:334-337, after the 20-case read loop at :313-315)."""
    ct_parts, lung_parts = [], []
    for ct_s, lung_s in case_slices:
        ct_parts.append(ct_s)
        lung_parts.append(lung_s)
    ct_all = np.concatenate(ct_parts, axis=0)
    lung_all = np.concatenate(lung_parts, axis=0)
    ct_all, lung_all = excise_corrupt_slices((ct_all, lung_all), cfg.corrupt_slices)
    out = ingest_lung_case(ct_all, lung_all, cfg)
    cts, lungs = out["cts"], out["masks"]
    cts = _trunc_uint8(_resize_batch_linear(cts, cfg.new_dim)).astype(np.float32) / 255.0
    lungs = _trunc_uint8(_resize_batch_linear(lungs, cfg.new_dim)).astype(np.float32) / 255.0
    return cts[..., None], lungs[..., None]
