"""Fused serving pipeline: raw CT slice batch -> CLAHE -> two-lung crop ->
model-resolution tensor -> U-Net probabilities -> thresholded masks, one jit
program end to end.

This is the production path the reference never wires together (its
preprocessing is a per-slice OpenCV loop feeding a separate Keras predict —
SURVEY.md §3 hot loops (2)/(3)). On TPU the whole chain is a single XLA
program: the Pallas histogram kernel feeds LUT finalize (MXU matmul), the
gather-based LUT apply fuses with the dynamic crop-resize matmuls, and the
U-Net runs in bfloat16 on the MXU. The headline benchmark (BASELINE.json:
>=5,000 256^2 slices/sec/chip) drives exactly this function.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from onestop_tpu.ops.clahe_pallas import clahe_fused
from onestop_tpu.ops.crop import fuse_lung_crops

Array = jax.Array


@functools.partial(jax.jit, static_argnames=(
    "model", "out_hw", "threshold", "interpret", "pre_enhanced"))
def fused_infer(
    model,
    variables,
    imgs_u8: Array,          # (B, H, W) uint8 raw windowed/normalized slices ×255
    boxes1: Array,           # (B, 4) int32 lung 1 (x, y, w, h)
    boxes2: Array,           # (B, 4) int32 lung 2
    out_hw: tuple[int, int] = (256, 256),
    threshold: float | None = 0.5,
    interpret: bool = False,
    pre_enhanced: bool = False,
):
    """Full preproc + inference. Returns (B, out_h, out_w, 1) masks
    (bool if threshold given, else probabilities).

    Serving-path numerics: the crop-resize matmuls run at bf16 MXU precision
    (CLAHE'd uint8 pixel values are exact in bf16; the resize weights round
    at ~2^-8) and the model input is pre-cast to the model dtype — identical
    to the cast the model itself applies, so this changes nothing when
    model.dtype is bfloat16. Dataset builds keep the fp32-HIGHEST path
    (ops.resize default) for cv2 parity.

    ``pre_enhanced``: the inputs are already CLAHE'd — skip the kernel
    (callers like ``production.chained_infer`` enhance once and feed both
    the lung stage and this chain)."""
    x = serving_preproc(imgs_u8, boxes1, boxes2, out_hw, interpret=interpret,
                        pre_enhanced=pre_enhanced)
    probs = model.apply(variables, x.astype(model.dtype), train=False)
    if threshold is None:
        return probs
    return probs > threshold


def serving_preproc(imgs_u8: Array, boxes1: Array, boxes2: Array,
                    out_hw: tuple[int, int], interpret: bool = False,
                    pre_enhanced: bool = False) -> Array:
    """The shared serving preprocessing: Pallas CLAHE → per-image dynamic
    two-lung crop-resize (bf16 matmul precision) → /255. Returns
    (B, oh, ow, 1) float32. Both the bf16 chain (``fused_infer``) and the
    int8 chain (``serve_int8.fused_infer_int8``) call this — one
    implementation, no drift between serving modes."""
    enhanced = imgs_u8 if pre_enhanced else clahe_fused(imgs_u8, interpret=interpret)
    tile_hw = (out_hw[0], out_hw[1] // 2)

    def crop_one(img, b1, b2):
        return fuse_lung_crops(img.astype(jnp.float32), b1, b2, tile_hw,
                               precision=jax.lax.Precision.DEFAULT)

    crops = jax.vmap(crop_one)(enhanced, boxes1, boxes2)   # (B, oh, ow)
    return (crops / 255.0)[..., None]


def fused_infer_sharded(
    mesh,
    model,
    variables,
    imgs_u8: Array,
    boxes1: Array,
    boxes2: Array,
    axis: str = "data",
    **kw,
):
    """Data-parallel serving over a device mesh: the slice batch shards over
    ``axis``; every device runs the full fused chain (Pallas CLAHE + crop +
    U-Net) on its shard with replicated weights. No collectives are needed —
    serving is embarrassingly data-parallel over ICI-attached chips.

    shard_map (not bare jit-with-shardings) because GSPMD cannot partition a
    ``pallas_call``; inside shard_map each device traces its own kernel over
    its local shard. The batch must divide the axis size."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def fn(x, c1, c2):
        return fused_infer(model, variables, x, c1, c2, **kw)

    return shard_map(fn, mesh=mesh,
                     in_specs=(P(axis), P(axis), P(axis)),
                     out_specs=P(axis), check_vma=False)(imgs_u8, boxes1, boxes2)


def lung_boxes_batch(masks01: Array) -> tuple[Array, Array]:
    """Batched two-lung bbox extraction from binarized lung masks (the task3
    model's output feeds this in the full production chain)."""
    from onestop_tpu.ops.bbox import two_lung_bboxes

    def one(m):
        b1, b2, _ = two_lung_bboxes(m > 0)
        return b1, b2

    return jax.vmap(one)(masks01)


def lung_boxes_components_batch(masks01: Array, box_mode: str = "ccl"):
    """``lung_boxes_batch`` that also returns the two components' own masks
    (B, 2, H, W) — consumed by the probability-field box refinement
    (``ops.bbox.refine_boxes_bilinear``).

    box_mode: "ccl" (general connected-component labeling, while_loop
    fixpoint) or "bisect" (``ops.bbox.bisect_lung_components`` — CCL-free
    column-valley split, reduction-only; quality-gated A/B in
    scripts/verify_bisect_boxes.py)."""
    from onestop_tpu.ops.bbox import bisect_lung_components, two_lung_components

    two = bisect_lung_components if box_mode == "bisect" else two_lung_components

    def one(m):
        boxes, _, comp = two(m > 0)
        return boxes[0], boxes[1], comp

    return jax.vmap(one)(masks01)
