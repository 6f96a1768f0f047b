"""Chained production inference: raw CT → lung U-Net → lung boxes →
CLAHE + two-lung crop → infection U-Net, one jit program, no ground truth
anywhere.

The reference cannot do this. Its infection pipeline crops every CT with
boxes taken from the *ground-truth* lung mask (``holdout.py:339-368``), so
inference requires the label it is supposed to help produce; task3 trains a
lung model that could supply those boxes, but the scripts never wire the
chain together (SURVEY.md §8 Q2). This module closes that loop:

1. the raw windowed/normalized slice (×255 uint8, any resolution) is
   CLAHE'd and plain-resized (INTER_AREA — the ``read_nii_demo`` path,
   ref ``holdout.py:281-297``) to the lung model's resolution;
2. the lung U-Net predicts a lung mask; its two largest components give the
   crop boxes (``ops.bbox``), rescaled to raw-image coordinates;
3. ``ops.pipeline.fused_infer`` runs the task1 serving chain — CLAHE,
   dynamic two-lung crop-resize, infection U-Net, threshold — using those
   *predicted* boxes instead of ground-truth ones.

Stage 1 intentionally feeds the lung model full-frame (uncropped) CLAHE'd
slices: cropping would require boxes, which is what the lung stage exists to
produce. Lung models for this chain must therefore be trained on full-frame
pairs (``build_plain_lung_dataset``) rather than the self-cropped task3
dataset; ``runner_production_chain`` (CLI menu 'seven' — an option the
reference's app.py advertises but never implemented, ``app.py:29``) does
exactly that end to end and reports the dice cost of swapping GT boxes for
predicted ones.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from onestop_tpu.ops.clahe_pallas import clahe_fused
from onestop_tpu.ops.pipeline import lung_boxes_batch
from onestop_tpu.ops.resize import resize2d

Array = jax.Array


@functools.partial(jax.jit, static_argnames=(
    "lung_model", "seg_model", "model_hw", "lung_threshold", "threshold",
    "interpret", "ccl_stride", "lung_hw", "refine_boxes", "box_mode"))
def chained_infer(
    lung_model,
    lung_variables,
    seg_model,
    seg_variables,
    raw_u8: Array,                      # (B, H, W) uint8 raw normalized slices ×255
    model_hw: tuple[int, int] = (224, 224),
    lung_threshold: float = 0.5,
    threshold: float | None = 0.5,
    interpret: bool = False,
    ccl_stride: int = 2,
    lung_hw: tuple[int, int] | None = None,
    refine_boxes: bool = True,
    box_mode: str = "ccl",
):
    """Full no-ground-truth chain. Returns (masks, boxes1, boxes2):
    masks (B, oh, ow, 1) — bool if ``threshold`` given, else probabilities —
    in the two-lung-crop frame; boxes in raw-image coordinates (float32,
    (x, y, w, h)), usable to map masks back onto the raw slice.

    CLAHE runs ONCE on the raw batch and feeds both the lung stage and the
    infection chain (stage 3 passes ``pre_enhanced=True`` — the reference
    applies the same single enhancement to the CT before both uses too,
    ``holdout.py:347-358``).

    ``ccl_stride``: connected-component labeling runs on a stride×stride
    max-pooled lung mask (default 2 → 4× fewer pixels through the segmented
    scans, the chain's dominant non-conv cost) and the boxes are scaled back
    up — the pooled box always covers the exact one, overshooting by less
    than ``stride`` px per side. Lung boxes only gate a crop that is
    immediately resized, so sub-stride box precision is quality-neutral
    (quantified in artifacts_tpu/round3_ccl_stride.json via
    scripts/verify_ccl_stride.py); pooling cannot split a component, and can
    only merge ones closer than ``stride`` px — the inter-lung gap is ~20 px
    at 224². Set 1 for exact boxes.

    ``lung_hw``: resolution of the stage-1 lung pass (default ``model_hw``).
    Boxes only need lung-scale precision, so the lung U-Net can run at e.g.
    112² for ~4× fewer stage-1 FLOPs — the lung model must then be TRAINED
    at that resolution (``runner_production_chain(lung_dim=112)``).

    ``refine_boxes``: re-derive every box edge from the bilinearly-upsampled
    lung probability field at raw-pixel precision
    (``ops.bbox.refine_boxes_bilinear``), removing both the ``ccl_stride``
    and the ``lung_hw`` grid quantization from the crop frame for the cost
    of one lh→raw matmul resize + masked reductions.

    ``box_mode``: "ccl" (general connected-component labeling) or "bisect"
    (``ops.bbox.bisect_lung_components`` — anatomy-aware column-valley split,
    reduction-only, no while_loop; A/B-gated by
    scripts/verify_bisect_boxes.py)."""
    lung_apply = lambda x: lung_model.apply(lung_variables, x, train=False)
    seg_apply = lambda x: seg_model.apply(
        seg_variables, x.astype(seg_model.dtype), train=False)
    return _chain_stages(lung_apply, seg_apply, raw_u8, model_hw,
                         lung_threshold, threshold, interpret, ccl_stride,
                         lung_hw, refine_boxes=refine_boxes,
                         box_mode=box_mode)


def _chain_stages(lung_apply, seg_apply, raw_u8, model_hw, lung_threshold,
                  threshold, interpret, ccl_stride, lung_hw, cls_apply=None,
                  refine_boxes=True, cls_hw=None, box_mode="ccl"):
    """The chain stages, parameterized over the model forwards so the bf16
    (``chained_infer``/``one_stop_infer``) and int8
    (``serve_int8.chained_infer_int8``/``one_stop_infer_int8``) paths share
    one implementation. With ``cls_apply`` the stage-3 input — which is
    exactly the task2 classifier's training distribution (CLAHE'd two-lung
    crop at ``model_hw``, ref ``task2_covid19_classifcation.py:413-418`` uses
    the same three-pass arrays) — also feeds the classifier, and the return
    gains a per-slice infection probability.

    cls_hw: optional lower classifier resolution — the stage-3 crop is
    linear-resized once for the classifier (whose Flatten→Dense head must have
    been trained at cls_hw). The classifier's 16/32-channel convs sit at the
    C<128 lane ceiling, so its wall-clock scales with spatial positions, not
    FLOPs — a 112² classifier quarters the measured 18.7%/dispatch overhead
    (scripts/profile_cls_overhead.py)."""
    from onestop_tpu.ops.pipeline import (lung_boxes_components_batch,
                                          serving_preproc)

    b, h, w = raw_u8.shape
    lung_hw = model_hw if lung_hw is None else lung_hw
    enhanced = clahe_fused(raw_u8, interpret=interpret)          # (B, H, W) uint8

    # stage 1: full-frame lung segmentation at lung resolution
    x_lung = resize2d(enhanced.astype(jnp.float32), lung_hw, "area")
    x_lung = (x_lung / 255.0)[..., None]
    lung_probs = lung_apply(x_lung)
    lung_masks = lung_probs[..., 0] > lung_threshold             # (B, lh, lw)

    # stage 2: predicted boxes, rescaled from model to raw coordinates
    s = ccl_stride
    if s > 1:
        lung_masks = jax.lax.reduce_window(
            lung_masks, False, jax.lax.bitwise_or, (1, s, s), (1, s, s), "VALID")
    if refine_boxes:
        from onestop_tpu.ops.bbox import refine_boxes_bilinear

        # re-derive every edge from the continuous probability field at raw
        # resolution: one shared (lh→H, lw→W) bilinear matmul resize + masked
        # iota reductions inside each component's own dilated footprint —
        # removes the lung-grid AND ccl_stride quantization from the crop
        # frame without letting out-of-top-2 regions inflate a box
        b1, b2, comps = lung_boxes_components_batch(
            lung_masks.astype(jnp.float32), box_mode=box_mode)
        coarse = jnp.stack([b1, b2], axis=1).astype(jnp.float32) * s
        refined = refine_boxes_bilinear(
            lung_probs[..., 0].astype(jnp.float32), comps, coarse,
            lung_threshold, (h, w))
        b1, b2 = refined[:, 0], refined[:, 1]
    else:
        if box_mode == "bisect":
            b1, b2, _ = lung_boxes_components_batch(
                lung_masks.astype(jnp.float32), box_mode="bisect")
        else:
            b1, b2 = lung_boxes_batch(lung_masks.astype(jnp.float32))
        b1, b2 = b1.astype(jnp.float32), b2.astype(jnp.float32)
        if s > 1:
            # pooled cell (x, y) covers model px [x·s, x·s + s): scaling the
            # pooled box by s already covers the exact stride-1 box on every
            # side (x0p·s ≤ x0 and (x1p+1)·s − 1 ≥ x1), overshooting by < s
            # px per side and never leaving the lung frame
            b1 = b1 * s
            b2 = b2 * s
        sy = h / lung_hw[0]
        sx = w / lung_hw[1]
        scale = jnp.array([sx, sy, sx, sy], jnp.float32)         # (x, y, w, h)
        b1 = b1 * scale
        b2 = b2 * scale

    # stage 3: the task1 serving chain with predicted boxes (CLAHE reused)
    x = serving_preproc(enhanced, b1, b2, model_hw, interpret=interpret,
                        pre_enhanced=True)
    probs = seg_apply(x)
    masks = probs if threshold is None else probs > threshold
    if cls_apply is None:
        return masks, b1, b2
    x_cls = x
    if cls_hw is not None and tuple(cls_hw) != tuple(model_hw):
        # LINEAR, matching the interpolation family the classifier's
        # training data is built with (ingest._resize_batch_linear downscales
        # the crop frame to new_dim) — 'area' here added an
        # interpolation-family train/serve skew on top of the inherent
        # crop-frame one (ADVICE r4); the remaining skew (training resizes
        # from the ~(250,125) crop frame, serving from the model_hw crop) is
        # measured benign in scripts/measure_serve_train_skew.py
        x_cls = resize2d(x[..., 0], cls_hw, "linear")[..., None]
    cls_probs = cls_apply(x_cls)[:, 0]                           # (B,) f32
    return masks, cls_probs, b1, b2


@functools.partial(jax.jit, static_argnames=(
    "lung_model", "seg_model", "cls_model", "model_hw", "lung_threshold",
    "threshold", "interpret", "ccl_stride", "lung_hw", "refine_boxes",
    "cls_hw"))
def one_stop_infer(
    lung_model,
    lung_variables,
    seg_model,
    seg_variables,
    cls_model,
    cls_variables,
    raw_u8: Array,
    model_hw: tuple[int, int] = (224, 224),
    lung_threshold: float = 0.5,
    threshold: float | None = 0.5,
    interpret: bool = False,
    ccl_stride: int = 2,
    lung_hw: tuple[int, int] | None = None,
    refine_boxes: bool = True,
    cls_hw: tuple[int, int] | None = None,
):
    """The FULL one-stop chain the repository is named for: raw CT slices →
    lung segmentation (stage 1) → predicted crop boxes (stage 2) → infection
    segmentation AND infected/healthy classification on the same cropped
    input (stage 3), one jit program, no ground truth anywhere.

    Returns ``(masks, cls_probs, boxes1, boxes2)`` — ``cls_probs`` is the
    task2 classifier's per-slice infection probability (B,) float32. The
    classifier rides the infection U-Net's stage-3 input with no extra
    preprocessing: both consume the identical CLAHE'd two-lung crop (the
    reference trains task2 on the very arrays task1 segments,
    ``task2:413-418``), so the only added cost is the ~1.7 M-param CNN
    forward — ~3% of the chain's FLOPs but a measured 18.7% of its
    wall-clock (scripts/profile_one_stop.py: 160.7 → 190.8 ms per 256
    slices; the 16-channel stage-0/1 convs sit at the same C<128 lane
    ceiling the decoder study proved structural). The
    reference has no equivalent: its three tasks are disconnected notebooks
    that each require ground-truth lung masks to produce their inputs.

    The classifier's Flatten→Dense head pins its input to the resolution it
    was trained at — ``model_hw`` must match (224² for the reference
    topology), or pass ``cls_hw`` to serve a classifier trained at a lower
    resolution on one extra linear resize of the same crop (the measured
    overhead reduction — see ``_chain_stages``)."""
    lung_apply = lambda x: lung_model.apply(lung_variables, x, train=False)
    seg_apply = lambda x: seg_model.apply(
        seg_variables, x.astype(seg_model.dtype), train=False)
    cls_apply = lambda x: cls_model.apply(
        cls_variables, x.astype(cls_model.dtype), train=False)
    return _chain_stages(lung_apply, seg_apply, raw_u8, model_hw,
                         lung_threshold, threshold, interpret, ccl_stride,
                         lung_hw, cls_apply=cls_apply,
                         refine_boxes=refine_boxes, cls_hw=cls_hw)


def chained_infer_sharded(
    mesh,
    lung_model,
    lung_variables,
    seg_model,
    seg_variables,
    raw_u8: Array,
    axis: str = "data",
    **kw,
):
    """Data-parallel no-GT chain over a device mesh: the slice batch shards
    over ``axis``; every device runs the full chain (CLAHE → lung U-Net →
    CCL boxes → crop → infection U-Net) on its shard with replicated
    weights. Like ``ops.pipeline.fused_infer_sharded``, this uses shard_map
    (GSPMD cannot partition the Pallas ``pallas_call``); serving is
    embarrassingly data-parallel, so no collectives appear. The batch must
    divide the axis size."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def fn(x):
        return chained_infer(lung_model, lung_variables, seg_model,
                             seg_variables, x, **kw)

    return shard_map(fn, mesh=mesh, in_specs=(P(axis),),
                     out_specs=(P(axis), P(axis), P(axis)),
                     check_vma=False)(raw_u8)


def one_stop_infer_sharded(
    mesh,
    lung_model,
    lung_variables,
    seg_model,
    seg_variables,
    cls_model,
    cls_variables,
    raw_u8: Array,
    axis: str = "data",
    **kw,
):
    """Data-parallel one-stop chain (lung seg + infection seg +
    classification) over a device mesh — ``chained_infer_sharded`` with the
    classifier riding stage 3. Returns ``(masks, cls_probs, boxes1, boxes2)``
    with every output sharded over ``axis``."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def fn(x):
        return one_stop_infer(lung_model, lung_variables, seg_model,
                              seg_variables, cls_model, cls_variables, x, **kw)

    return shard_map(fn, mesh=mesh, in_specs=(P(axis),),
                     out_specs=(P(axis), P(axis), P(axis), P(axis)),
                     check_vma=False)(raw_u8)


@functools.partial(jax.jit, static_argnames=("new_dim", "use_pallas"))
def _kernel_enhance_resize(u8, new_dim, use_pallas=False):
    """CLAHE + plain INTER_AREA resize for the full-frame lung pairs."""
    from onestop_tpu.ops.clahe import clahe

    enhanced = clahe_fused(u8) if use_pallas else jax.vmap(clahe)(u8)
    return resize2d(enhanced.astype(jnp.float32), (new_dim, new_dim), "area")


def build_plain_lung_dataset(case_slices, cfg):
    """Full-frame (uncropped) lung training pairs for the chain's stage-1
    model: CLAHE'd CT and binarized lung mask, both plain-resized to
    ``cfg.new_dim`` (INTER_AREA) — no boxes anywhere, exactly the transform
    ``chained_infer`` applies at serving time. Returns (cts, lungs) as
    (N, d, d, 1) float32 in [0, 1]."""
    from onestop_tpu.data.ingest import _run_chunked, _to_u8, _use_pallas_clahe

    kernel = functools.partial(_kernel_enhance_resize, new_dim=cfg.new_dim,
                               use_pallas=_use_pallas_clahe())
    cts_parts, lung_parts = [], []
    for ct_s, lung_s in case_slices:
        lungs_bin = (lung_s > 0).astype(np.float64)
        keep = lungs_bin.reshape(lungs_bin.shape[0], -1).max(axis=1) > 0
        if not keep.any():
            continue
        cts_parts.append(_run_chunked(kernel, [_to_u8(ct_s[keep])]))
        lung_parts.append(np.asarray(
            resize2d(jnp.asarray(lungs_bin[keep] * 255.0, jnp.float32),
                     (cfg.new_dim, cfg.new_dim), "area")))
    if not cts_parts:
        raise ValueError(
            "build_plain_lung_dataset: no case has a lung-positive slice — "
            "every lung mask is empty; check the mask source/labeling")
    cts = np.concatenate(cts_parts, axis=0).astype(np.float32) / 255.0
    lungs = np.concatenate(lung_parts, axis=0).astype(np.float32) / 255.0
    return cts[..., None], lungs[..., None]
