"""Opt-in int8 serving path for the U-Net — the 2× MXU headroom beyond bf16.

v5e executes s8×s8→s32 matmuls/convolutions at twice the bf16 rate (~394
TOPS vs 197 TFLOP/s) and int8 conv operands halve HBM traffic. This module
quantizes a trained U-Net's 3×3 convolutions symmetrically:

- kernels per output channel:  w_q = round(W / kscale[o]), kscale = amax/127
- activations per conv input, static scales from a calibration pass:
  x_q = clip(round(x / sx), ±127)
- conv accumulates in int32; dequant is a per-channel f32 scale (sx·kscale)
  + bias, fused by XLA into the conv epilogue.

ConvTranspose (0.8 G of 18.4 GFLOPs/slice), BatchNorm, and the sigmoid head
stay in the model dtype — they are bandwidth-, not MXU-bound. The explicit
forward below mirrors ``models.unet.UNet`` (inference mode) exactly;
equivalence of the f32 calibration forward vs ``model.apply`` and the int8
quality delta are asserted in tests/test_int8.py.

This path is OPT-IN: the headline bench and all quality numbers use the
bf16 path; int8 is for deployments that accept a measured ~1e-2 probability
perturbation (mask agreement typically >99.5% at threshold 0.5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from onestop_tpu.models.common import BN_EPSILON

Array = jax.Array


def _bn_affine(bn_params, bn_stats, eps: float = BN_EPSILON):
    """Inference BatchNorm as (mul, add) per channel, f32. ``eps`` must
    match the checkpoint's training ``ModelConfig.bn_epsilon`` (default is
    the Keras constant every config ships with)."""
    scale = jnp.asarray(bn_params["scale"], jnp.float32)
    bias = jnp.asarray(bn_params["bias"], jnp.float32)
    mean = jnp.asarray(bn_stats["mean"], jnp.float32)
    var = jnp.asarray(bn_stats["var"], jnp.float32)
    mul = scale * jax.lax.rsqrt(var + eps)
    return mul, bias - mean * mul


def _conv_f32(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel, x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + jnp.asarray(bias, x.dtype)


def _convt_f32(x, kernel, bias):
    y = jax.lax.conv_transpose(
        x, jnp.asarray(kernel, x.dtype), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + jnp.asarray(bias, x.dtype)


def _unet_forward(params, batch_stats, x, widths, qconv, record=None,
                  bn_eps: float = BN_EPSILON):
    """Shared inference forward for the calibration (f32) and int8 paths.

    qconv(x, layer_name, kernel, bias) computes a 3×3 SAME conv; ``record``
    (a dict) collects per-conv-input amax during calibration."""
    p, bs = params, batch_stats

    def conv(x, name):
        if record is not None:
            record[name] = jnp.maximum(
                record.get(name, 0.0), jnp.max(jnp.abs(x)).astype(jnp.float32))
        return qconv(x, name, p[name]["kernel"], p[name]["bias"])

    skips = []
    for i in range(len(widths)):
        x = jax.nn.relu(conv(x, f"enc{i}_conv0"))
        x = jax.nn.relu(conv(x, f"enc{i}_conv1"))
        mul, add = _bn_affine(p[f"enc{i}_bn"], bs[f"enc{i}_bn"], bn_eps)
        x = x * mul.astype(x.dtype) + add.astype(x.dtype)
        skips.append(x)
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    x = jax.nn.relu(conv(x, "bridge_conv0"))
    x = jax.nn.relu(conv(x, "bridge_conv1"))
    for i in reversed(range(len(widths))):
        x = _convt_f32(x, p[f"dec{i}_up"]["kernel"], p[f"dec{i}_up"]["bias"])
        x = jnp.concatenate([x, skips[i]], axis=-1)
        mul, add = _bn_affine(p[f"dec{i}_bn"], bs[f"dec{i}_bn"], bn_eps)
        x = x * mul.astype(x.dtype) + add.astype(x.dtype)
        x = jax.nn.relu(conv(x, f"dec{i}_conv0"))
        x = jax.nn.relu(conv(x, f"dec{i}_conv1"))
    head = p["head"]
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(head["kernel"], x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + jnp.asarray(head["bias"], x.dtype)
    return jax.nn.sigmoid(y.astype(jnp.float32))


def calibrate_and_quantize(variables, x_cal, widths=(32, 64, 128, 256),
                           bn_eps: float = BN_EPSILON) -> dict:
    """One f32 calibration pass over ``x_cal`` (a representative batch) →
    quantized tree: per-conv int8 kernels, per-channel kernel scales,
    per-conv-input activation scales, f32 biases + BN/up/head params."""
    params = jax.tree_util.tree_map(np.asarray, jax.device_get(variables["params"]))
    stats = jax.tree_util.tree_map(np.asarray, jax.device_get(variables["batch_stats"]))

    record = {}
    _unet_forward(params, stats, jnp.asarray(x_cal, jnp.float32), widths,
                  qconv=lambda x, name, k, b: _conv_f32(x, k, b), record=record,
                  bn_eps=bn_eps)
    act_scales = {k: float(np.maximum(np.asarray(v), 1e-12)) / 127.0
                  for k, v in record.items()}

    q = {"params": params, "batch_stats": stats, "widths": tuple(widths),
         "bn_eps": bn_eps,
         "act_scales": act_scales, "kernels_q": {}, "kscales": {}}
    for name in act_scales:  # every quantized 3×3 conv
        w = np.asarray(params[name]["kernel"], np.float64)
        kscale = np.maximum(np.abs(w).reshape(-1, w.shape[-1]).max(axis=0), 1e-12) / 127.0
        q["kernels_q"][name] = np.clip(np.round(w / kscale), -127, 127).astype(np.int8)
        q["kscales"][name] = kscale.astype(np.float32)
    return q


def unet_apply_int8(q: dict, x: Array, dtype=jnp.bfloat16) -> Array:
    """Int8 inference forward. x: (B, H, W, 1) in [0, 1]. Returns f32 probs."""
    kernels_q, kscales, act_scales = q["kernels_q"], q["kscales"], q["act_scales"]

    def qconv(x, name, kernel, bias):
        sx = act_scales[name]
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, jnp.asarray(kernels_q[name]), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        deq = (sx * jnp.asarray(kscales[name])).astype(jnp.float32)
        return (y.astype(jnp.float32) * deq
                + jnp.asarray(bias, jnp.float32)).astype(dtype)

    return _unet_forward(q["params"], q["batch_stats"], x.astype(dtype),
                         q["widths"], qconv=qconv,
                         bn_eps=q.get("bn_eps", BN_EPSILON))


# ---------------------------------------------------------------------------
# generic int8 path (all three model families) via flax method interception
# ---------------------------------------------------------------------------
#
# Instead of mirroring each family's forward by hand (the UNet-specific path
# above), intercept every 3×3 ``nn.Conv`` call inside ``model.apply``: the
# calibration pass records each conv's input amax; the int8 pass replaces
# the conv with s8×s8→s32 + per-channel dequant. Everything else (BN,
# ConvTranspose, pooling, dense, dropout-off, the nested U-Net++ skips) runs
# through the model's own code — equivalence is by construction, asserted in
# tests/test_int8.py. The 1×1 sigmoid heads and Dense layers stay in the
# model dtype: they are a negligible share of the FLOPs and the most
# precision-sensitive.

def _is_q_conv(module) -> bool:
    """True iff this conv is one the int8 path re-executes faithfully.

    Both interceptors (the int8 serving quantizer below and QAT's
    ``_fq_conv``) replace matched convs with a stride-1 SAME bias-ful
    ungrouped ``lax.conv`` — so the predicate must require exactly that
    shape, not just kernel_size: a 3×3 conv with e.g. strides=(2,2),
    'VALID' padding, feature groups, or no bias would otherwise be silently
    recomputed as a different network. All convs in the three model
    families match; anything exotic safely stays unquantized."""
    from flax import linen as nn

    if not (isinstance(module, nn.Conv) and tuple(module.kernel_size) == (3, 3)):
        return False
    strides = module.strides or (1, 1)
    strides = (strides, strides) if isinstance(strides, int) else tuple(strides)
    return (strides == (1, 1)
            and module.padding == "SAME"
            and module.feature_group_count == 1
            and module.use_bias
            and module.kernel_dilation in (1, (1, 1), None)
            and module.input_dilation in (1, (1, 1), None))


def quantize_model(model, variables, x_cal) -> dict:
    """Calibrate (one f32 pass over ``x_cal``) and quantize every 3×3 conv
    of ANY onestop model (UNet / UNetPP / ClassifierCNN). Returns a
    quantization tree for ``apply_int8_model``."""
    from flax import linen as nn

    record: dict[str, float] = {}

    def cal_ic(next_fun, args, kwargs, context):
        m = context.module
        if _is_q_conv(m) and context.method_name == "__call__":
            key = "/".join(m.path)
            amax = float(jnp.max(jnp.abs(args[0].astype(jnp.float32))))
            record[key] = max(record.get(key, 0.0), amax)
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(cal_ic):
        model.apply(variables, jnp.asarray(x_cal, jnp.float32), train=False)

    params = jax.tree_util.tree_map(np.asarray, jax.device_get(variables["params"]))
    q = {"act_scales": {}, "kernels_q": {}, "kscales": {}}
    for key, amax in record.items():
        node = params
        for part in key.split("/"):
            node = node[part]
        w = np.asarray(node["kernel"], np.float64)
        kscale = np.maximum(np.abs(w).reshape(-1, w.shape[-1]).max(axis=0), 1e-12) / 127.0
        q["act_scales"][key] = max(amax, 1e-12) / 127.0
        q["kernels_q"][key] = np.clip(np.round(w / kscale), -127, 127).astype(np.int8)
        q["kscales"][key] = kscale.astype(np.float32)
    return q


def apply_int8_model(model, q: dict, variables, x: Array,
                     dtype=jnp.bfloat16) -> Array:
    """``model.apply(variables, x, train=False)`` with every calibrated 3×3
    conv executed in int8 (s8×s8→s32 on the MXU, per-channel dequant)."""
    from flax import linen as nn

    kernels_q, kscales, act_scales = q["kernels_q"], q["kscales"], q["act_scales"]

    def int8_ic(next_fun, args, kwargs, context):
        m = context.module
        if not (_is_q_conv(m) and context.method_name == "__call__"):
            return next_fun(*args, **kwargs)
        key = "/".join(m.path)
        if key not in kernels_q:
            return next_fun(*args, **kwargs)
        xx = args[0]
        sx = act_scales[key]
        xq = jnp.clip(jnp.round(xx.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, jnp.asarray(kernels_q[key]), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        deq = (sx * jnp.asarray(kscales[key])).astype(jnp.float32)
        bias = jnp.asarray(m.variables["params"]["bias"], jnp.float32)
        return (y.astype(jnp.float32) * deq + bias).astype(dtype)

    with nn.intercept_methods(int8_ic):
        return model.apply(variables, x.astype(dtype), train=False)


@functools.partial(jax.jit, static_argnames=(
    "lung_model", "seg_model", "model_hw", "lung_threshold", "threshold",
    "interpret", "ccl_stride", "lung_hw", "refine_boxes", "box_mode"))
def chained_infer_mixed(
    lung_model,
    lung_variables,
    seg_model,
    seg_q: dict,
    seg_variables,
    raw_u8: Array,
    model_hw: tuple[int, int] = (224, 224),
    lung_threshold: float = 0.5,
    threshold: float | None = 0.5,
    interpret: bool = False,
    ccl_stride: int = 2,
    lung_hw: tuple[int, int] | None = None,
    refine_boxes: bool = True,
    box_mode: str = "ccl",
):
    """bf16 lung stage + int8 infection stage — the right precision split
    for the fast low-res preset. Box refinement thresholds the bilinearly
    *upsampled* lung probability field, so int8's ~1e-2 probability
    perturbation moves the subpixel box edges by up to a full coarse cell:
    measured at lung_hw=112 the all-int8 chain drops chained dice to 0.914
    vs bf16's 0.941 (artifacts_tpu/round3_refined_boxes.json,
    dice_112_s2_refine_int8) — while at the 112 resolution the lung stage is
    already cheap, so quantizing it buys little. Keeping stage 1 bf16 makes
    the boxes bit-identical to the bf16 chain; only the infection U-Net
    (which passes its own int8 gate) quantizes."""
    from onestop_tpu.production import _chain_stages

    lung_apply = lambda x: lung_model.apply(lung_variables, x, train=False)
    seg_apply = lambda x: apply_int8_model(seg_model, seg_q, seg_variables, x)
    return _chain_stages(lung_apply, seg_apply, raw_u8, model_hw,
                         lung_threshold, threshold, interpret, ccl_stride,
                         lung_hw, refine_boxes=refine_boxes,
                         box_mode=box_mode)


def chained_infer_mixed_sharded(
    mesh,
    lung_model,
    lung_variables,
    seg_model,
    seg_q: dict,
    seg_variables,
    raw_u8: Array,
    axis: str = "data",
    **kw,
):
    """Data-parallel ``chained_infer_mixed`` over a device mesh — the
    PROMOTED deployment config (bf16 low-res lung stage + probability-field
    box refinement + int8 infection U-Net) sharded exactly like
    ``production.chained_infer_sharded``: the slice batch shards over
    ``axis`` via shard_map (GSPMD cannot partition the Pallas CLAHE), the
    bf16 weights and int8 kernel/scale tables replicate, and no collectives
    appear (serving is embarrassingly data-parallel). The batch must divide
    the axis size."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def fn(x):
        return chained_infer_mixed(lung_model, lung_variables, seg_model,
                                   seg_q, seg_variables, x, **kw)

    return shard_map(fn, mesh=mesh, in_specs=(P(axis),),
                     out_specs=(P(axis), P(axis), P(axis)),
                     check_vma=False)(raw_u8)


@functools.partial(jax.jit, static_argnames=(
    "lung_model", "seg_model", "model_hw", "lung_threshold", "threshold",
    "interpret", "ccl_stride", "lung_hw", "refine_boxes"))
def chained_infer_int8(
    lung_model,
    lung_q: dict,
    lung_variables,
    seg_model,
    seg_q: dict,
    seg_variables,
    raw_u8: Array,
    model_hw: tuple[int, int] = (224, 224),
    lung_threshold: float = 0.5,
    threshold: float | None = 0.5,
    interpret: bool = False,
    ccl_stride: int = 2,
    lung_hw: tuple[int, int] | None = None,
    refine_boxes: bool = True,
):
    """The full no-GT chain (``production.chained_infer``) with BOTH U-Nets
    served int8 — the box stage tolerates quantization trivially (boxes move
    only if a whole connected-component boundary pixel flips at the 0.5
    threshold), and the infection stage carries the measured per-family
    quality gate (RESULTS.md int8 table). Same stage implementation as the
    bf16 chain (``production._chain_stages``)."""
    from onestop_tpu.production import _chain_stages

    lung_apply = lambda x: apply_int8_model(lung_model, lung_q,
                                            lung_variables, x)
    seg_apply = lambda x: apply_int8_model(seg_model, seg_q, seg_variables, x)
    return _chain_stages(lung_apply, seg_apply, raw_u8, model_hw,
                         lung_threshold, threshold, interpret, ccl_stride,
                         lung_hw, refine_boxes=refine_boxes)


@functools.partial(jax.jit, static_argnames=(
    "lung_model", "seg_model", "cls_model", "model_hw", "lung_threshold",
    "threshold", "interpret", "ccl_stride", "lung_hw", "refine_boxes",
    "cls_hw"))
def one_stop_infer_int8(
    lung_model,
    lung_q: dict,
    lung_variables,
    seg_model,
    seg_q: dict,
    seg_variables,
    cls_model,
    cls_q: dict,
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
    """``production.one_stop_infer`` (lung seg + infection seg +
    classification, one jit, no GT) with all THREE models served int8 —
    every family passes the round-3 quality gate (RESULTS.md int8 table;
    the classifier's AUC is bit-identical under quantization there).
    Returns ``(masks, cls_probs, boxes1, boxes2)``."""
    from onestop_tpu.production import _chain_stages

    lung_apply = lambda x: apply_int8_model(lung_model, lung_q,
                                            lung_variables, x)
    seg_apply = lambda x: apply_int8_model(seg_model, seg_q, seg_variables, x)
    cls_apply = lambda x: apply_int8_model(cls_model, cls_q, cls_variables, x)
    return _chain_stages(lung_apply, seg_apply, raw_u8, model_hw,
                         lung_threshold, threshold, interpret, ccl_stride,
                         lung_hw, cls_apply=cls_apply,
                         refine_boxes=refine_boxes, cls_hw=cls_hw)


@functools.partial(jax.jit, static_argnames=(
    "lung_model", "seg_model", "cls_model", "model_hw", "lung_threshold",
    "threshold", "interpret", "ccl_stride", "lung_hw", "refine_boxes",
    "cls_hw"))
def one_stop_infer_mixed(
    lung_model,
    lung_variables,
    seg_model,
    seg_q: dict,
    seg_variables,
    cls_model,
    cls_q: dict,
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
    """One-stop chain with the ``chained_infer_mixed`` precision split:
    bf16 lung stage (boxes bit-identical to the bf16 chain — box refinement
    is sensitive to probability quantization at low lung resolutions), int8
    infection U-Net + classifier (both pass their per-family gates)."""
    from onestop_tpu.production import _chain_stages

    lung_apply = lambda x: lung_model.apply(lung_variables, x, train=False)
    seg_apply = lambda x: apply_int8_model(seg_model, seg_q, seg_variables, x)
    cls_apply = lambda x: apply_int8_model(cls_model, cls_q, cls_variables, x)
    return _chain_stages(lung_apply, seg_apply, raw_u8, model_hw,
                         lung_threshold, threshold, interpret, ccl_stride,
                         lung_hw, cls_apply=cls_apply,
                         refine_boxes=refine_boxes, cls_hw=cls_hw)


@functools.partial(jax.jit, static_argnames=("out_hw", "threshold", "interpret"))
def fused_infer_int8(
    q: dict,
    imgs_u8: Array,
    boxes1: Array,
    boxes2: Array,
    out_hw: tuple[int, int] = (224, 224),
    threshold: float | None = 0.5,
    interpret: bool = False,
):
    """The serving chain (ops.pipeline.fused_infer) with the int8 U-Net;
    preprocessing is shared with the bf16 path (pipeline.serving_preproc)."""
    from onestop_tpu.ops.pipeline import serving_preproc

    x = serving_preproc(imgs_u8, boxes1, boxes2, out_hw, interpret=interpret)
    probs = unet_apply_int8(q, x)
    if threshold is None:
        return probs
    return probs > threshold
