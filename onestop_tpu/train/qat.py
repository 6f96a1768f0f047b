"""Quantization-aware training: fake-quantize every 3×3 conv during the
training forward so the learned weights are robust to the int8 serving path.

Why this exists: int8 serving (serve_int8.py, 1.34× throughput) passes the
round-3 quality gate for every model FAMILY, but sensitivity is
PER-CHECKPOINT — one lung/seg checkpoint lost 0.024 chained dice under int8
while another gained 0.001 on the identical arm
(artifacts_tpu/round3_fast112_int8_diag.json). Post-training quantization is
a lottery over where training happened to leave the weight distribution; QAT
removes the lottery by training THROUGH the quantizer.

Mechanism (standard fake-quant + straight-through estimator, mirroring
serve_int8's serving quantizer exactly):

- every 3×3 ``nn.Conv`` (the same ``serve_int8._is_q_conv`` predicate the
  serving quantizer uses, so the QAT'd and served op sets are identical by
  construction) computes ``conv(fq(x, sx), fq(W, kscale)) + b`` where
  ``fq(v, s) = round(clip(v/s, ±127))·s`` with gradients passed straight
  through (``v + stop_gradient(fq(v) − v)``);
- activation scale ``sx`` = per-tensor live-batch amax/127 (serving uses a
  calibration-set amax — the small train/serve scale gap is the standard
  QAT protocol and is covered by the serving gate); under data-parallel
  training the amax is per-shard (computed inside the shard_map'd program),
  so DP-QAT is not bit-equal to single-device QAT — same training-noise
  class as the per-batch scale itself (tests/test_qat.py DP test);
- kernel scale = per-output-channel amax/127, recomputed from the live
  weights each step (exactly ``serve_int8.calibrate_and_quantize``'s law);
- BatchNorm, ConvTranspose, Dense, and the 1×1 sigmoid heads stay in the
  model dtype — same exclusions as serving. BN statistics are updated from
  the fake-quantized activations, matching what serving sees.
- ``ConvStemS2D`` (not an ``nn.Conv``; unquantized at serving when the
  checkpoint is served stem-on) is fake-quantized through its plain-conv
  branch when ``quantize_stem`` — needed because runners TRAIN stem-on but
  SERVE stem-off (params identical), where the first conv IS an ``nn.Conv``
  the serving quantizer intercepts. The packed s2d fast path is bypassed for
  that one conv under QAT (its backward speedup is forfeited on 1 of 23
  convs; correctness is exact — the packed/plain forms are math-identical).

Use: ``TrainConfig(qat=True)`` — the Trainer wraps its train/eval/predict
forwards with ``qat_methods()``; evaluation and prediction also run
fake-quantized so val metrics, threshold sweeps, and best-checkpoint
selection reflect the deployed (quantized) model rather than the f32 one.

The reference has no counterpart (single-precision Keras, no deployment
path); this is framework-native TPU serving support (v5e s8×s8→s32 runs at
2× the bf16 MXU rate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from onestop_tpu.models.common import ConvStemS2D
from onestop_tpu.serve_int8 import _is_q_conv


def fake_quant(v, scale):
    """round-to-int8 on a scale grid, straight-through gradients."""
    q = jnp.clip(jnp.round(v / scale), -127, 127) * scale
    return v + jax.lax.stop_gradient(q - v)


def _fq_conv(x, kernel, bias):
    """conv(fq(x), fq(W)) + b — the fake-quantized 3×3 SAME stride-1 conv
    (all quantized convs in the three model families are this shape)."""
    f32 = jnp.float32
    xf = x.astype(f32)
    wf = jnp.asarray(kernel, f32)
    sx = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0)
    kscale = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)), 1e-12) / 127.0)
    y = jax.lax.conv_general_dilated(
        fake_quant(xf, sx).astype(x.dtype),
        fake_quant(wf, kscale).astype(x.dtype),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + jnp.asarray(bias, y.dtype)


def qat_interceptor(quantize_stem: bool = True):
    """A flax method interceptor fake-quantizing exactly the conv set the
    int8 serving path quantizes (``serve_int8.quantize_model``)."""

    def ic(next_fun, args, kwargs, context):
        m = context.module
        if context.method_name != "__call__":
            return next_fun(*args, **kwargs)
        if _is_q_conv(m) or (quantize_stem and isinstance(m, ConvStemS2D)):
            p = m.variables["params"]
            return _fq_conv(args[0], p["kernel"], p["bias"])
        return next_fun(*args, **kwargs)

    return ic


def qat_methods(quantize_stem: bool = True):
    """Context manager: ``with qat_methods(): model.apply(...)`` runs the
    forward with fake-quantized convs (works under jit/scan tracing)."""
    return nn.intercept_methods(qat_interceptor(quantize_stem))


def qat_apply_model(model, quantize_stem: bool = True):
    """Apply-only holder whose ``.apply`` runs the model's forward under
    ``qat_methods()`` — the one hook both trainers (train.Trainer and
    parallel.cv.FoldParallelTrainer) route every train/eval/predict forward
    through when ``cfg.qat``. Only ``.apply`` is exposed: init and module
    attributes (bn_axis, widths, ...) must keep coming from the real flax
    module, which stays un-wrapped on the trainer."""
    _plain_apply = model.apply

    def _qat_apply(*a, **kw):
        with qat_methods(quantize_stem):
            return _plain_apply(*a, **kw)

    return type("_QATModel", (), {"apply": staticmethod(_qat_apply)})()
