"""Int8 serving path (onestop_tpu.serve_int8): the explicit inference
forward must match UNet.apply exactly in f32, and the quantized path must
stay within a small, measured delta of it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onestop_tpu.models import UNet
from onestop_tpu.serve_int8 import (
    _conv_f32, _unet_forward, calibrate_and_quantize, fused_infer_int8,
    unet_apply_int8)

_WIDTHS = (4, 8)


def _trained_like_variables(rng):
    """Random init, then perturb BN stats so inference BN is non-trivial."""
    model = UNet(widths=_WIDTHS, bridge=16)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 64, 64, 1)), train=False)
    v = jax.tree_util.tree_map(np.asarray, jax.device_get(v))
    for name, col in v["batch_stats"].items():
        col["mean"] = col["mean"] + rng.normal(0, 0.05, col["mean"].shape).astype(np.float32)
        col["var"] = col["var"] * (1 + rng.uniform(0, 0.3, col["var"].shape)).astype(np.float32)
    # amplify the head so probabilities spread over [0, 1] like a trained
    # model's (fresh-init outputs all sit at sigmoid(~0) = 0.5)
    v["params"]["head"]["kernel"] = v["params"]["head"]["kernel"] * 60.0
    return model, v


def test_explicit_forward_matches_unet_apply(rng):
    model, v = _trained_like_variables(rng)
    x = jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32)
    ref = np.asarray(model.apply(v, x, train=False))
    got = np.asarray(_unet_forward(
        v["params"], v["batch_stats"], x, _WIDTHS,
        qconv=lambda xx, name, k, b: _conv_f32(xx, k, b)))
    np.testing.assert_allclose(ref, got, rtol=0, atol=2e-5)


def test_int8_quality_delta_and_agreement(rng):
    model, v = _trained_like_variables(rng)
    x_cal = jnp.asarray(rng.random((4, 64, 64, 1)), jnp.float32)
    q = calibrate_and_quantize(v, x_cal, widths=_WIDTHS)
    # every 3x3 conv got quantized
    assert set(q["kernels_q"]) == {
        "enc0_conv0", "enc0_conv1", "enc1_conv0", "enc1_conv1",
        "bridge_conv0", "bridge_conv1",
        "dec0_conv0", "dec0_conv1", "dec1_conv0", "dec1_conv1"}
    x = jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32)
    ref = np.asarray(model.apply(v, x, train=False))
    got = np.asarray(unet_apply_int8(q, x, dtype=jnp.float32))
    delta = np.abs(ref - got)
    assert delta.mean() < 0.03, delta.mean()
    assert delta.max() < 0.25  # boundary pixels under the amplified head
    # judge mask agreement where the reference is confident (a trained model
    # is confident nearly everywhere; pixels at prob≈0.5 flip on any noise)
    confident = np.abs(ref - 0.5) > 0.05
    assert confident.mean() > 0.5  # the statistic is meaningful
    agree = ((ref > 0.5) == (got > 0.5))[confident].mean()
    assert agree > 0.99, agree


@pytest.mark.slow
def test_fused_infer_int8_end_to_end(rng):
    _, v = _trained_like_variables(rng)
    q = calibrate_and_quantize(
        v, jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32), widths=_WIDTHS)
    imgs = jnp.asarray(rng.integers(0, 256, (2, 128, 128), dtype=np.uint8))
    b1 = jnp.tile(jnp.array([16, 20, 40, 80], jnp.int32), (2, 1))
    b2 = jnp.tile(jnp.array([70, 22, 38, 76], jnp.int32), (2, 1))
    masks = fused_infer_int8(q, imgs, b1, b2, out_hw=(64, 64),
                             threshold=0.5, interpret=True)
    assert masks.shape == (2, 64, 64, 1) and masks.dtype == jnp.bool_


# ---------------------------------------------------------------------------
# generic interceptor-based int8 (all three families)
# ---------------------------------------------------------------------------

def test_generic_int8_matches_unet_specific(rng):
    """quantize_model/apply_int8_model (flax interception) must agree with
    the hand-written UNet int8 path: same quantized kernels and scales, and
    matching outputs."""
    from onestop_tpu.serve_int8 import apply_int8_model, quantize_model

    model, v = _trained_like_variables(rng)
    x_cal = jnp.asarray(rng.random((4, 64, 64, 1)), jnp.float32)
    q_old = calibrate_and_quantize(v, x_cal, widths=_WIDTHS)
    q_new = quantize_model(model, v, x_cal)

    assert set(q_new["kernels_q"]) == set(q_old["kernels_q"])
    for k in q_old["kernels_q"]:
        np.testing.assert_array_equal(q_new["kernels_q"][k], q_old["kernels_q"][k])
        np.testing.assert_allclose(q_new["act_scales"][k], q_old["act_scales"][k],
                                   rtol=1e-6)

    x = jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32)
    ref = np.asarray(unet_apply_int8(q_old, x, dtype=jnp.float32))
    got = np.asarray(apply_int8_model(model, q_new, v, x, dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.slow
def test_generic_int8_unetpp(rng):
    from onestop_tpu.models import UNetPP
    from onestop_tpu.serve_int8 import apply_int8_model, quantize_model

    model = UNetPP(widths=(2, 4, 8, 16))
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 1)), train=False)
    v = jax.tree_util.tree_map(np.asarray, jax.device_get(v))
    v["params"]["head"]["kernel"] = v["params"]["head"]["kernel"] * 60.0
    x_cal = jnp.asarray(rng.random((4, 32, 32, 1)), jnp.float32)
    q = quantize_model(model, v, x_cal)
    assert len(q["kernels_q"]) == 20     # every 3x3 conv, head (1x1) excluded
    x = jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32)
    ref = np.asarray(model.apply(v, x, train=False))
    got = np.asarray(apply_int8_model(model, q, v, x, dtype=jnp.float32))
    assert np.abs(ref - got).mean() < 0.05


def test_generic_int8_classifier(rng):
    from onestop_tpu.models import ClassifierCNN
    from onestop_tpu.serve_int8 import apply_int8_model, quantize_model

    model = ClassifierCNN(widths=(4, 8), dense=8)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 1)), train=False)
    x_cal = jnp.asarray(rng.random((4, 32, 32, 1)), jnp.float32)
    q = quantize_model(model, v, x_cal)
    assert len(q["kernels_q"]) == 4      # 3x3 convs only; Dense stays f32/bf16
    x = jnp.asarray(rng.random((3, 32, 32, 1)), jnp.float32)
    ref = np.asarray(model.apply(v, x, train=False))
    got = np.asarray(apply_int8_model(model, q, v, x, dtype=jnp.float32))
    assert np.abs(ref - got).mean() < 0.05


@pytest.mark.slow
def test_chained_infer_int8_end_to_end(rng):
    """Both chain U-Nets served int8 through the shared stage implementation
    (production._chain_stages): shapes, dtypes, determinism, and boxes inside
    the raw frame — the int8 analog of the bf16 chained_infer smoke."""
    from onestop_tpu.serve_int8 import chained_infer_int8, quantize_model

    lung, vl = _trained_like_variables(rng)
    seg, vs = _trained_like_variables(rng)
    x_cal = jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32)
    q_l = quantize_model(lung, vl, x_cal)
    q_s = quantize_model(seg, vs, x_cal)
    imgs = jnp.asarray(rng.integers(0, 256, (2, 128, 128), dtype=np.uint8))
    masks, b1, b2 = chained_infer_int8(lung, q_l, vl, seg, q_s, vs, imgs,
                                       model_hw=(64, 64), threshold=0.5,
                                       interpret=True)
    assert masks.shape == (2, 64, 64, 1) and masks.dtype == jnp.bool_
    assert b1.shape == (2, 4) and b1.dtype == jnp.float32
    for b in (np.asarray(b1), np.asarray(b2)):
        assert (b[:, 0] + b[:, 2] <= 128 + 1e-3).all()
        assert (b[:, 1] + b[:, 3] <= 128 + 1e-3).all()
    masks2, _, _ = chained_infer_int8(lung, q_l, vl, seg, q_s, vs, imgs,
                                      model_hw=(64, 64), threshold=0.5,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(masks), np.asarray(masks2))


@pytest.mark.slow
def test_one_stop_infer_int8_end_to_end(rng):
    """All three families int8 through the shared stage implementation: the
    segmentation outputs must be bitwise identical to chained_infer_int8
    (the classifier rides the same stage-3 input and cannot perturb it), and
    the classification head emits valid per-slice probabilities."""
    from onestop_tpu.models import ClassifierCNN
    from onestop_tpu.serve_int8 import (
        chained_infer_int8, one_stop_infer_int8, quantize_model)

    lung, vl = _trained_like_variables(rng)
    seg, vs = _trained_like_variables(rng)
    cls = ClassifierCNN(widths=(4, 8), dense=8)
    vc = cls.init({"params": jax.random.PRNGKey(5)},
                  jnp.zeros((1, 64, 64, 1)), train=False)
    x_cal = jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32)
    q_l = quantize_model(lung, vl, x_cal)
    q_s = quantize_model(seg, vs, x_cal)
    q_c = quantize_model(cls, vc, x_cal)
    imgs = jnp.asarray(rng.integers(0, 256, (2, 128, 128), dtype=np.uint8))
    kw = dict(model_hw=(64, 64), threshold=0.5, interpret=True)

    ref_m, ref_b1, ref_b2 = chained_infer_int8(lung, q_l, vl, seg, q_s, vs,
                                               imgs, **kw)
    masks, probs, b1, b2 = one_stop_infer_int8(lung, q_l, vl, seg, q_s, vs,
                                               cls, q_c, vc, imgs, **kw)
    np.testing.assert_array_equal(np.asarray(ref_m), np.asarray(masks))
    np.testing.assert_array_equal(np.asarray(ref_b1), np.asarray(b1))
    np.testing.assert_array_equal(np.asarray(ref_b2), np.asarray(b2))
    probs = np.asarray(probs)
    assert probs.shape == (2,)
    assert (probs >= 0).all() and (probs <= 1).all()


@pytest.mark.slow
def test_chained_mixed_boxes_bitidentical_to_bf16():
    """The mixed split (bf16 lung stage + int8 infection U-Net,
    serve_int8.chained_infer_mixed) must produce boxes BIT-identical to the
    bf16 chain — only the stage-3 masks may differ (int8 seg)."""
    import numpy as np
    from onestop_tpu.models import UNet
    from onestop_tpu.production import chained_infer
    from onestop_tpu.serve_int8 import chained_infer_mixed, quantize_model

    hw = 64
    lung = UNet(widths=(4, 8), bridge=16)
    seg = UNet(widths=(4, 8), bridge=16)
    vl = lung.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, hw, hw, 1)), train=False)
    vs = seg.init({"params": jax.random.PRNGKey(1)},
                  jnp.zeros((1, hw, hw, 1)), train=False)
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.integers(0, 256, (2, hw, hw), dtype=np.uint8))
    cal = jnp.asarray(rng.random((4, hw, hw, 1)), jnp.float32)
    q_seg = quantize_model(seg, vs, cal)

    kw = dict(model_hw=(hw, hw), threshold=0.5, interpret=True)
    _, b1, b2 = chained_infer(lung, vl, seg, vs, imgs, **kw)
    m, mb1, mb2 = chained_infer_mixed(lung, vl, seg, q_seg, vs, imgs, **kw)
    np.testing.assert_array_equal(np.asarray(mb1), np.asarray(b1))
    np.testing.assert_array_equal(np.asarray(mb2), np.asarray(b2))
    assert m.shape == (2, hw, hw, 1)


@pytest.mark.slow
def test_serve_volumes_mixed_quant(tmp_path):
    """quant without a 'lung' key routes through the mixed split."""
    import numpy as np
    from onestop_tpu.data.nifti import save_nifti
    from onestop_tpu.data.synthetic import synthetic_case
    from onestop_tpu.models import UNet
    from onestop_tpu.serve import serve_volumes
    from onestop_tpu.serve_int8 import quantize_model

    hw = 64
    case = synthetic_case(seed=31, hw=hw, n_slices=8)
    p = tmp_path / "v.nii.gz"
    save_nifti(p, case.ct)
    lung = UNet(widths=(4, 8), bridge=16)
    seg = UNet(widths=(4, 8), bridge=16)
    vl = lung.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, hw, hw, 1)), train=False)
    vs = seg.init({"params": jax.random.PRNGKey(1)},
                  jnp.zeros((1, hw, hw, 1)), train=False)
    cal = jnp.asarray(np.random.default_rng(0).random((4, hw, hw, 1)),
                      jnp.float32)
    quant = {"seg": quantize_model(seg, vs, cal)}
    r = next(iter(serve_volumes([str(p)], lung, vl, seg, vs, quant=quant,
                                img_size=hw, block=8, model_hw=(hw, hw),
                                interpret=True)))
    assert r.n_slices > 0 and r.boxes1.shape == (r.n_slices, 4)


def test_q_conv_predicate_requires_faithful_shape():
    """_is_q_conv must only match convs the int8/QAT re-execution is faithful
    to (stride-1 SAME bias-ful ungrouped undilated): a strided / VALID /
    biasless / grouped 3x3 conv silently recomputed as stride-1 SAME + bias
    would be a different network."""
    from flax import linen as nn

    from onestop_tpu.serve_int8 import _is_q_conv

    assert _is_q_conv(nn.Conv(8, (3, 3)))
    assert not _is_q_conv(nn.Conv(8, (3, 3), strides=(2, 2)))
    assert not _is_q_conv(nn.Conv(8, (3, 3), padding="VALID"))
    assert not _is_q_conv(nn.Conv(8, (3, 3), use_bias=False))
    assert not _is_q_conv(nn.Conv(8, (3, 3), feature_group_count=2))
    assert not _is_q_conv(nn.Conv(8, (3, 3), kernel_dilation=(2, 2)))
    assert not _is_q_conv(nn.Conv(8, (1, 1)))       # heads stay unquantized
