"""Golden-parity tests: ops.resize vs cv2.resize (the reference's resizer,
holdout.py:294,335,355-357,486-488)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onestop_tpu.ops.resize import area_weights, crop_resize, linear_weights, resize2d, to_uint8


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((100, 80), (50, 40)),    # downscale
     ((64, 64), (250, 125)),   # upscale (the crop-tile geometry)
     ((300, 280), (250, 125)), # mixed magnitude
     ((630, 630), (512, 512)), # radiopaedia slice -> img_size
     ((100, 80), (50, 120))],  # mixed up/down
)
def test_area_matches_cv2_float(rng, in_hw, out_hw):
    img = rng.random(in_hw).astype(np.float32)
    ref = cv2.resize(img, dsize=(out_hw[1], out_hw[0]), interpolation=cv2.INTER_AREA)
    got = np.asarray(resize2d(jnp.asarray(img), out_hw, "area"))
    np.testing.assert_allclose(got, ref, atol=2e-6)


@pytest.mark.parametrize("in_hw,out_hw", [((250, 250), (224, 224)), ((100, 80), (220, 200))])
def test_linear_matches_cv2_float(rng, in_hw, out_hw):
    img = rng.random(in_hw).astype(np.float32)
    ref = cv2.resize(img, dsize=(out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize2d(jnp.asarray(img), out_hw, "linear"))
    np.testing.assert_allclose(got, ref, atol=2e-6)


@pytest.mark.parametrize("method,interp", [("area", cv2.INTER_AREA), ("linear", cv2.INTER_LINEAR)])
def test_uint8_within_1lsb(rng, method, interp):
    img = rng.integers(0, 256, (250, 250), dtype=np.uint8)
    ref = cv2.resize(img, dsize=(224, 224), interpolation=interp)
    got = np.asarray(to_uint8(resize2d(jnp.asarray(img), (224, 224), method)))
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_weights_rows_sum_to_one():
    for make in (area_weights, linear_weights):
        w = make(317, 125)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-12)


@pytest.mark.parametrize("box", [(37, 12, 211, 305), (0, 0, 512, 512), (400, 380, 100, 120)])
@pytest.mark.parametrize("method,interp", [("area", cv2.INTER_AREA), ("linear", cv2.INTER_LINEAR)])
def test_crop_resize_matches_crop_then_cv2(rng, box, method, interp):
    img = rng.random((512, 512)).astype(np.float32)
    x, y, w, h = box
    ref = cv2.resize(img[y:y + h, x:x + w], dsize=(125, 250), interpolation=interp)
    got = np.asarray(crop_resize(jnp.asarray(img), box, (250, 125), method))
    # dynamic-window weights are built in fp32 at coordinates up to 512, so
    # the error floor is the fp32 ulp there (~6e-5), not the 1e-6 static floor
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_crop_resize_traced_boxes(rng):
    """Boxes may be traced values — the fused on-device path."""
    img = jnp.asarray(rng.random((128, 128)).astype(np.float32))

    @jax.jit
    def f(img, box):
        return crop_resize(img, (box[0], box[1], box[2], box[3]), (64, 32), "area")

    box = jnp.array([10, 20, 50, 70], jnp.int32)
    got = f(img, box)
    ref = cv2.resize(np.asarray(img)[20:90, 10:60], dsize=(32, 64), interpolation=cv2.INTER_AREA)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_batched_channels_last(rng):
    imgs = rng.random((4, 100, 90, 1)).astype(np.float32)
    got = np.asarray(resize2d(jnp.asarray(imgs), (50, 45), "area"))
    assert got.shape == (4, 50, 45, 1)
    ref = cv2.resize(imgs[2, :, :, 0], dsize=(45, 50), interpolation=cv2.INTER_AREA)
    np.testing.assert_allclose(got[2, :, :, 0], ref, atol=2e-6)
