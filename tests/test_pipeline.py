"""Fused serving pipeline (ops.pipeline) on CPU interpret mode: end-to-end
raw slices -> masks, plus the lung-model -> bbox chain the reference never
wired together (SURVEY.md §8 Q2)."""

import jax
import jax.numpy as jnp
import numpy as np

from onestop_tpu.models import UNet
from onestop_tpu.ops.pipeline import fused_infer, lung_boxes_batch

_INTERPRET = True  # tests run on CPU


def test_fused_infer_shapes_and_threshold(rng):
    model = UNet(widths=(4, 8), bridge=16)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 64, 64, 1)), train=False)
    imgs = jnp.asarray(rng.integers(0, 256, (2, 128, 128), dtype=np.uint8))
    b1 = jnp.tile(jnp.array([16, 20, 40, 80], jnp.int32), (2, 1))
    b2 = jnp.tile(jnp.array([70, 22, 38, 76], jnp.int32), (2, 1))
    masks = fused_infer(model, v, imgs, b1, b2, out_hw=(64, 64),
                        threshold=0.5, interpret=_INTERPRET)
    assert masks.shape == (2, 64, 64, 1) and masks.dtype == jnp.bool_
    probs = fused_infer(model, v, imgs, b1, b2, out_hw=(64, 64),
                        threshold=None, interpret=_INTERPRET)
    assert probs.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(masks), np.asarray(probs) > 0.5)


def test_full_production_chain_lung_model_to_infection(rng):
    """Lung masks -> bboxes -> fused infection inference: the chain."""
    masks01 = np.zeros((2, 128, 128), np.float32)
    masks01[:, 30:90, 20:55] = 1.0   # left lung
    masks01[:, 28:92, 70:110] = 1.0  # right lung
    b1, b2 = lung_boxes_batch(jnp.asarray(masks01))
    got = {tuple(np.asarray(b1[0])), tuple(np.asarray(b2[0]))}
    assert got == {(20, 30, 35, 60), (70, 28, 40, 64)}

    model = UNet(widths=(4,), bridge=8)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 64, 64, 1)), train=False)
    imgs = jnp.asarray(rng.integers(0, 256, (2, 128, 128), dtype=np.uint8))
    probs = fused_infer(model, v, imgs, b1, b2, out_hw=(64, 64),
                        threshold=None, interpret=_INTERPRET)
    assert np.isfinite(np.asarray(probs)).all()
