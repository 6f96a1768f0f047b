"""Fused serving pipeline (ops.pipeline) on CPU interpret mode: end-to-end
raw slices -> masks, plus the lung-model -> bbox chain the reference never
wired together (SURVEY.md §8 Q2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onestop_tpu.models import UNet
from onestop_tpu.ops.pipeline import fused_infer, lung_boxes_batch

_INTERPRET = True  # tests run on CPU


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_serving_precision_matches_exact_path(rng):
    """VERDICT r1 #1 parity assertion: the optimized serving chain (bf16
    crop matmuls + pre-cast input) must agree with an exact fp32-HIGHEST
    chain at unchanged output quality."""
    from onestop_tpu.ops.clahe_pallas import clahe_fused
    from onestop_tpu.ops.crop import fuse_lung_crops

    model = UNet(widths=(4, 8), bridge=16, dtype=jnp.bfloat16)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 64, 64, 1)), train=False)
    imgs = jnp.asarray(rng.integers(0, 256, (2, 128, 128), dtype=np.uint8))
    b1 = jnp.tile(jnp.array([16, 20, 40, 80], jnp.int32), (2, 1))
    b2 = jnp.tile(jnp.array([70, 22, 38, 76], jnp.int32), (2, 1))

    probs_opt = np.asarray(fused_infer(model, v, imgs, b1, b2, out_hw=(64, 64),
                                       threshold=None, interpret=_INTERPRET))

    def exact(x):
        e = clahe_fused(x, interpret=_INTERPRET)
        def crop_one(img, c1, c2):
            return fuse_lung_crops(img.astype(jnp.float32), c1, c2, (64, 32))
        crops = jax.vmap(crop_one)(e, b1, b2)
        return model.apply(v, (crops / 255.0)[..., None], train=False)

    probs_ref = np.asarray(jax.jit(exact)(imgs))
    # bf16 model noise bounds both paths; outputs must be near-identical
    assert np.abs(probs_opt - probs_ref).max() < 2e-2
    agree = ((probs_opt > 0.5) == (probs_ref > 0.5)).mean()
    assert agree > 0.995, agree


@pytest.mark.slow
def test_fused_infer_sharded_matches_single_device(rng):
    """Data-parallel serving over the 8-device virtual mesh must equal the
    single-device chain exactly (pure DP, replicated weights, no collectives)."""
    from onestop_tpu.parallel.mesh import make_mesh
    from onestop_tpu.ops.pipeline import fused_infer_sharded

    mesh = make_mesh()
    model = UNet(widths=(4, 8), bridge=16)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 64, 64, 1)), train=False)
    n = int(np.prod(mesh.devices.shape))
    b = 2 * n
    imgs = jnp.asarray(rng.integers(0, 256, (b, 128, 128), dtype=np.uint8))
    b1 = jnp.tile(jnp.array([16, 20, 40, 80], jnp.int32), (b, 1))
    b2 = jnp.tile(jnp.array([70, 22, 38, 76], jnp.int32), (b, 1))

    ref = fused_infer(model, v, imgs, b1, b2, out_hw=(64, 64),
                      threshold=None, interpret=_INTERPRET)
    got = fused_infer_sharded(mesh, model, v, imgs, b1, b2,
                              out_hw=(64, 64), threshold=None,
                              interpret=_INTERPRET)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
