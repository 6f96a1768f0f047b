"""Chained no-ground-truth production inference (onestop_tpu.production):
raw CT -> lung U-Net -> predicted boxes -> CLAHE+crop -> infection U-Net.
The reference cannot run its infection pipeline without GT lung masks
(SURVEY.md §8 Q2); this chain replaces them with the task3 model's output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onestop_tpu import config as C
from onestop_tpu.data.synthetic import synthetic_case
from onestop_tpu.data.ingest import load_slices
from onestop_tpu.models import UNet
from onestop_tpu.production import build_plain_lung_dataset, chained_infer

_INTERPRET = True  # tests run on CPU


def _models(hw=64):
    lung = UNet(widths=(4, 8), bridge=16)
    seg = UNet(widths=(4, 8), bridge=16)
    vl = lung.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, hw, hw, 1)), train=False)
    vs = seg.init({"params": jax.random.PRNGKey(1)},
                  jnp.zeros((1, hw, hw, 1)), train=False)
    return lung, vl, seg, vs


def test_chained_infer_shapes_boxes_and_determinism(rng):
    lung, vl, seg, vs = _models()
    imgs = jnp.asarray(rng.integers(0, 256, (2, 128, 128), dtype=np.uint8))
    masks, b1, b2 = chained_infer(lung, vl, seg, vs, imgs, model_hw=(64, 64),
                                  threshold=0.5, interpret=_INTERPRET)
    assert masks.shape == (2, 64, 64, 1) and masks.dtype == jnp.bool_
    assert b1.shape == (2, 4) and b1.dtype == jnp.float32
    # boxes are in raw coordinates: within the 128x128 frame
    for b in (np.asarray(b1), np.asarray(b2)):
        assert (b[:, 0] + b[:, 2] <= 128 + 1e-3).all()
        assert (b[:, 1] + b[:, 3] <= 128 + 1e-3).all()
    masks2, _, _ = chained_infer(lung, vl, seg, vs, imgs, model_hw=(64, 64),
                                 threshold=0.5, interpret=_INTERPRET)
    np.testing.assert_array_equal(np.asarray(masks), np.asarray(masks2))


def test_chained_infer_bisect_box_mode(rng):
    """box_mode='bisect' (CCL-free column-valley boxes) runs end to end with
    valid raw-coordinate boxes, with refinement on and off."""
    lung, vl, seg, vs = _models()
    imgs = jnp.asarray(rng.integers(0, 256, (2, 128, 128), dtype=np.uint8))
    for refine in (True, False):
        masks, b1, b2 = chained_infer(lung, vl, seg, vs, imgs,
                                      model_hw=(64, 64), threshold=0.5,
                                      interpret=_INTERPRET, box_mode="bisect",
                                      refine_boxes=refine)
        assert masks.shape == (2, 64, 64, 1)
        for b in (np.asarray(b1), np.asarray(b2)):
            assert (b[:, 2] > 0).all() and (b[:, 3] > 0).all()
            assert (b[:, 0] + b[:, 2] <= 128 + 1e-3).all()
            assert (b[:, 1] + b[:, 3] <= 128 + 1e-3).all()


@pytest.mark.slow
def test_chained_boxes_track_true_lungs():
    """With a lung model that returns the (resized) truth, predicted boxes
    must land on the synthetic phantom's lungs in raw coordinates."""
    case = synthetic_case(seed=3, hw=128, n_slices=10)
    cts = load_slices(case.ct, img_size=128)
    lungs = load_slices(case.lung_mask, img_size=128)
    raw_u8 = jnp.asarray(np.uint8(np.clip(cts * 255.0, 0, 255)))

    class TruthLung:
        """Stand-in 'model' that emits the GT lung mask at model resolution."""
        def __init__(self, masks):
            self.masks = masks
        def apply(self, variables, x, train=False):
            return self.masks
        def __hash__(self):
            return id(self)
        def __eq__(self, other):
            return self is other

    from onestop_tpu.ops.resize import resize2d
    gt_small = np.asarray(resize2d(jnp.asarray((lungs > 0) * 1.0, jnp.float32),
                                   (64, 64), "area")) > 0.5
    truth = TruthLung(jnp.asarray(gt_small, jnp.float32)[..., None])
    seg = UNet(widths=(4,), bridge=8)
    vs = seg.init({"params": jax.random.PRNGKey(0)},
                  jnp.zeros((1, 64, 64, 1)), train=False)

    masks, b1, b2 = chained_infer(truth, {}, seg, vs, raw_u8, model_hw=(64, 64),
                                  threshold=0.5, interpret=_INTERPRET,
                                  ccl_stride=1)
    # GT boxes straight from the raw-resolution mask, for comparison
    from onestop_tpu.ops.pipeline import lung_boxes_batch
    g1, g2 = lung_boxes_batch(jnp.asarray((lungs > 0) * 1.0, jnp.float32))
    # predicted (upscaled-from-64) boxes approximate raw boxes within the
    # 2-pixel quantization of the 2x downscale
    for pred, gt in ((b1, g1), (b2, g2)):
        np.testing.assert_allclose(np.asarray(pred), np.asarray(gt, np.float32),
                                   atol=4.0)

    # coarse CCL (default stride 2): boxes only ever GROW relative to exact
    # stride-1 boxes, by less than stride model-pixels per side, and the
    # masks frame stays identical in shape
    m2, c1, c2 = chained_infer(truth, {}, seg, vs, raw_u8, model_hw=(64, 64),
                               threshold=0.5, interpret=_INTERPRET,
                               ccl_stride=2)
    assert m2.shape == masks.shape
    scale = 128 / 64
    for coarse, exact in ((c1, b1), (c2, b2)):
        co, ex = np.asarray(coarse), np.asarray(exact)
        # origin moves only down/left, within (stride-1) model px
        assert (co[:, :2] <= ex[:, :2] + 1e-3).all()
        assert (ex[:, :2] - co[:, :2] <= 1 * scale + 1e-3).all()
        # far edge moves only up/right, within (stride-1) model px
        co_end, ex_end = co[:, :2] + co[:, 2:], ex[:, :2] + ex[:, 2:]
        assert (co_end >= ex_end - 1e-3).all()
        assert (co_end - ex_end <= 1 * scale + 1e-3).all()


def test_fast_smoke_mixed_and_one_stop_serving(rng):
    """Fast-tier smoke for the int8-mixed and one-stop serving families
    (ADVICE r4: the slow marks had pushed EVERY serving-path test out of the
    default CI tier). Tiny shapes, interpret-mode Pallas: chained_infer_mixed
    is the promoted deployment split (bf16 low-res lung stage + int8
    infection U-Net), one_stop_infer the classifier-bearing chain."""
    from onestop_tpu.models import ClassifierCNN
    from onestop_tpu.production import one_stop_infer
    from onestop_tpu.serve_int8 import chained_infer_mixed, quantize_model

    lung, vl, seg, vs = _models(hw=32)
    imgs = jnp.asarray(rng.integers(0, 256, (2, 64, 64), dtype=np.uint8))
    q = quantize_model(seg, vs,
                       jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32))
    masks, b1, b2 = chained_infer_mixed(lung, vl, seg, q, vs, imgs,
                                        model_hw=(32, 32), lung_hw=(16, 16),
                                        threshold=0.5, interpret=_INTERPRET)
    assert masks.shape == (2, 32, 32, 1) and masks.dtype == jnp.bool_
    assert np.isfinite(np.asarray(b1)).all() and np.isfinite(np.asarray(b2)).all()

    cls = ClassifierCNN(widths=(4, 8), dense=8)
    vc = cls.init({"params": jax.random.PRNGKey(2)},
                  jnp.zeros((1, 32, 32, 1)), train=False)
    m2, probs, _, _ = one_stop_infer(lung, vl, seg, vs, cls, vc, imgs,
                                     model_hw=(32, 32), threshold=0.5,
                                     interpret=_INTERPRET)
    assert m2.shape == (2, 32, 32, 1) and probs.shape == (2,)
    assert np.isfinite(np.asarray(probs)).all()


def test_serving_preproc_pre_enhanced_skips_clahe(rng):
    """fused_infer(pre_enhanced=True) on already-CLAHE'd pixels must equal
    the plain path on raw pixels — the chained pipeline enhances once and
    feeds both stages."""
    from onestop_tpu.ops.clahe_pallas import clahe_fused
    from onestop_tpu.ops.pipeline import serving_preproc

    imgs = jnp.asarray(rng.integers(0, 256, (2, 128, 128), dtype=np.uint8))
    b1 = jnp.tile(jnp.array([10, 12, 40, 60], jnp.int32), (2, 1))
    b2 = jnp.tile(jnp.array([70, 12, 40, 60], jnp.int32), (2, 1))
    plain = serving_preproc(imgs, b1, b2, (64, 64), interpret=_INTERPRET)
    enhanced = clahe_fused(imgs, interpret=_INTERPRET)
    pre = serving_preproc(enhanced, b1, b2, (64, 64), interpret=_INTERPRET,
                          pre_enhanced=True)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(pre))


def test_build_plain_lung_dataset_shapes_and_range():
    case = synthetic_case(seed=5, hw=128, n_slices=8)
    cts = load_slices(case.ct, img_size=128)
    lungs = load_slices(case.lung_mask, img_size=128)
    cfg = C.PreprocessConfig(img_size=128, new_dim=64)
    x, y = build_plain_lung_dataset([(cts, lungs)], cfg)
    assert x.shape == y.shape and x.shape[1:] == (64, 64, 1)
    assert x.shape[0] > 0
    assert 0.0 <= x.min() and x.max() <= 1.0
    assert 0.0 <= y.min() and y.max() <= 1.0
    # lung channel actually contains lungs
    assert (np.asarray(y) > 0.5).mean() > 0.01


@pytest.mark.slow
def test_one_stop_infer_masks_match_chain_and_probs_valid(rng):
    """one_stop_infer = chained_infer + classifier on the SAME stage-3 input:
    segmentation outputs must be bitwise identical to the plain chain, and
    the added classification probabilities must be valid per-slice sigmoids.
    """
    from onestop_tpu.models import ClassifierCNN
    from onestop_tpu.production import one_stop_infer

    lung, vl, seg, vs = _models()
    cls = ClassifierCNN(widths=(4, 8), dense=8)
    vc = cls.init({"params": jax.random.PRNGKey(2)},
                  jnp.zeros((1, 64, 64, 1)), train=False)
    imgs = jnp.asarray(rng.integers(0, 256, (3, 128, 128), dtype=np.uint8))
    kw = dict(model_hw=(64, 64), threshold=0.5, interpret=_INTERPRET)

    ref_m, ref_b1, ref_b2 = chained_infer(lung, vl, seg, vs, imgs, **kw)
    masks, probs, b1, b2 = one_stop_infer(lung, vl, seg, vs, cls, vc,
                                          imgs, **kw)
    np.testing.assert_array_equal(np.asarray(ref_m), np.asarray(masks))
    np.testing.assert_array_equal(np.asarray(ref_b1), np.asarray(b1))
    np.testing.assert_array_equal(np.asarray(ref_b2), np.asarray(b2))
    probs = np.asarray(probs)
    assert probs.shape == (3,) and probs.dtype == np.float32
    assert (probs >= 0).all() and (probs <= 1).all()

    # determinism
    _, probs2, _, _ = one_stop_infer(lung, vl, seg, vs, cls, vc, imgs, **kw)
    np.testing.assert_array_equal(probs, np.asarray(probs2))

    # the classifier consumed the chain's stage-3 crop: reproduce it from
    # the chain's own boxes and check the probability agrees
    from onestop_tpu.ops.pipeline import serving_preproc

    x3 = serving_preproc(imgs, b1, b2, (64, 64), interpret=_INTERPRET)
    direct = np.asarray(cls.apply(vc, x3, train=False))[:, 0]
    np.testing.assert_allclose(probs, direct, atol=1e-6)


@pytest.mark.slow
def test_chained_infer_sharded_matches_single_device(rng):
    """Data-parallel no-GT chain over the 8-device virtual mesh must equal
    the single-device chain exactly (pure DP, replicated weights)."""
    from onestop_tpu.parallel.mesh import make_mesh
    from onestop_tpu.production import chained_infer_sharded

    mesh = make_mesh()
    lung, vl, seg, vs = _models()
    n = int(np.prod(mesh.devices.shape))
    imgs = jnp.asarray(rng.integers(0, 256, (n, 128, 128), dtype=np.uint8))
    kw = dict(model_hw=(64, 64), threshold=0.5, interpret=_INTERPRET)
    ref_m, ref_b1, ref_b2 = chained_infer(lung, vl, seg, vs, imgs, **kw)
    got_m, got_b1, got_b2 = chained_infer_sharded(mesh, lung, vl, seg, vs,
                                                  imgs, **kw)
    np.testing.assert_array_equal(np.asarray(ref_m), np.asarray(got_m))
    np.testing.assert_array_equal(np.asarray(ref_b1), np.asarray(got_b1))
    np.testing.assert_array_equal(np.asarray(ref_b2), np.asarray(got_b2))


@pytest.mark.slow
def test_one_stop_infer_sharded_matches_single_device(rng):
    """DP one-stop chain over the 8-device virtual mesh == single-device
    one-stop chain exactly (pure DP, replicated weights)."""
    from onestop_tpu.models import ClassifierCNN
    from onestop_tpu.parallel.mesh import make_mesh
    from onestop_tpu.production import one_stop_infer, one_stop_infer_sharded

    mesh = make_mesh()
    lung, vl, seg, vs = _models()
    cls = ClassifierCNN(widths=(4, 8), dense=8)
    vc = cls.init({"params": jax.random.PRNGKey(2)},
                  jnp.zeros((1, 64, 64, 1)), train=False)
    n = int(np.prod(mesh.devices.shape))
    imgs = jnp.asarray(rng.integers(0, 256, (n, 128, 128), dtype=np.uint8))
    kw = dict(model_hw=(64, 64), threshold=0.5, interpret=_INTERPRET)
    ref = one_stop_infer(lung, vl, seg, vs, cls, vc, imgs, **kw)
    got = one_stop_infer_sharded(mesh, lung, vl, seg, vs, cls, vc, imgs, **kw)
    ref_m, ref_p, ref_b1, ref_b2 = ref
    got_m, got_p, got_b1, got_b2 = got
    np.testing.assert_array_equal(np.asarray(ref_m), np.asarray(got_m))
    np.testing.assert_array_equal(np.asarray(ref_b1), np.asarray(got_b1))
    np.testing.assert_array_equal(np.asarray(ref_b2), np.asarray(got_b2))
    # the classifier's dense matmul lowers with different reduction tiling at
    # per-shard batch 1 vs batch 8 — probabilities agree to float32 ulps only
    np.testing.assert_allclose(np.asarray(ref_p), np.asarray(got_p),
                               rtol=0, atol=1e-5)


def test_refined_boxes_equal_exact_ccl_on_same_grid():
    """When the lung grid equals the raw grid the bilinear upsample is the
    identity, so refine_boxes=True must reproduce the exact stride-1 CCL
    boxes exactly — even when labeling ran on the stride-2 pooled mask.
    Uses a truth-emitting lung stage on clean phantoms (noise inputs would
    change the top-2 component *selection* between strides, which is the
    documented coarse-CCL merge behavior, not a refinement property)."""
    hw = 64
    case = synthetic_case(seed=5, hw=hw, n_slices=8)
    cts = load_slices(case.ct, img_size=hw)
    lungs = load_slices(case.lung_mask, img_size=hw)
    keep = (lungs > 0).reshape(len(lungs), -1).max(axis=1) > 0
    raw_u8 = jnp.asarray(np.uint8(np.clip(cts[keep] * 255.0, 0, 255)))
    masks01 = jnp.asarray((lungs[keep] > 0).astype(np.float32))[..., None]

    class TruthLung:
        def __init__(self, masks):
            self.masks = masks
        def apply(self, variables, x, train=False):
            return self.masks
        def __hash__(self):
            return id(self)
        def __eq__(self, other):
            return self is other

    lung = TruthLung(masks01)
    _, _, seg, vs = _models(hw)
    kw = dict(model_hw=(hw, hw), threshold=0.5, interpret=_INTERPRET)
    _, e1, e2 = chained_infer(lung, {}, seg, vs, raw_u8, ccl_stride=1,
                              refine_boxes=False, **kw)
    _, r1, r2 = chained_infer(lung, {}, seg, vs, raw_u8, ccl_stride=2,
                              refine_boxes=True, **kw)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(e1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(e2), atol=1e-5)


@pytest.mark.slow
def test_one_stop_infer_cls_hw_low_res_classifier(rng):
    """cls_hw serves a classifier trained at a lower resolution on one extra
    area-resize of the stage-3 crop (the lane-ceiling overhead lever,
    VERDICT r3 item 6): segmentation outputs stay bitwise identical to the
    plain chain, and the probabilities equal the classifier applied to the
    resized crop directly."""
    from onestop_tpu.models import ClassifierCNN
    from onestop_tpu.ops.pipeline import serving_preproc
    from onestop_tpu.ops.resize import resize2d
    from onestop_tpu.production import one_stop_infer

    lung, vl, seg, vs = _models()
    cls = ClassifierCNN(widths=(4, 8), dense=8)
    vc = cls.init({"params": jax.random.PRNGKey(3)},
                  jnp.zeros((1, 32, 32, 1)), train=False)
    imgs = jnp.asarray(rng.integers(0, 256, (3, 128, 128), dtype=np.uint8))
    kw = dict(model_hw=(64, 64), threshold=0.5, interpret=_INTERPRET)

    ref_m, ref_b1, ref_b2 = chained_infer(lung, vl, seg, vs, imgs, **kw)
    masks, probs, b1, b2 = one_stop_infer(lung, vl, seg, vs, cls, vc, imgs,
                                          cls_hw=(32, 32), **kw)
    np.testing.assert_array_equal(np.asarray(ref_m), np.asarray(masks))
    np.testing.assert_array_equal(np.asarray(ref_b1), np.asarray(b1))
    np.testing.assert_array_equal(np.asarray(ref_b2), np.asarray(b2))
    probs = np.asarray(probs)
    assert probs.shape == (3,) and (probs >= 0).all() and (probs <= 1).all()

    x3 = serving_preproc(imgs, b1, b2, (64, 64), interpret=_INTERPRET)
    x32 = resize2d(x3[..., 0], (32, 32), "area")[..., None]
    direct = np.asarray(cls.apply(vc, x32, train=False))[:, 0]
    np.testing.assert_allclose(probs, direct, atol=1e-6)
