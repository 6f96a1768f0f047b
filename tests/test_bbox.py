"""ops.bbox / ops.crop vs the reference's cv2 contour chain
(holdout.py:211-273)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from onestop_tpu.ops.bbox import component_bboxes, connected_components, two_lung_bboxes
from onestop_tpu.ops.crop import cropper, fuse_lung_crops


def _cv2_two_boxes(mask_u8):
    contours, _ = cv2.findContours(mask_u8, cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE)
    areas = [cv2.contourArea(c) for c in contours]
    order = np.argsort(areas)
    b1 = cv2.boundingRect(contours[order[-1]])
    b2 = cv2.boundingRect(contours[order[-2]])
    return b1, b2


def _lung_like_mask(rng, h=512, w=512):
    """Two ellipse blobs, like a binarized lung mask."""
    mask = np.zeros((h, w), np.uint8)
    cv2.ellipse(mask, (int(w * 0.3), int(h * 0.5)), (int(w * 0.15), int(h * 0.3)),
                rng.uniform(-15, 15), 0, 360, 1, -1)
    cv2.ellipse(mask, (int(w * 0.68), int(h * 0.52)), (int(w * 0.13), int(h * 0.28)),
                rng.uniform(-15, 15), 0, 360, 1, -1)
    # small noise blob (third component, must rank below the lungs)
    cv2.circle(mask, (int(w * 0.5), int(h * 0.1)), 6, 1, -1)
    return mask


def test_cc_label_count(rng):
    mask = _lung_like_mask(rng)
    labels = np.asarray(connected_components(jnp.asarray(mask > 0)))
    n = len(np.unique(labels)) - 1
    n_ref, _ = cv2.connectedComponents(mask)
    assert n == n_ref - 1 == 3


def test_two_lung_boxes_match_cv2(rng):
    for _ in range(3):
        mask = _lung_like_mask(rng)
        ref1, ref2 = _cv2_two_boxes(mask)
        b1, b2, _ = two_lung_bboxes(jnp.asarray(mask > 0))
        got = {tuple(np.asarray(b1)), tuple(np.asarray(b2))}
        assert got == {tuple(ref1), tuple(ref2)}


def test_box_ordering_by_size(rng):
    mask = _lung_like_mask(rng)
    labels = connected_components(jnp.asarray(mask > 0))
    boxes, sizes = component_bboxes(labels, k=3)
    sizes = np.asarray(sizes)
    assert sizes[0] >= sizes[1] >= sizes[2] > 0


def _clean_bilateral_mask(rng, h=256, w=256):
    """Two clean ellipse lungs, NO noise blob (bisect does not size-filter)."""
    mask = np.zeros((h, w), np.uint8)
    cv2.ellipse(mask, (int(w * 0.3), int(h * 0.5)), (int(w * 0.15), int(h * 0.3)),
                rng.uniform(-15, 15), 0, 360, 1, -1)
    cv2.ellipse(mask, (int(w * 0.68), int(h * 0.52)), (int(w * 0.13), int(h * 0.28)),
                rng.uniform(-15, 15), 0, 360, 1, -1)
    return mask


def test_bisect_matches_ccl_on_clean_bilateral(rng):
    """On a clean bilateral mask the CCL-free column-valley split returns
    exactly the CCL path's boxes, sizes, ordering, and component masks."""
    from onestop_tpu.ops.bbox import bisect_lung_components, two_lung_components

    for transpose in (False, True):   # the ingest frame is rot90'd: lungs can
        for _ in range(3):            # separate along either axis
            m = _clean_bilateral_mask(rng) > 0
            if transpose:
                m = m.T
            m = jnp.asarray(m)
            b_c, s_c, comp_c = two_lung_components(m)
            b_b, s_b, comp_b = bisect_lung_components(m)
            np.testing.assert_array_equal(np.asarray(b_b), np.asarray(b_c))
            np.testing.assert_array_equal(np.asarray(s_b), np.asarray(s_c))
            np.testing.assert_array_equal(np.asarray(comp_b), np.asarray(comp_c))


def test_bisect_empty_mask_full_frame_fallback():
    from onestop_tpu.ops.bbox import bisect_lung_components

    b, s, comps = bisect_lung_components(jnp.zeros((64, 48), bool))
    assert tuple(np.asarray(b[0])) == (0, 0, 48, 64)
    assert tuple(np.asarray(b[1])) == (0, 0, 48, 64)
    assert int(np.asarray(s).sum()) == 0 and not np.asarray(comps).any()


def test_bisect_merged_component_splits_left_right():
    """A single blob spanning the midline comes back as its two column
    halves (union covers the blob's bbox; every pixel assigned once) —
    the documented divergence from CCL's duplicated-largest-box."""
    from onestop_tpu.ops.bbox import bisect_lung_components

    mask = np.zeros((64, 64), bool)
    mask[20:40, 10:54] = True
    b, s, comps = bisect_lung_components(jnp.asarray(mask))
    bs = np.asarray(b)
    x0 = min(bs[0][0], bs[1][0])
    x1 = max(bs[0][0] + bs[0][2], bs[1][0] + bs[1][2])
    y0 = min(bs[0][1], bs[1][1])
    y1 = max(bs[0][1] + bs[0][3], bs[1][1] + bs[1][3])
    assert (x0, y0, x1, y1) == (10, 20, 54, 40)
    assert int(np.asarray(s).sum()) == int(mask.sum())
    assert not (np.asarray(comps[0]) & np.asarray(comps[1])).any()


def test_single_component_degenerate():
    mask = np.zeros((64, 64), bool)
    mask[10:30, 12:40] = True
    b1, b2, sizes = two_lung_bboxes(jnp.asarray(mask))
    assert tuple(np.asarray(b1)) == (12, 10, 28, 20)
    assert tuple(np.asarray(b1)) == tuple(np.asarray(b2))  # duplicated, not a crash


def test_cropper_matches_reference_chain(rng):
    """Full cropper: binarize -> 2 boxes -> crop -> (125,250) area resize -> hstack."""
    mask = _lung_like_mask(rng)
    img01 = mask.astype(np.float64)  # already binary as in the lungs path

    # reference chain with cv2
    u8 = np.uint8(img01 * 255)
    (x, y, w, h), (p, q, r, s) = _cv2_two_boxes(u8)
    c1 = cv2.resize(u8[y:y + h, x:x + w], dsize=(125, 250), interpolation=cv2.INTER_AREA)
    c2 = cv2.resize(u8[q:q + s, p:p + r], dsize=(125, 250), interpolation=cv2.INTER_AREA)
    ref = np.concatenate([c1, c2], axis=1).astype(np.float32)

    fused, b1, b2 = cropper(jnp.asarray(img01))
    got = np.asarray(fused)
    # cv2 rounds tiles to uint8 before concat; ours stays float — compare to 1 LSB
    assert got.shape == (250, 250)
    if tuple(np.asarray(b1)) == (x, y, w, h):
        assert np.abs(got - ref).max() <= 1.0
    else:  # our size-ordering may swap equal-area contours; fused halves swap
        ref_sw = np.concatenate([c2, c1], axis=1).astype(np.float32)
        assert np.abs(got - ref_sw).max() <= 1.0


def test_fuse_lung_crops_traced(rng):
    img = jnp.asarray(rng.random((512, 512)).astype(np.float32))
    b1 = jnp.array([50, 60, 150, 300], jnp.int32)
    b2 = jnp.array([300, 70, 140, 280], jnp.int32)
    out = fuse_lung_crops(img, b1, b2)
    assert out.shape == (250, 250)
    ref1 = cv2.resize(np.asarray(img)[60:360, 50:200], (125, 250), interpolation=cv2.INTER_AREA)
    np.testing.assert_allclose(np.asarray(out)[:, :125], ref1, atol=1e-4)


def test_refine_boxes_bilinear_recovers_subgrid_edges():
    """A pyramid probability field has known threshold crossings; boxes
    labeled on a 4x-coarser grid are quantized by +-4 raw px, and the
    bilinear refinement must recover the crossing to ~1 raw px."""
    from onestop_tpu.ops.bbox import refine_boxes_bilinear

    hh = ww = 128
    lh = lw = 32
    cy, cx, r = 61.0, 67.0, 30.0  # raw-grid pyramid apex and half-width
    ry = np.arange(lh) * (hh / lh) + (hh / lh - 1) / 2  # coarse pixel centers
    rx = np.arange(lw) * (ww / lw) + (ww / lw - 1) / 2
    probs = np.clip(1 - np.maximum(np.abs(ry[:, None] - cy),
                                   np.abs(rx[None, :] - cx)) / r, 0, 1)
    t = 0.5  # true crossing: |d| = r/2 -> raw box [c-15, c+15]
    mask = probs > t
    ys, xs = np.nonzero(mask)
    coarse = np.array([[xs.min(), ys.min(), xs.max() - xs.min() + 1,
                        ys.max() - ys.min() + 1]], np.float32)
    ref = refine_boxes_bilinear(jnp.asarray(probs, jnp.float32)[None],
                                jnp.asarray(mask)[None, None],
                                jnp.asarray(coarse)[None], t, (hh, ww))
    x, y, w, h = np.asarray(ref)[0, 0]
    # true crossings at cx +- r/2, cy +- r/2 (field is piecewise-linear, so
    # bilinear interpolation between coarse centers is near-exact)
    assert abs(x - (cx - 15)) <= 1.5 and abs(y - (cy - 15)) <= 1.5
    assert abs((x + w) - (cx + 15 + 1)) <= 1.5
    assert abs((y + h) - (cy + 15 + 1)) <= 1.5
    # while the coarse box scaled to raw coords is off by up to a full cell
    sc = coarse[0] * (hh / lh)
    assert abs(sc[0] - (cx - 15)) > 1.5 or abs(sc[1] - (cy - 15)) > 1.5


def test_refine_boxes_empty_restriction_falls_back():
    from onestop_tpu.ops.bbox import refine_boxes_bilinear

    probs = jnp.zeros((1, 16, 16), jnp.float32)
    comps = jnp.zeros((1, 1, 16, 16), bool)
    boxes = jnp.asarray([[[2.0, 3.0, 4.0, 5.0]]])
    out = np.asarray(refine_boxes_bilinear(probs, comps, boxes, 0.5, (64, 64)))
    np.testing.assert_allclose(out[0, 0], [8.0, 12.0, 16.0, 20.0])


def test_refine_boxes_excludes_out_of_topk_regions():
    """A supra-threshold region that CCL ranked OUT of the top-k must not
    inflate the refined box — the reduction is restricted to the component's
    own dilated footprint, not a window around its box."""
    from onestop_tpu.ops.bbox import refine_boxes_bilinear

    lh, hh = 32, 128
    probs = np.zeros((lh, lh), np.float32)
    probs[8:16, 8:16] = 1.0     # the selected component
    probs[8:16, 18:20] = 1.0    # nearby blob (2 cells away), NOT selected
    comp = np.zeros((lh, lh), bool)
    comp[8:16, 8:16] = True
    coarse = np.array([[[8.0, 8.0, 8.0, 8.0]]], np.float32)
    out = np.asarray(refine_boxes_bilinear(
        jnp.asarray(probs)[None], jnp.asarray(comp)[None, None],
        jnp.asarray(coarse), 0.5, (hh, hh)))
    x, y, w, h = out[0, 0]
    # component right edge crosses 0.5 between centers col 15 and 16 ->
    # raw col ~62-66; the blob starts at raw col ~70 and must be excluded
    assert x + w <= 70, (x, w)
    assert x >= 28 and y >= 28 and y + h <= 70
