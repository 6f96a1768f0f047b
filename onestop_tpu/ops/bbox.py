"""Connected-component bounding boxes, TPU-native.

The reference extracts the two lungs from a binarized lung mask with
``cv2.findContours(RETR_TREE, CHAIN_APPROX_SIMPLE)`` → two largest-area
contours → ``cv2.boundingRect`` (``holdout.py:211-247``). Only the two
bounding rects are ever consumed downstream, so on TPU we compute them
directly with a connected-component labeling built from *segmented max
scans*:

- labels start as (flat_index + 1) on foreground, 0 on background;
- a sweep runs four segmented max-scans (rows fwd/bwd, cols fwd/bwd) where
  background pixels reset the running max — each sweep is a handful of
  ``associative_scan`` passes on the VPU;
- sweeps repeat under ``lax.while_loop`` until a fixpoint: every component
  then carries the max flat-index it contains. Lung-shaped regions converge
  in 2–4 sweeps (vs O(diameter) for naive neighbor propagation).

Component ranking uses pixel count; OpenCV ranks by polygon contour area.
For lung masks the ordering agrees (verified vs cv2 in
``tests/test_bbox.py``); pathological same-size ties may differ — documented
divergence. Degenerate masks (<2 components) return the largest box
duplicated (the reference would crash on an IndexError instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _seg_scan(labels: Array, mask: Array, axis: int, reverse: bool) -> Array:
    """Segmented running-max of ``labels`` along ``axis``; background
    (mask == 0) resets the running value to 0."""
    reset = jnp.logical_not(mask)

    def combine(a, b):
        ra, va = a
        rb, vb = b
        return jnp.logical_or(ra, rb), jnp.where(rb, vb, jnp.maximum(va, vb))

    _, out = jax.lax.associative_scan(combine, (reset, labels), axis=axis, reverse=reverse)
    return out


@jax.jit
def connected_components(mask: Array) -> Array:
    """Label 4/8-connected foreground regions of a (H, W) bool mask.

    Returns int32 labels; 0 = background, each component gets the maximum
    (flat_index + 1) it contains. Uses 8-connectivity like cv2.findContours
    (diagonal links propagate via a 3x3 max-dilation between sweeps).
    """
    m = mask.astype(bool)
    h, w = m.shape
    flat = (jnp.arange(h * w, dtype=jnp.int32) + 1).reshape(h, w)
    labels = jnp.where(m, flat, 0)

    def sweep(lab):
        # diagonal coupling: 3x3 max-dilate restricted to the mask
        dil = jax.lax.reduce_window(
            lab, jnp.int32(0), jax.lax.max, (3, 3), (1, 1), "SAME"
        )
        lab = jnp.where(m, jnp.maximum(lab, dil), 0)
        lab = _seg_scan(lab, m, axis=1, reverse=False)
        lab = _seg_scan(lab, m, axis=1, reverse=True)
        lab = _seg_scan(lab, m, axis=0, reverse=False)
        lab = _seg_scan(lab, m, axis=0, reverse=True)
        return lab

    def cond(state):
        prev, cur = state
        return jnp.any(prev != cur)

    def body(state):
        _, cur = state
        return cur, sweep(cur)

    _, labels = jax.lax.while_loop(cond, body, (labels, sweep(labels)))
    return labels


def _component_sizes(labels: Array) -> Array:
    """Pixel count per component label, as a flat (h·w,) f32 table indexed by
    (label − 1) — i.e. by the label's own flat pixel index.

    A scatter-add histogram (``zeros(h·w).at[labels].add(1)``) serializes on
    TPU — measured 0.9 ms/image at 224², the dominant cost of the whole
    no-GT serving chain (scripts/profile_chained.py). Instead, decompose
    each label's flat index into (row, col) = (idx÷w, idx mod w) and compute
    the joint count table as a one-hot × one-hot MXU contraction —
    ``counts[r, c] = Σ_p [row(p)==r]·[col(p)==c]`` — the same nibble-split
    trick as the Pallas CLAHE histogram (ops/clahe_pallas.py), here over
    (h, w) instead of (16, 16). Pixels stream through in chunks so the
    one-hot operands stay small; accumulation is f32 (exact for any count
    < 2²⁴)."""
    h, w = labels.shape
    flat = labels.ravel() - 1                 # component id == flat pixel idx
    valid = flat >= 0
    flat = jnp.where(valid, flat, 0)
    hi = flat // w
    lo = flat % w

    p = h * w
    chunk = min(8192, -(-p // 8) * 8)
    n_chunks = -(-p // chunk)
    pad = n_chunks * chunk - p

    def pchunks(a, fill):
        return jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)]).reshape(
            n_chunks, chunk)

    hi_c = pchunks(hi, 0)
    lo_c = pchunks(lo, 0)
    va_c = pchunks(valid, False)
    rows = jnp.arange(h, dtype=jnp.int32)
    cols = jnp.arange(w, dtype=jnp.int32)

    def step(counts, args):
        hc, lc, vc = args
        a = ((hc[:, None] == rows[None, :]) & vc[:, None]).astype(jnp.bfloat16)
        b = (lc[:, None] == cols[None, :]).astype(jnp.bfloat16)
        counts = counts + jnp.einsum("ph,pw->hw", a, b,
                                     preferred_element_type=jnp.float32)
        return counts, None

    counts, _ = jax.lax.scan(step, jnp.zeros((h, w), jnp.float32),
                             (hi_c, lo_c, va_c))
    return counts.ravel()


@functools.partial(jax.jit, static_argnames=("k",))
def component_bboxes(labels: Array, k: int = 2):
    """Bounding boxes of the k largest components by pixel count.

    Returns (boxes (k, 4) int32 as cv2-style (x, y, w, h), sizes (k,) int32),
    ordered largest first. Empty slots duplicate the largest component's box
    (size reported as 0 only if there are no components at all, in which case
    the full-image box is returned).
    """
    boxes, sizes, _ = _topk_boxes(labels, k)
    return boxes, sizes


def _topk_boxes(labels: Array, k: int):
    """(boxes, sizes, top_labels) of the k largest components."""
    h, w = labels.shape
    sizes_flat = _component_sizes(labels)     # indexed by label-1
    # iterative top-k (k is tiny): argmax ties break at the lowest flat
    # index, matching lax.top_k's stable ordering on the old scatter table
    tops, tlabels = [], []
    remaining = sizes_flat
    for _ in range(k):
        i = jnp.argmax(remaining)
        tops.append(remaining[i].astype(jnp.int32))
        tlabels.append((i + 1).astype(jnp.int32))
        remaining = jnp.where(jnp.arange(h * w) == i, -1.0, remaining)
    top_sizes = jnp.stack(tops)
    top_labels = jnp.stack(tlabels)
    # slots with no component fall back to the largest component's label
    top_labels = jnp.where(top_sizes > 0, top_labels, top_labels[0])

    rows_i = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def one_box(lab):
        sel = labels == lab
        any_sel = jnp.any(sel)
        big = jnp.int32(h + w)
        y0 = jnp.min(jnp.where(sel, rows_i, big))
        y1 = jnp.max(jnp.where(sel, rows_i, -1))
        x0 = jnp.min(jnp.where(sel, cols_i, big))
        x1 = jnp.max(jnp.where(sel, cols_i, -1))
        box = jnp.stack([x0, y0, x1 - x0 + 1, y1 - y0 + 1])
        return jnp.where(any_sel, box, jnp.array([0, 0, w, h], jnp.int32))

    boxes = jax.vmap(one_box)(top_labels)
    return boxes, top_sizes, top_labels


def two_lung_components(mask: Array):
    """Like ``two_lung_bboxes`` but also returns the two components' own
    binary masks (2, H, W) — the restriction the probability-field box
    refinement needs so neighboring supra-threshold regions that CCL ranked
    OUT of the top-2 cannot inflate a refined box."""
    labels = connected_components(mask)
    boxes, sizes, top_labels = _topk_boxes(labels, 2)
    comp = labels[None, :, :] == top_labels[:, None, None]
    return boxes, sizes, comp


@functools.partial(jax.jit, static_argnames=("raw_hw",))
def refine_boxes_bilinear(
    probs: Array,               # (B, lh, lw) f32 lung probabilities
    comps: Array,               # (B, k, ph, pw) bool component masks (pooled grid)
    coarse_boxes: Array,        # (B, k, 4) float (x, y, w, h), PROB-grid coords
    threshold: float | Array,
    raw_hw: tuple[int, int],
) -> Array:
    """Sub-grid box refinement from the probability field itself.

    Coarse connected-component boxes are quantized to the grid they were
    labeled on: with a 112² lung stage and 512² raw slices every box edge
    carries ±4.6 raw px of quantization (×``ccl_stride`` more when labeling
    runs on a pooled mask) — measured as a −0.04 chained-dice cost at
    ``lung_dim=112`` (artifacts_tpu/round3_chain_lowres.json). But the model
    emits a *continuous* probability field, and the mask's threshold crossing
    lies between grid-pixel centers: bilinearly upsampling ``probs`` to
    ``raw_hw`` and re-reducing min/max extents recovers the crossing at
    raw-pixel precision. One (lh→H, lw→W) matmul resize shared by all k
    boxes + two masked iota reductions per box — no extra CCL.

    The reduction is restricted to each component's OWN 3×3-dilated footprint
    (``comps``, nearest-upsampled from the labeling grid), not a window
    around its box — so a nearby supra-threshold region that CCL ranked out
    of the top-2 cannot inflate the refined box. The one-cell dilation is
    exactly the reach of the interpolated crossing: a raw pixel can only
    exceed ``threshold`` if one of its 4 bilinear neighbors does, i.e. it
    lies within one prob-grid cell (≤ one pooled cell) of an on-pixel.
    Components whose thresholded field is empty fall back to the
    plain-scaled ``coarse_boxes``. Returns (B, k, 4) float32 raw-coord boxes.
    """
    lh, lw = probs.shape[-2:]
    ph, pw = comps.shape[-2:]
    hh, ww = raw_hw
    sy, sx = hh / lh, ww / lw
    from onestop_tpu.ops.resize import resize2d

    up = resize2d(probs.astype(jnp.float32), raw_hw, "linear")   # (B, H, W)
    rows = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 1)
    # nearest-neighbor raw -> pooled-grid index maps (pixel centers)
    ri = jnp.clip(((jnp.arange(hh) + 0.5) * (ph / hh)).astype(jnp.int32), 0, ph - 1)
    ci = jnp.clip(((jnp.arange(ww) + 0.5) * (pw / ww)).astype(jnp.int32), 0, pw - 1)

    def one(upimg, comp, box):
        dil = jax.lax.reduce_window(comp, False, jax.lax.bitwise_or,
                                    (3, 3), (1, 1), "SAME")
        m = (upimg > threshold) & dil[ri][:, ci]
        big = jnp.int32(hh + ww)
        y0 = jnp.min(jnp.where(m, rows, big))
        y1 = jnp.max(jnp.where(m, rows, -1))
        x0 = jnp.min(jnp.where(m, cols, big))
        x1 = jnp.max(jnp.where(m, cols, -1))
        refined = jnp.stack([x0, y0, x1 - x0 + 1, y1 - y0 + 1]).astype(jnp.float32)
        x, y, w, h = box[0], box[1], box[2], box[3]
        fallback = jnp.stack([x * sx, y * sy, w * sx, h * sy])
        return jnp.where(jnp.any(m), refined, fallback)

    return jax.vmap(jax.vmap(one, in_axes=(None, 0, 0)))(up, comps, coarse_boxes)


def bisect_lung_components(mask: Array):
    """CCL-free two-lung components for the serving chain: exploit the
    anatomy instead of solving the general labeling problem.

    The chain only ever needs the TWO lung boxes (the reference consumes
    exactly two ``boundingRect``s, ``holdout.py:211-247``), and lungs are
    bilateral: a near-empty column band (the mediastinum) separates the two
    masses. So instead of the ``connected_components`` while_loop fixpoint +
    MXU size histogram + top-k, split the mask at the column-marginal valley
    and take per-side extents — pure reductions, no iteration:

    - a 1-D marginal ``m(c) = Σ mask`` and its cumulative sum give the
      25%/75% mass-quantile positions (inside the two lungs' bulk);
    - the split is the centered argmin of ``m`` restricted to that band
      (the mediastinum valley; centering the minimal plateau keeps the cut
      away from either lung when the valley is wide);
    - the axis is chosen per-slice: rows and columns both evaluate their
      valley, and the axis with the *emptier* valley wins (ties → columns).
      The ingest frame is ``rot90``'d (``ingest.load_slices``, mirroring the
      reference's ``read_nii``), so "bilateral" can mean row- OR
      column-separated depending on the volume's stored orientation — the
      data decides, no orientation convention is assumed;
    - components are the mask's two halves along the winning axis, boxes
      their masked-iota extents, ordered largest-first to match
      ``two_lung_components``.

    Same conventions as ``_topk_boxes``: (x, y, w, h) int32 boxes, empty
    sides fall back to the full-image box, an empty mask returns two
    full-image boxes with size 0. Divergence from CCL (documented, gated by
    scripts/verify_bisect_boxes.py): out-of-lung noise blobs are not
    size-filtered (they join whichever side they fall on — the downstream
    probability-field refinement restricts each box to its component's own
    footprint, so a noise blob can widen a box but not shift the lung out of
    it), and a single merged component returns its left/right halves instead
    of the same box twice (closer to the reference's always-two-lungs crop
    than CCL's duplicate). Also documented (ADVICE r4): the 25%-75%
    mass-quantile band assumes roughly BALANCED lung masses — if one lung
    holds >75% of the mask's mass, the band lies entirely inside the larger
    lung, so the valley search cuts through it and the smaller lung merges
    into one half. Strongly asymmetric masks (severe unilateral collapse /
    resection) should stay on the default ``box_mode="ccl"``, which labels
    components without any balance assumption.

    Returns (boxes (2, 4) int32, sizes (2,) int32, comps (2, H, W) bool).
    """
    h, w = mask.shape
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def axis_valley(marg, n, other):
        """(valley depth, centered split index) of a 1-D mass marginal,
        restricted to the 25%-75% mass-quantile band."""
        total = jnp.sum(marg)
        csum = jnp.cumsum(marg)
        idx = jnp.arange(n)
        q1 = jnp.argmax(csum * 4 >= total)
        q3 = jnp.argmax(csum * 4 >= 3 * total)
        band = (idx >= q1) & (idx <= q3)
        valley = jnp.min(jnp.where(band, marg, jnp.int32(other + 1)))
        is_min = band & (marg == valley)
        lo = jnp.argmax(is_min)
        hi = n - 1 - jnp.argmax(is_min[::-1])
        return valley, (lo + hi) // 2

    v_col, s_col = axis_valley(jnp.sum(mask, axis=0).astype(jnp.int32), w, h)
    v_row, s_row = axis_valley(jnp.sum(mask, axis=1).astype(jnp.int32), h, w)
    use_rows = v_row < v_col                                 # emptier valley wins
    half_a = jnp.where(use_rows, rows_i <= s_row, cols_i <= s_col)
    comp_a = mask & half_a
    comp_b = mask & ~half_a

    def one_box(sel):
        any_sel = jnp.any(sel)
        big = jnp.int32(h + w)
        y0 = jnp.min(jnp.where(sel, rows_i, big))
        y1 = jnp.max(jnp.where(sel, rows_i, -1))
        x0 = jnp.min(jnp.where(sel, cols_i, big))
        x1 = jnp.max(jnp.where(sel, cols_i, -1))
        box = jnp.stack([x0, y0, x1 - x0 + 1, y1 - y0 + 1])
        return jnp.where(any_sel, box, jnp.array([0, 0, w, h], jnp.int32))

    comps = jnp.stack([comp_a, comp_b])                      # (2, H, W)
    boxes = jax.vmap(one_box)(comps)                         # (2, 4)
    sizes = jnp.sum(comps, axis=(1, 2)).astype(jnp.int32)    # (2,)
    order = jnp.where(sizes[1] > sizes[0],
                      jnp.array([1, 0]), jnp.array([0, 1]))  # largest first
    return boxes[order], sizes[order], comps[order]


def two_lung_bboxes(mask: Array):
    """(x, y, w, h) boxes of the two largest components of a binary lung
    mask — the reference cropper's cnt1/cnt2 rects (``holdout.py:219-247``)."""
    labels = connected_components(mask)
    boxes, sizes = component_bboxes(labels, k=2)
    return boxes[0], boxes[1], sizes
