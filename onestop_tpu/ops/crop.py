"""Two-lung ROI crop, reproducing the reference ``cropper`` geometry
(``holdout.py:211-273``): each lung's bounding box is cropped, INTER_AREA
resized to (H=250, W=125), and the two tiles are horizontally concatenated
into a 250×250 image. Here the whole chain is jittable: bboxes come from
``ops.bbox`` and the crop+resize runs as fused dynamic-window matmuls
(``ops.resize.crop_resize``), so no dynamic shapes ever materialize.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from onestop_tpu.ops.bbox import two_lung_bboxes
from onestop_tpu.ops.resize import crop_resize

Array = jax.Array


def fuse_lung_crops(
    img: Array,
    box1: Array,
    box2: Array,
    tile_hw: tuple[int, int] = (250, 125),
    method: str = "area",
    precision=None,
) -> Array:
    """Crop ``img`` by the two recorded lung boxes, resize each tile to
    ``tile_hw`` and hstack — the 'cts'/'infections' path of ``read_nii``
    (``holdout.py:352-358, 364-368``). Boxes are (x, y, w, h), traced OK.
    precision: matmul precision (default fp32-HIGHEST for cv2 parity; the
    serving pipeline passes DEFAULT/bf16)."""
    t1 = crop_resize(img, (box1[0], box1[1], box1[2], box1[3]), tile_hw, method,
                     precision=precision)
    t2 = crop_resize(img, (box2[0], box2[1], box2[2], box2[3]), tile_hw, method,
                     precision=precision)
    return jnp.concatenate([t1, t2], axis=-1)


def cropper(img01, tile_hw: tuple[int, int] = (250, 125)):
    """Reference ``cropper(test_img, demo=0)`` equivalent on a float [0,1]
    image that is already binary-valued (the lung-mask path, ``holdout.py:339-345``
    binarizes with ``img[img>0]=1`` before calling it).

    The ×255 → uint8 step truncates the float64 product host-side, matching
    ``np.uint8(img*255)`` exactly (an on-device f32 multiply shifts values
    whose f64 product sits just below an integer). Host entry point — the
    batched jitted path is ``fuse_lung_crops`` with precomputed boxes.

    Returns (fused (250, 250) float image scaled like the uint8 path,
    box1, box2) with boxes as (x, y, w, h) int32.
    """
    import numpy as np

    u8 = jnp.asarray(np.uint8(np.clip(np.asarray(img01, np.float64) * 255.0, 0, 255)))
    mask = u8 > 0
    box1, box2, _ = two_lung_bboxes(mask)
    fused = fuse_lung_crops(u8.astype(jnp.float32), box1, box2, tile_hw)
    return fused, box1, box2
