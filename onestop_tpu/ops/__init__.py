"""TPU-native image ops: resize-as-matmul, CLAHE, connected-component bboxes,
fused crop+resize, on-device augmentation.

These replace the reference's per-slice OpenCV calls
(``/root/reference/Scripts/task1_preprocessing_plus_unet_with_comments.py:163-376``)
with jittable XLA/Pallas code. Every op is validated against OpenCV golden
outputs in ``tests/``.
"""

from onestop_tpu.ops.resize import (
    area_weights,
    linear_weights,
    resize2d,
    crop_resize,
    to_uint8,
)
from onestop_tpu.ops.clahe import clahe, clahe_lut
from onestop_tpu.ops.bbox import (two_lung_bboxes, connected_components,
                                  component_bboxes, bisect_lung_components)
from onestop_tpu.ops.crop import fuse_lung_crops, cropper
from onestop_tpu.ops.augment import random_augment_pair

__all__ = [
    "area_weights",
    "linear_weights",
    "resize2d",
    "crop_resize",
    "to_uint8",
    "clahe",
    "clahe_lut",
    "two_lung_bboxes",
    "connected_components",
    "component_bboxes",
    "bisect_lung_components",
    "fuse_lung_crops",
    "cropper",
    "random_augment_pair",
]
