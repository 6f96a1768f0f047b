"""Pure-JAX (flax) models with the exact layer inventory of the reference
(SURVEY.md §2.1): U-Net (holdout.py:853-916), U-Net++
(task1_unet_plus_plus.py:860-950), classifier CNN (task2:747-780)."""

from onestop_tpu.models.unet import UNet
from onestop_tpu.models.unetpp import UNetPP
from onestop_tpu.models.classifier import ClassifierCNN
from onestop_tpu.models.common import count_params

__all__ = ["UNet", "UNetPP", "ClassifierCNN", "count_params"]
