"""U-Net++ (nested dense-skip decoder) with the reference's exact depth-4
topology (``task1_unet_plus_plus.py:860-950``; the L4 bridge/level-5 column
is commented out there and omitted here too):

backbone blocks c1–c4: [Conv3×3 elu he_normal → Dropout .2 → Conv3×3 elu →
BN → MaxPool2] at 32/64/128/256; nested nodes conv{i}_{j} = ConvTranspose
up + concat of all same-level predecessors + conv_block, where conv_block =
2 × [Conv3×3 elu he_normal → Dropout .4 → BN]; head Conv1×1 sigmoid
he_normal on conv1_4.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from onestop_tpu.models.common import (
    ConvStemS2D, batch_norm, glorot_uniform, he_normal)


class UNetPP(nn.Module):
    widths: Sequence[int] = (32, 64, 128, 256)
    backbone_dropout: float = 0.2
    block_dropout: float = 0.4
    out_channels: int = 1
    dtype: jnp.dtype = jnp.float32
    bn_axis: str | None = None  # mesh axis for sync-BN under data parallelism
    bn_momentum: float = 0.99   # Keras BatchNormalization defaults
    bn_epsilon: float = 1e-3
    s2d_stem: bool = False  # space-to-depth first conv (see models/unet.py)

    def _bn(self, train, name):
        return batch_norm(train, self.dtype, name=name, axis_name=self.bn_axis,
                          momentum=self.bn_momentum, epsilon=self.bn_epsilon)

    def _conv(self, w, name):
        return nn.Conv(w, (3, 3), padding="SAME", kernel_init=he_normal(),
                       dtype=self.dtype, name=name)

    def _convt(self, w, name):
        return nn.ConvTranspose(w, (2, 2), strides=(2, 2), padding="SAME",
                                kernel_init=glorot_uniform(), dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        drop = lambda rate, name: nn.Dropout(rate, deterministic=not train, name=name)

        def backbone_block(h, w, name):
            if name == "c1" and self.s2d_stem:
                h = nn.elu(ConvStemS2D(w, dtype=self.dtype,
                                       kernel_init=he_normal(),
                                       name="c1_conv0")(h))
            else:
                h = nn.elu(self._conv(w, f"{name}_conv0")(h))
            h = drop(self.backbone_dropout, f"{name}_drop")(h)
            h = nn.elu(self._conv(w, f"{name}_conv1")(h))
            return self._bn(train, f"{name}_bn")(h)

        def conv_block(h, w, name):
            h = nn.elu(self._conv(w, f"{name}_conv0")(h))
            h = drop(self.block_dropout, f"{name}_drop0")(h)
            h = self._bn(train, f"{name}_bn0")(h)
            h = nn.elu(self._conv(w, f"{name}_conv1")(h))
            h = drop(self.block_dropout, f"{name}_drop1")(h)
            return self._bn(train, f"{name}_bn1")(h)

        w1, w2, w3, w4 = self.widths
        c1 = backbone_block(x, w1, "c1")
        p1 = nn.max_pool(c1, (2, 2), strides=(2, 2))
        c2 = backbone_block(p1, w2, "c2")
        p2 = nn.max_pool(c2, (2, 2), strides=(2, 2))

        up1_2 = self._convt(w1, "up1_2")(c2)
        conv1_2 = conv_block(jnp.concatenate([up1_2, c1], -1), w1, "conv1_2")

        c3 = backbone_block(p2, w3, "c3")
        p3 = nn.max_pool(c3, (2, 2), strides=(2, 2))

        up2_2 = self._convt(w2, "up2_2")(c3)
        conv2_2 = conv_block(jnp.concatenate([up2_2, c2], -1), w2, "conv2_2")
        up1_3 = self._convt(w1, "up1_3")(conv2_2)
        conv1_3 = conv_block(jnp.concatenate([up1_3, c1, conv1_2], -1), w1, "conv1_3")

        c4 = backbone_block(p3, w4, "c4")
        # p4 = max_pool(c4) exists in the reference but feeds the commented-out
        # level-5 column only; omitted.

        up3_2 = self._convt(w3, "up3_2")(c4)
        conv3_2 = conv_block(jnp.concatenate([up3_2, c3], -1), w3, "conv3_2")
        up2_3 = self._convt(w2, "up2_3")(conv3_2)
        conv2_3 = conv_block(jnp.concatenate([up2_3, c2, conv2_2], -1), w2, "conv2_3")
        up1_4 = self._convt(w1, "up1_4")(conv2_3)
        conv1_4 = conv_block(jnp.concatenate([up1_4, c1, conv1_2, conv1_3], -1), w1, "conv1_4")

        out = nn.Conv(self.out_channels, (1, 1), padding="SAME", kernel_init=he_normal(),
                      dtype=self.dtype, name="head")(conv1_4)
        return nn.sigmoid(out.astype(jnp.float32))
