"""U-Net with the reference's exact topology (``holdout.py:853-916``; the
same model is duplicated in both CV scripts and task3 — SURVEY.md §2.1):

encoder blocks  [Conv3×3 relu he_normal ×2 → BN → MaxPool2 → Dropout .25]
at widths 32/64/128/256; bridge 512×2 convs; decoder blocks
[ConvTranspose2×2 s2 → concat skip → BN → Conv3×3 relu ×2] at
256/128/64/32; head Conv1×1 sigmoid. Skips are the *post-BN* encoder
activations. ~7.86 M params at (224, 224, 1). NHWC throughout (TPU layout);
``dtype=bfloat16`` enables MXU-friendly mixed precision with fp32 params/BN.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from onestop_tpu.models.common import (
    ConvStemS2D, batch_norm, glorot_uniform, he_normal)


class UNet(nn.Module):
    widths: Sequence[int] = (32, 64, 128, 256)
    bridge: int = 512
    dropout: float = 0.25
    out_channels: int = 1
    dtype: jnp.dtype = jnp.float32
    bn_axis: str | None = None  # mesh axis for sync-BN under data parallelism
    bn_momentum: float = 0.99   # Keras BatchNormalization defaults
    bn_epsilon: float = 1e-3
    # space-to-depth stem (see common.ConvStemS2D): pays two relayout
    # transposes to fix the C_in=1 conv's MXU utilization. Measured on v5e:
    # ~1.5x faster TRAINING epochs (the stem conv's backward is the worst op
    # in the model) but ~8% slower fused inference (the relayouts beat the
    # conv win once the input fuses with the preproc chain) — so runners
    # train with it on and the serving pipeline keeps it off. Params are
    # identical either way; checkpoints are interchangeable.
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        conv = lambda w, name: nn.Conv(
            w, (3, 3), padding="SAME", kernel_init=he_normal(), dtype=self.dtype, name=name
        )
        convt = lambda w, name: nn.ConvTranspose(
            w, (2, 2), strides=(2, 2), padding="SAME",
            kernel_init=glorot_uniform(), dtype=self.dtype, name=name,
        )

        skips = []
        for i, w in enumerate(self.widths):
            if i == 0 and self.s2d_stem:
                x = nn.relu(ConvStemS2D(w, dtype=self.dtype,
                                        kernel_init=he_normal(),
                                        name="enc0_conv0")(x))
            else:
                x = nn.relu(conv(w, f"enc{i}_conv0")(x))
            x = nn.relu(conv(w, f"enc{i}_conv1")(x))
            x = batch_norm(train, self.dtype, name=f"enc{i}_bn", axis_name=self.bn_axis,
                           momentum=self.bn_momentum, epsilon=self.bn_epsilon)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Dropout(self.dropout, deterministic=not train, name=f"enc{i}_drop")(x)

        x = nn.relu(conv(self.bridge, "bridge_conv0")(x))
        x = nn.relu(conv(self.bridge, "bridge_conv1")(x))

        for i, w in reversed(list(enumerate(self.widths))):
            x = convt(w, f"dec{i}_up")(x)
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = batch_norm(train, self.dtype, name=f"dec{i}_bn", axis_name=self.bn_axis,
                           momentum=self.bn_momentum, epsilon=self.bn_epsilon)(x)
            x = nn.relu(conv(w, f"dec{i}_conv0")(x))
            x = nn.relu(conv(w, f"dec{i}_conv1")(x))

        x = nn.Conv(
            self.out_channels, (1, 1), kernel_init=glorot_uniform(),
            dtype=self.dtype, name="head",
        )(x)
        return nn.sigmoid(x.astype(jnp.float32))
