"""Shared model pieces: initializers matching the Keras layers used by the
reference, parameter counting, NHWC conventions (TPU-native layout)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

# Keras Conv2D(kernel_initializer="he_normal") / default glorot_uniform
he_normal = nn.initializers.he_normal
glorot_uniform = nn.initializers.glorot_uniform

# Keras BatchNormalization defaults
BN_MOMENTUM = 0.99
BN_EPSILON = 1e-3


def batch_norm(train: bool, dtype=jnp.float32, name=None, axis_name=None,
               momentum: float = BN_MOMENTUM,
               epsilon: float = BN_EPSILON) -> nn.BatchNorm:
    """axis_name: mesh axis for cross-device (sync) batch statistics — under
    data parallelism the batch is sharded over 'data', and syncing BN stats
    keeps training numerics identical to the single-device run (the
    reference is single-device Keras, so sync-BN IS the parity behavior).

    momentum/epsilon default to the Keras BatchNormalization values the
    reference's models use implicitly; models thread them through from
    ``ModelConfig.bn_momentum``/``bn_epsilon``."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=momentum,
        epsilon=epsilon,
        dtype=dtype,
        name=name,
        axis_name=axis_name,
    )


class ConvStemS2D(nn.Module):
    """3×3 SAME conv over a single-channel NHWC input, computed on a 2×2
    space-to-depth packed grid — mathematically identical to
    ``nn.Conv(features, (3, 3), padding="SAME")`` (the packed kernel's extra
    taps are exact zeros; only the f32 accumulation order differs, ~1e-7
    relative), with the same parameter names/shapes, so checkpoints are
    interchangeable.

    Why: XLA:TPU executes C_in=1 convolutions at ~2% MXU utilization (the
    single input channel lane-pads catastrophically; measured ~50 ms of a
    1024×224² U-Net batch on v5e just for the stem). Packing 2×2 pixels into
    4 channels turns it into a 3×3, 4→4·features conv at half resolution —
    a well-shaped MXU op. Falls back to the plain conv for odd sizes or
    C_in != 1.
    """
    features: int
    dtype: jnp.dtype = jnp.float32
    kernel_init: Any = he_normal()

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init, (3, 3, 1, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,),
                          jnp.float32)
        b, h, w, c = x.shape
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        if c != 1 or h % 2 or w % 2:
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias.astype(self.dtype)

        f = self.features
        # pack pixels: (B, H, W, 1) -> (B, H/2, W/2, 4), channel = a·2 + b
        xp = (x.reshape(b, h // 2, 2, w // 2, 2)
                .transpose(0, 1, 3, 2, 4)
                .reshape(b, h // 2, w // 2, 4))
        # packed kernel (3, 3, 4, 4f): tap (pu, pv) of input sub-position
        # (a_in, b_in) contributes W[du+1, dv+1] to output sub-position
        # (a_out, b_out) iff du = 2·pu + a_in − a_out ∈ {-1, 0, 1} (same for
        # dv); all other taps are zero, so the contraction adds exact zeros.
        kp = jnp.zeros((3, 3, 2, 2, 2, 2, f), self.dtype)
        for a_out in (0, 1):
            for a_in in (0, 1):
                for pu in (-1, 0, 1):
                    du = 2 * pu + a_in - a_out
                    if du not in (-1, 0, 1):
                        continue
                    for b_out in (0, 1):
                        for b_in in (0, 1):
                            for pv in (-1, 0, 1):
                                dv = 2 * pv + b_in - b_out
                                if dv not in (-1, 0, 1):
                                    continue
                                kp = kp.at[pu + 1, pv + 1, a_in, b_in,
                                           a_out, b_out].set(k[du + 1, dv + 1, 0])
        kp = kp.reshape(3, 3, 4, 4 * f)
        yp = jax.lax.conv_general_dilated(
            xp, kp, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))       # (B, H/2, W/2, 4f)
        y = (yp.reshape(b, h // 2, w // 2, 2, 2, f)
               .transpose(0, 1, 3, 2, 4, 5)
               .reshape(b, h, w, f))
        return y + bias.astype(self.dtype)


def count_params(variables) -> int:
    """Total parameter count including BN statistics (Keras 'Total params'
    semantics, so counts are comparable to the reference's model.summary())."""
    leaves = jax.tree_util.tree_leaves(variables)
    return int(sum(x.size for x in leaves))
