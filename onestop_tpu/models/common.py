"""Shared model pieces: initializers matching the Keras layers used by the
reference, parameter counting, NHWC conventions (TPU-native layout)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# Keras Conv2D(kernel_initializer="he_normal") / default glorot_uniform
he_normal = nn.initializers.he_normal
glorot_uniform = nn.initializers.glorot_uniform

# Keras BatchNormalization defaults
BN_MOMENTUM = 0.99
BN_EPSILON = 1e-3


def batch_norm(train: bool, dtype=jnp.float32, name=None, axis_name=None) -> nn.BatchNorm:
    """axis_name: mesh axis for cross-device (sync) batch statistics — under
    data parallelism the batch is sharded over 'data', and syncing BN stats
    keeps training numerics identical to the single-device run (the
    reference is single-device Keras, so sync-BN IS the parity behavior)."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPSILON,
        dtype=dtype,
        name=name,
        axis_name=axis_name,
    )


def count_params(variables) -> int:
    """Total parameter count including BN statistics (Keras 'Total params'
    semantics, so counts are comparable to the reference's model.summary())."""
    leaves = jax.tree_util.tree_leaves(variables)
    return int(sum(x.size for x in leaves))
