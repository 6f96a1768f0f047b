"""Mesh construction: ('fold', 'data') axes over the available devices.

fold — independent CV folds (or independent model replicas);
data — data parallelism inside a fold (batch axis sharding).

The reference has no distributed layer at all (SURVEY.md §2.4); this module
is the TPU-native counterpart it lacked. Collectives ride ICI within a
slice; nothing here ever needs DCN at reference scale.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_folds: int = 1, devices=None) -> Mesh:
    """Factor devices into a (fold, data) mesh.

    fold gets min(n_folds, n_devices) if it divides the device count,
    otherwise the largest divisor of n_devices that is <= n_folds; the rest
    go to data parallelism."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    fold = 1
    for f in range(min(n_folds, n), 0, -1):
        if n % f == 0:
            fold = f
            break
    data = n // fold
    arr = np.asarray(devices).reshape(fold, data)
    return Mesh(arr, ("fold", "data"))


def fold_pspec(ndim: int) -> P:
    """Shard the leading (fold) axis, replicate the rest."""
    return P("fold", *([None] * (ndim - 1)))


def replicated_pspec() -> P:
    return P()


def shard_fold_tree(tree, mesh: Mesh):
    """device_put a fold-stacked pytree with the leading axis on 'fold'."""
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, fold_pspec(a.ndim))), tree
    )


def replicate_tree(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), tree
    )
