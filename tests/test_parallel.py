"""Fold-parallel CV on the 8-device virtual CPU mesh (SURVEY.md §4: the
TPU-world analog of testing multi-node without a cluster)."""

import jax
import numpy as np
import pytest

from onestop_tpu.config import TrainConfig
from onestop_tpu.data.splits import kfold_indices
from onestop_tpu.models import UNet
from onestop_tpu.parallel import cross_validate, make_mesh


def test_mesh_factoring():
    mesh = make_mesh(n_folds=4)
    assert mesh.devices.size == 8
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"fold": 4, "data": 2}
    mesh3 = make_mesh(n_folds=3)  # 3 doesn't divide 8 -> fold=2
    assert mesh3.devices.shape[0] in (1, 2)


@pytest.fixture(scope="module")
def tiny_data():
    rng = np.random.default_rng(0)
    n, hw = 24, 16
    masks = np.zeros((n, hw, hw, 1), np.float32)
    for i in range(n):
        y0, x0 = rng.integers(2, hw - 6, 2)
        masks[i, y0:y0 + 4, x0:x0 + 4] = 1.0
    x = np.clip(masks * 0.8 + 0.15 * rng.random((n, hw, hw, 1)), 0, 1).astype(np.float32)
    return x, masks


def test_cross_validate_fold_parallel(tiny_data):
    x, y = tiny_data
    folds = kfold_indices(len(x), 4, seed=42)
    mesh = make_mesh(n_folds=4)
    cfg = TrainConfig(batch_size=8, epochs=4, cosine_annealing=False, learning_rate=1e-3)
    tr, states, hist, best = cross_validate(
        UNet(widths=(4, 8), bridge=16), cfg, x, y, folds, mesh=mesh)
    assert hist["val_dice"].shape == (4, 4)  # (epochs, folds)
    assert all(b["params"] is not None for b in best)
    # training improved on average
    assert hist["loss"][-1].mean() < hist["loss"][0].mean()


def test_unequal_epoch_budgets_freeze_folds(tiny_data):
    """3-fold 80/20/20 analog: folds over budget must stop changing."""
    x, y = tiny_data
    folds = kfold_indices(len(x), 3, seed=42)
    cfg = TrainConfig(batch_size=8, epochs=4, cosine_annealing=False, learning_rate=1e-3)
    tr, states, hist, best = cross_validate(
        UNet(widths=(4,), bridge=8), cfg, x, y, folds, epochs_per_fold=[4, 2, 2])
    # folds 1,2 frozen after epoch 2: val loss constant afterwards
    np.testing.assert_allclose(hist["val_loss"][2][1:], hist["val_loss"][3][1:], rtol=1e-6)
    # fold 0 kept moving
    assert not np.allclose(hist["val_loss"][2][0], hist["val_loss"][3][0], rtol=1e-6)
    # best snapshots for frozen folds come from within their budget
    assert best[1]["epoch"] < 2 and best[2]["epoch"] < 2


def test_states_sharded_on_fold_axis(tiny_data):
    x, y = tiny_data
    folds = kfold_indices(len(x), 4, seed=42)
    mesh = make_mesh(n_folds=4)
    from onestop_tpu.parallel.cv import FoldParallelTrainer
    cfg = TrainConfig(batch_size=8, epochs=1, cosine_annealing=False)
    tr = FoldParallelTrainer(UNet(widths=(4,), bridge=8), cfg, n_folds=4, mesh=mesh)
    states = tr.init_states(jax.random.PRNGKey(0), x.shape[1:])
    leaf = jax.tree_util.tree_leaves(states.params)[0]
    assert "fold" in str(leaf.sharding.spec)
