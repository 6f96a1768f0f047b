"""Trainer: overfit a tiny batch (the minimal end-to-end slice M1),
checkpoint tracking, variable last batch, checkpoint round-trip."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onestop_tpu.config import TrainConfig
from onestop_tpu.models import ClassifierCNN, UNet
from onestop_tpu.train import Trainer, load_checkpoint, save_checkpoint


@pytest.fixture(scope="module")
def tiny_seg_data():
    rng = np.random.default_rng(0)
    n, hw = 16, 32
    masks = np.zeros((n, hw, hw, 1), np.float32)
    for i in range(n):
        y0, x0 = rng.integers(4, hw - 12, 2)
        masks[i, y0:y0 + 8, x0:x0 + 8] = 1.0
    x = np.clip(masks * 0.7 + 0.2 * rng.random((n, hw, hw, 1)), 0, 1).astype(np.float32)
    return x, masks


def small_unet():
    return UNet(widths=(8, 16), bridge=32)


def test_overfit_tiny_unet(tiny_seg_data):
    x, y = tiny_seg_data
    cfg = TrainConfig(batch_size=8, epochs=60, schedule="constant", learning_rate=2e-3)
    tr = Trainer(small_unet(), cfg)
    state = tr.init_state(jax.random.PRNGKey(0), x.shape[1:])
    state, hist, best = tr.fit(state, x, y, x, y)
    assert hist["val_metric"][-1] > 0.6, hist["val_metric"][-5:]
    assert hist["loss"][-1] < hist["loss"][0]
    assert best["val_dice_coeff"]["value"] >= max(hist["val_metric"]) - 1e-9
    assert best["val_loss"]["value"] <= min(hist["val_loss"]) + 1e-9


def test_variable_last_batch(tiny_seg_data):
    """n=13 with bs=8 -> padded batch; loss must be finite and training sane."""
    x, y = tiny_seg_data
    x, y = x[:13], y[:13]
    cfg = TrainConfig(batch_size=8, epochs=2, schedule="constant")
    tr = Trainer(small_unet(), cfg)
    state = tr.init_state(jax.random.PRNGKey(0), x.shape[1:])
    state, hist, _ = tr.fit(state, x, y, x, y)
    assert all(np.isfinite(v) for v in hist["loss"] + hist["val_loss"])


def test_cosine_lr_history():
    cfg = TrainConfig(batch_size=8, epochs=8, schedule="cosine")
    x = np.zeros((8, 16, 16, 1), np.float32)
    y = np.zeros((8, 16, 16, 1), np.float32)
    tr = Trainer(UNet(widths=(4,), bridge=8), cfg)
    state = tr.init_state(jax.random.PRNGKey(0), x.shape[1:])
    _, hist, _ = tr.fit(state, x, y)
    # epoch 0 -> eta_max, epoch 7 (=T_max) -> eta_min
    assert hist["lr"][0] == pytest.approx(5e-4)
    assert hist["lr"][7] == pytest.approx(1e-4)


def test_classifier_with_class_weights_and_auc():
    rng = np.random.default_rng(1)
    n, hw = 24, 32
    y = (rng.random(n) > 0.3).astype(np.float32)
    x = (y[:, None, None, None] * 0.6 + 0.3 * rng.random((n, hw, hw, 1))).astype(np.float32)
    cfg = TrainConfig(batch_size=8, epochs=6, loss="bce", schedule="constant",
                      learning_rate=1e-3, use_class_weight=True,
                      monitor=("val_loss", "val_auc"))  # classifier monitors (task2)
    tr = Trainer(ClassifierCNN(widths=(4, 8), dense=8), cfg, seg_metrics=False)
    state = tr.init_state(jax.random.PRNGKey(0), x.shape[1:])
    from onestop_tpu.losses import balanced_class_weights
    cw = np.asarray(balanced_class_weights(jnp.asarray(y)))
    sw = cw[y.astype(int)]
    state, hist, best = tr.fit(state, x, y[:, None], x, y[:, None],
                               sample_weights=sw, track_auc=True)
    assert hist["auc_val"][-1] > 0.8
    assert best["val_auc"]["params"] is not None


def test_training_with_on_device_augmentation(tiny_seg_data):
    """augment_cfg trains through the on-device flip/affine pipeline
    (the usable version of the reference's dead augmentation, Q7)."""
    from onestop_tpu.config import AugmentConfig
    x, y = tiny_seg_data
    cfg = TrainConfig(batch_size=8, epochs=3, schedule="constant", learning_rate=1e-3)
    tr = Trainer(small_unet(), cfg, augment_cfg=AugmentConfig())
    state = tr.init_state(jax.random.PRNGKey(0), x.shape[1:])
    state, hist, _ = tr.fit(state, x, y, x, y)
    assert all(np.isfinite(v) for v in hist["loss"] + hist["val_loss"])
    assert hist["loss"][-1] < hist["loss"][0]


def test_checkpoint_roundtrip(tmp_path, tiny_seg_data):
    x, y = tiny_seg_data
    cfg = TrainConfig(batch_size=8, epochs=1, schedule="constant")
    tr = Trainer(small_unet(), cfg)
    state = tr.init_state(jax.random.PRNGKey(0), x.shape[1:])
    state, _, _ = tr.fit(state, x, y)
    p = save_checkpoint(tmp_path / "m.msgpack", state.params, state.batch_stats,
                        {"val_dice": 0.9})
    tpl = tr.init_state(jax.random.PRNGKey(1), x.shape[1:])
    params, bstats = load_checkpoint(p, tpl.params, tpl.batch_stats)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # predictions identical after restore
    pred_a = tr.predict(state, x[:4])
    restored = dataclasses.replace(tpl, params=params, batch_stats=bstats)
    pred_b = tr.predict(restored, x[:4])
    np.testing.assert_array_equal(pred_a, pred_b)
