"""Loss/metric unit tests vs closed-form values (SURVEY.md §4 test plan)."""

import jax.numpy as jnp
import numpy as np
import pytest

from onestop_tpu import losses as L


def test_dice_perfect_and_disjoint():
    t = jnp.ones((2, 4, 4, 1))
    assert float(L.dice_coeff(t, t)) == pytest.approx((2 * 32 + 1) / (64 + 1))
    p = jnp.zeros((2, 4, 4, 1))
    assert float(L.dice_coeff(t, p)) == pytest.approx(1 / 33)  # smooth=1 only


def test_dice_closed_form():
    t = jnp.array([[1.0, 0.0, 1.0, 0.0]])
    p = jnp.array([[0.5, 0.5, 1.0, 0.0]])
    # intersection=1.5, sums: 2 + 2
    assert float(L.dice_coeff(t, p)) == pytest.approx((2 * 1.5 + 1) / (2 + 2 + 1))


def test_bce_matches_manual():
    t = jnp.array([[1.0, 0.0]])
    p = jnp.array([[0.8, 0.3]])
    manual = -(np.log(0.8) + np.log(0.7)) / 2
    assert float(L.binary_crossentropy(t, p)) == pytest.approx(manual, rel=1e-4)  # fp32 log


def test_bce_dice_is_half_half():
    t = jnp.array([[1.0, 0.0, 1.0, 1.0]])
    p = jnp.array([[0.9, 0.2, 0.7, 0.6]])
    assert float(L.bce_dice_loss(t, p)) == pytest.approx(
        0.5 * float(L.binary_crossentropy(t, p)) + 0.5 * (1 - float(L.dice_coeff(t, p)))
    )


def test_zero_weights_exclude_samples():
    t = jnp.array([[1.0, 1.0], [0.0, 0.0]])
    p = jnp.array([[0.9, 0.8], [0.9, 0.9]])  # second sample is terrible
    w = jnp.array([1.0, 0.0])
    full = L.bce_dice_loss(t[:1], p[:1])
    masked = L.bce_dice_loss(t, p, weights=w)
    assert float(masked) == pytest.approx(float(full), rel=1e-6)


def test_tversky_alpha_beta_half_is_dice_like():
    t = jnp.array([[[[1.0], [0.0]], [[1.0], [1.0]]]])
    p = t
    # perfect prediction: T = num/num = 1, Ncl=1 -> loss 0
    assert float(L.tversky_loss(t, p)) == pytest.approx(0.0, abs=1e-6)


def test_weighted_bce_dice_runs_nhwc():
    t = jnp.zeros((2, 64, 64, 1)).at[:, 20:40, 20:40, :].set(1.0)
    p = jnp.clip(t + 0.1, 0.0, 1.0)
    v = float(L.weighted_bce_dice_loss(t, p))
    assert np.isfinite(v) and v > 0


def test_cls_metrics_closed_form():
    t = jnp.array([1.0, 1.0, 0.0, 0.0])
    p = jnp.array([0.9, 0.4, 0.6, 0.1])  # rounded: 1,0,1,0 -> tp=1, fp=1, fn=1
    assert float(L.precision_metric(t, p)) == pytest.approx(0.5, rel=1e-5)
    assert float(L.recall_metric(t, p)) == pytest.approx(0.5, rel=1e-5)
    assert float(L.f1_metric(t, p)) == pytest.approx(0.5, rel=1e-4)


def test_balanced_class_weights_matches_sklearn():
    from sklearn.utils import class_weight
    y = np.array([0] * 497 + [1] * 1615)
    ref = class_weight.compute_class_weight("balanced", classes=np.array([0, 1]), y=y)
    got = np.asarray(L.balanced_class_weights(jnp.asarray(y)))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_tversky_and_weighted_bce_dice_accept_weights_and_axis():
    """Review r2: every LOSSES-registry entry must support the Trainer call
    convention loss(y, p, weights=...) and the DP axis_name kwarg — a
    registry loss that can't take them is unusable (or silently shard-local
    under data parallelism)."""
    import inspect

    rng = np.random.default_rng(0)
    t = (rng.random((4, 16, 16, 1)) > 0.5).astype(np.float32)
    p = rng.random((4, 16, 16, 1)).astype(np.float32)
    w_full = np.ones(4, np.float32)
    w_mask = np.array([1, 1, 1, 0], np.float32)
    for name, fn in L.LOSSES.items():
        sig = inspect.signature(fn).parameters
        assert "weights" in sig and "axis_name" in sig, name
        full = float(fn(jnp.asarray(t), jnp.asarray(p), weights=jnp.asarray(w_full)))
        base = float(fn(jnp.asarray(t), jnp.asarray(p)))
        assert full == pytest.approx(base, rel=1e-6), name  # ones-weights no-op
        # masking the last sample == dropping it
        masked = float(fn(jnp.asarray(t), jnp.asarray(p), weights=jnp.asarray(w_mask)))
        dropped = float(fn(jnp.asarray(t[:3]), jnp.asarray(p[:3])))
        assert masked == pytest.approx(dropped, rel=1e-5), name
