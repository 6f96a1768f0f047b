"""Sweep + classification metrics: vs naive numpy implementation of
segmentation_models semantics, and sklearn roc_auc_score."""

import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.metrics import roc_auc_score

from onestop_tpu.metrics.classification import classification_report, confusion_at_threshold, roc_auc
from onestop_tpu.metrics.segmentation import SMOOTH, grid, sweep_report, threshold_sweep


def _naive_sm(y_true, y_pred, t):
    """segmentation_models FScore/IOUScore/Precision/Recall, global."""
    gt = y_true.ravel()
    pr = (y_pred.ravel() > t).astype(np.float64)
    inter = (gt * pr).sum()
    dice = (2 * inter + SMOOTH) / (gt.sum() + pr.sum() + SMOOTH)
    iou = (inter + SMOOTH) / (gt.sum() + pr.sum() - inter + SMOOTH)
    prec = (inter + SMOOTH) / (pr.sum() + SMOOTH)
    rec = (inter + SMOOTH) / (gt.sum() + SMOOTH)
    return dice, iou, prec, rec


def test_sweep_global_matches_naive(rng):
    y = (rng.random((20, 16, 16, 1)) > 0.7).astype(np.float32)
    y[y > 0] *= rng.random((y > 0).sum())  # gray values like the real masks
    p = rng.random((20, 16, 16, 1)).astype(np.float32)
    ths = grid(0.1, 0.8, 0.05)
    res = threshold_sweep(y, p, ths, batch_size=None)
    for i, t in enumerate(ths):
        d, io, pr, rc = _naive_sm(y, p, t)
        assert res["dice"][i] == pytest.approx(d, rel=1e-5)
        assert res["iou"][i] == pytest.approx(io, rel=1e-5)
        assert res["precision"][i] == pytest.approx(pr, rel=1e-5)
        assert res["recall"][i] == pytest.approx(rc, rel=1e-5)


def test_sweep_batchwise_is_keras_weighted_mean(rng):
    """batch_size mode == per-batch metrics averaged weighted by batch size."""
    n, bs = 21, 8  # 8 + 8 + 5
    y = (rng.random((n, 8, 8, 1)) > 0.6).astype(np.float32)
    p = rng.random((n, 8, 8, 1)).astype(np.float32)
    ths = np.array([0.5], np.float32)
    res = threshold_sweep(y, p, ths, batch_size=bs)
    vals, ws = [], []
    for i in range(0, n, bs):
        d, *_ = _naive_sm(y[i:i + bs], p[i:i + bs], 0.5)
        vals.append(d)
        ws.append(len(y[i:i + bs]))
    expect = np.average(vals, weights=ws)
    assert res["dice"][0] == pytest.approx(expect, rel=1e-5)


def test_sweep_report_structure(rng):
    y = (rng.random((10, 8, 8, 1)) > 0.5).astype(np.float32)
    p = np.clip(y * 0.8 + 0.1 * rng.random(y.shape), 0, 1).astype(np.float32)
    rep = sweep_report(y, p, coarse=(0.1, 0.8, 0.1), fine=(0.4, 0.6, 0.01))
    assert 0.4 <= rep["best_threshold"] < 0.6
    assert rep["best_dice"] > 0.5


@pytest.mark.parametrize("with_ties", [False, True])
def test_roc_auc_matches_sklearn(rng, with_ties):
    y = (rng.random(500) > 0.7).astype(np.float32)
    s = rng.random(500).astype(np.float32)
    if with_ties:
        s = np.round(s, 1)  # heavy ties
    ref = roc_auc_score(y, s)
    got = float(roc_auc(jnp.asarray(y), jnp.asarray(s)))
    assert got == pytest.approx(ref, abs=1e-6)


def test_confusion_and_report(rng):
    y = np.array([1, 1, 1, 0, 0])
    s = np.array([0.9, 0.6, 0.4, 0.3, 0.7])
    tn, fp, fn, tp = confusion_at_threshold(y, s, 0.5)
    assert (tn, fp, fn, tp) == (1, 1, 1, 2)
    rep = classification_report(y, s, thresholds=(0.5,))
    at = rep["at_threshold"][0.5]
    assert at["accuracy"] == pytest.approx(3 / 5)
    assert at["precision"] == pytest.approx(2 / 3)
    assert at["recall"] == pytest.approx(2 / 3)


def test_classification_best_threshold_search(rng):
    """The automated version of the reference's by-hand 0.81 finding
    (task2:957-989): a high-shifted score distribution must yield a high
    best-accuracy threshold, and its stats must beat the fixed 0.50 row."""
    from onestop_tpu.metrics.classification import classification_report

    y = (rng.random(400) > 0.6).astype(np.float32)
    # well-separated but calibration-shifted scores: negatives ~0.7, positives ~0.95
    s = np.where(y > 0.5, 0.95, 0.70) + rng.normal(0, 0.03, 400)
    rep = classification_report(y, s)
    assert rep["auc"] > 0.99
    assert 0.75 < rep["best_threshold"] < 0.93
    assert rep["at_best_threshold"]["accuracy"] > rep["at_threshold"][0.5]["accuracy"]
    assert rep["at_best_threshold"]["accuracy"] > 0.97


def test_temperature_scaling_recovers_overconfidence(rng):
    """Scores generated as sigmoid(T0 * z) for true logits z are overconfident
    by exactly T0; fit_temperature must recover ~T0, calibration must cut ECE,
    and AUC must be invariant (the map is monotone)."""
    from onestop_tpu.metrics.classification import (
        apply_temperature, expected_calibration_error, fit_temperature, roc_auc)

    t0 = 4.0
    z = rng.normal(0.0, 1.5, 4000)            # true log-odds
    y = (rng.random(4000) < 1 / (1 + np.exp(-z))).astype(np.float32)
    s = 1 / (1 + np.exp(-t0 * z))             # overconfident by factor t0
    t_fit = fit_temperature(y, s)
    assert t_fit == pytest.approx(t0, rel=0.15)
    cal = apply_temperature(s, t_fit)
    assert expected_calibration_error(y, cal) < expected_calibration_error(y, s) / 2
    a_raw = float(roc_auc(jnp.asarray(y), jnp.asarray(s)))
    a_cal = float(roc_auc(jnp.asarray(y), jnp.asarray(cal)))
    assert a_cal == pytest.approx(a_raw, abs=1e-6)


def test_classification_report_calibration_block(rng):
    """The report's calibration block: saturated-high scores (the task2
    classifier's documented failure mode) get T > 1 and a lower ECE."""
    from onestop_tpu.metrics.classification import classification_report

    y = (rng.random(500) > 0.25).astype(np.float32)
    s = np.where(y > 0.5, 0.997, 0.95) + rng.normal(0, 0.002, 500)  # saturated
    rep = classification_report(y, np.clip(s, 1e-6, 1 - 1e-6))
    cal = rep["calibration"]
    assert cal["temperature"] > 1.0
    # temperature alone cannot re-center a SHIFTED saturated distribution
    # (logit sign is T-invariant) — the report uses Platt (a*z + b), whose
    # bias term moves the 0.95-parked negatives back below 0.5
    assert cal["ece_calibrated"] < cal["ece_raw"] / 2
    assert cal["at_0.50_calibrated"]["accuracy"] > rep["at_threshold"][0.5]["accuracy"]
    assert "at_0.50_calibrated" in cal

def test_platt_fit_matches_sklearn_logistic_regression(rng):
    """fit_platt IS unregularized logistic regression on the logit feature —
    pin the Newton solver against sklearn's (golden), on a non-separable
    sample where the MLE is finite and unique."""
    from sklearn.linear_model import LogisticRegression

    from onestop_tpu.metrics.classification import apply_platt, fit_platt

    z = rng.normal(0.0, 2.0, 3000)
    y = (rng.random(3000) < 1 / (1 + np.exp(-(0.6 * z - 0.8)))).astype(np.float64)
    p = 1 / (1 + np.exp(-z))
    a, b = fit_platt(y, p)
    sk = LogisticRegression(penalty=None, tol=1e-10, max_iter=1000)
    sk.fit(z[:, None], y)
    assert a == pytest.approx(float(sk.coef_[0, 0]), rel=1e-4)
    assert b == pytest.approx(float(sk.intercept_[0]), rel=1e-4)
    cal = apply_platt(p, a, b)
    skp = sk.predict_proba(z[:, None])[:, 1]
    np.testing.assert_allclose(cal, skp, atol=1e-6)
