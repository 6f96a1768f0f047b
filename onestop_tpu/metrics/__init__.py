"""On-device evaluation metrics: single-pass multi-threshold segmentation
sweeps (replacing the reference's recompile-and-evaluate loops,
``holdout.py:1196-1343``) and classification ROC/report metrics."""

from onestop_tpu.metrics.segmentation import threshold_sweep, sweep_report
from onestop_tpu.metrics.classification import (
    roc_auc,
    roc_curve_points,
    confusion_at_threshold,
    classification_report,
    fit_temperature,
    apply_temperature,
    fit_platt,
    apply_platt,
    expected_calibration_error,
)

__all__ = [
    "threshold_sweep",
    "sweep_report",
    "roc_auc",
    "roc_curve_points",
    "confusion_at_threshold",
    "classification_report",
    "fit_temperature",
    "apply_temperature",
    "fit_platt",
    "apply_platt",
    "expected_calibration_error",
]
