"""Visualization suite smoke tests (figures render and save headless)."""

import numpy as np

from onestop_tpu.analysis import viz


def test_all_figures_render(tmp_path, rng):
    ct = rng.random((64, 64, 1))
    mask = (rng.random((64, 64, 1)) > 0.7).astype(float)
    viz.plot_sample(ct, mask, tmp_path / "sample.png")
    viz.plot_training_curves(
        {"loss": [1, 0.5], "val_loss": [1.1, 0.6],
         "metric": [0.2, 0.7], "val_metric": [0.15, 0.6]},
        tmp_path / "curves.png")
    viz.compare_actual_and_predicted(ct, mask, rng.random((64, 64, 1)),
                                     path=tmp_path / "cmp.png")
    viz.compare_fold_predictions(ct, mask, [rng.random((64, 64, 1))] * 3,
                                 path=tmp_path / "folds.png")
    viz.plot_roc(np.linspace(0, 1, 11), np.sqrt(np.linspace(0, 1, 11)), 0.9,
                 tmp_path / "roc.png")
    viz.plot_lr_schedule([1e-3, 5e-4, 1e-4], path=tmp_path / "lr.png")
    viz.plot_schedule_zoo(path=tmp_path / "lr_zoo.png")
    viz.plot_probability_distribution((rng.random(100) > 0.5).astype(float),
                                      rng.random(100), 0.81,
                                      path=tmp_path / "dist.png")
    for f in ("sample", "curves", "cmp", "folds", "roc", "lr", "dist"):
        assert (tmp_path / f"{f}.png").stat().st_size > 1000


def test_demo_panels_render(tmp_path, rng):
    """CLAHE before/after, cropper panel, confusion-matrix plot (the three
    VERDICT r1 viz gaps — ref holdout.py:171-194, :249-273, task2:926-989)."""
    import cv2

    ct = rng.random((128, 128))
    viz.plot_clahe_demo(ct, path=tmp_path / "clahe_demo.png")

    mask = np.zeros((128, 128), np.uint8)
    cv2.ellipse(mask, (40, 64), (20, 38), 0, 0, 360, 1, -1)
    cv2.ellipse(mask, (88, 64), (18, 36), 0, 0, 360, 1, -1)
    viz.plot_cropper_demo(mask.astype(np.float64), path=tmp_path / "cropper_demo.png")

    viz.plot_confusion_matrix((580, 20, 3, 31), threshold=0.81,
                              path=tmp_path / "cm.png")
    for f in ("clahe_demo", "cropper_demo", "cm"):
        assert (tmp_path / f"{f}.png").stat().st_size > 1000


def test_plot_production_chain(tmp_path, rng):
    raw = rng.integers(0, 256, (128, 128), dtype=np.uint8)
    lung = rng.random((64, 64)) > 0.5
    inf = rng.random((64, 64)) > 0.8
    viz.plot_production_chain(raw, lung, np.array([20.0, 30.0, 35.0, 60.0]),
                              np.array([70.0, 28.0, 40.0, 64.0]), inf,
                              path=tmp_path / "chain.png")
    assert (tmp_path / "chain.png").exists()
