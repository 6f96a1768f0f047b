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
    viz.plot_probability_distribution((rng.random(100) > 0.5).astype(float),
                                      rng.random(100), 0.81,
                                      path=tmp_path / "dist.png")
    for f in ("sample", "curves", "cmp", "folds", "roc", "lr", "dist"):
        assert (tmp_path / f"{f}.png").stat().st_size > 1000
