"""Smoke tests: all six public runners end-to-end on tiny synthetic data
(SURVEY.md §9 capability contract)."""

import numpy as np
import pytest

from onestop_tpu import runners as R

_KW = dict(small_run=True, n_synthetic=2, synth_hw=128, synth_slices=10)


def test_holdout_unet(tmp_path):
    res = R.holdout_runner_unet_infection_segmentation(out_dir=tmp_path, **_KW)
    assert 0 <= res["val_dice"] <= 1
    assert 0.1 <= res["best_threshold"] < 0.8
    assert (tmp_path / "unet_covid_holdout_report.json").exists()


def test_three_fold(tmp_path):
    res = R.three_fold_runner_unet_infection_segmentation(out_dir=tmp_path, **_KW)
    assert res["n_folds"] == 3
    assert len(res["per_fold_max_dice"]) == 3
    assert 0 <= res["mean_fold_dice"] <= 1
    assert len(res["folds"]) == 3


def test_four_fold(tmp_path):
    res = R.four_fold_runner_unet_infection_segmentation(out_dir=tmp_path, **_KW)
    assert res["n_folds"] == 4
    assert 0 <= res["mean_fold_iou"] <= 1


def test_unetpp(tmp_path):
    res = R.holdout_runner_unetplusplus_infection_segmentation(out_dir=tmp_path, **_KW)
    assert 0 <= res["val_dice"] <= 1


def test_classification(tmp_path):
    res = R.runner_classification(out_dir=tmp_path, **_KW)
    assert 0 <= res["auc"] <= 1
    assert 0.5 in res["report"] and 0.81 in res["report"]
    for k in ("accuracy", "precision", "recall", "f1", "confusion"):
        assert k in res["report"][0.5]


def test_lung_segmentation(tmp_path):
    res = R.runner_lung_segmentation(out_dir=tmp_path, **_KW)
    assert 0 <= res["val_dice"] <= 1
    assert res["checkpoint"].endswith(".msgpack")


def test_cli_dispatch(tmp_path, monkeypatch, capsys):
    from onestop_tpu import app
    rc = app.main(["six", "--small-run", "--out-dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "runner_lung_segmentation" in out
