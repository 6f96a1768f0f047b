"""Smoke tests: all six public runners end-to-end on tiny synthetic data
(SURVEY.md §9 capability contract)."""

import numpy as np
import pytest

from onestop_tpu import runners as R

_KW = dict(small_run=True, n_synthetic=2, synth_hw=128, synth_slices=10)


@pytest.mark.slow
def test_holdout_unet(tmp_path):
    res = R.holdout_runner_unet_infection_segmentation(out_dir=tmp_path, **_KW)
    assert 0 <= res["val_dice"] <= 1
    assert 0.1 <= res["best_threshold"] < 0.8
    assert (tmp_path / "unet_covid_holdout_report.json").exists()
    # the reference emits figures at every stage (L9); runners must too
    for fig in ("unet_covid_holdout_training_curves.png",
                "unet_covid_holdout_lr_schedule.png",
                "unet_covid_holdout_sweep.png",
                "unet_covid_holdout_actual_vs_predicted_0.png",
                "unet_covid_holdout_actual_vs_predicted_max.png",
                "unet_covid_holdout_sample_overlay.png",
                "clahe_demo.png", "cropper_demo.png"):
        assert (tmp_path / fig).exists(), fig


@pytest.mark.slow
def test_three_fold(tmp_path):
    res = R.three_fold_runner_unet_infection_segmentation(out_dir=tmp_path, **_KW)
    assert res["n_folds"] == 3
    assert len(res["per_fold_max_dice"]) == 3
    assert 0 <= res["mean_fold_dice"] <= 1
    assert len(res["folds"]) == 3
    for fig in ("unet_covid_3fold_training_curves.png",
                "unet_covid_3fold_sweep_by_fold.png",
                "unet_covid_3fold_fold_compare.png"):
        assert (tmp_path / fig).exists(), fig


@pytest.mark.slow
def test_four_fold(tmp_path):
    res = R.four_fold_runner_unet_infection_segmentation(out_dir=tmp_path, **_KW)
    assert res["n_folds"] == 4
    assert 0 <= res["mean_fold_iou"] <= 1


@pytest.mark.slow
def test_three_fold_sequential_reference_mode(tmp_path):
    """Weight-carrying sequential CV (reference-parity, SURVEY.md §8 Q5)."""
    res = R.three_fold_runner_unet_infection_segmentation(
        out_dir=tmp_path, cv_mode="sequential_reference", **_KW)
    assert res["n_folds"] == 3
    assert 0 <= res["mean_fold_dice"] <= 1


@pytest.mark.slow
def test_unetpp(tmp_path):
    res = R.holdout_runner_unetplusplus_infection_segmentation(out_dir=tmp_path, **_KW)
    assert 0 <= res["val_dice"] <= 1


def test_classification(tmp_path):
    res = R.runner_classification(out_dir=tmp_path, **_KW)
    assert 0 <= res["auc"] <= 1
    assert 0.5 in res["report"] and 0.81 in res["report"]
    for k in ("accuracy", "precision", "recall", "f1", "confusion"):
        assert k in res["report"][0.5]
    cal = res["calibration"]
    assert cal["temperature"] > 0 and "platt_a" in cal
    assert 0 <= cal["ece_calibrated"] <= 1
    for fig in ("classifier_training_curves.png", "classifier_roc.png",
                "classifier_confusion_0.50.png", "classifier_confusion_0.81.png",
                "classifier_prob_dist.png", "classifier_reliability.png"):
        assert (tmp_path / fig).exists(), fig


@pytest.mark.slow
def test_lung_segmentation(tmp_path):
    res = R.runner_lung_segmentation(out_dir=tmp_path, **_KW)
    assert 0 <= res["val_dice"] <= 1
    assert res["checkpoint"].endswith(".msgpack")
    assert (tmp_path / "unet_lung_segmentation_training_curves.png").exists()
    # figures are optional per run
    res2 = R.runner_lung_segmentation(out_dir=tmp_path / "nofig",
                                      save_figures=False, **_KW)
    assert not list((tmp_path / "nofig").glob("*.png"))


def test_runner_from_data_dir(tmp_path):
    """Kaggle-layout data_dir path: metadata.csv + .nii.gz volumes through
    the (native if built) loader into a full runner."""
    import numpy as np
    from onestop_tpu.data import save_nifti, synthetic_case

    ddir = tmp_path / "dataset"
    for sub in ("ct_scan", "lung_mask", "infection_mask"):
        (ddir / sub).mkdir(parents=True)
    rows = ["ct_scan,lung_mask,infection_mask"]
    for i in range(2):
        case = synthetic_case(seed=i, hw=128, n_slices=8)
        save_nifti(ddir / "ct_scan" / f"c{i}.nii.gz", case.ct.astype(np.float32))
        save_nifti(ddir / "lung_mask" / f"c{i}.nii.gz", case.lung_mask.astype(np.uint8))
        save_nifti(ddir / "infection_mask" / f"c{i}.nii.gz",
                   case.infection_mask.astype(np.uint8))
        rows.append(f"ct_scan/c{i}.nii.gz,lung_mask/c{i}.nii.gz,infection_mask/c{i}.nii.gz")
    (ddir / "metadata.csv").write_text("\n".join(rows) + "\n")

    res = R.runner_lung_segmentation(data_dir=ddir, out_dir=tmp_path / "art",
                                     small_run=True)
    assert 0 <= res["val_dice"] <= 1


def test_cli_dispatch(tmp_path, monkeypatch, capsys):
    from onestop_tpu import app
    rc = app.main(["six", "--small-run", "--out-dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "runner_lung_segmentation" in out


@pytest.mark.slow
def test_production_chain_runner(tmp_path):
    """Menu 'seven': the chained no-GT pipeline trains both stages and
    reports the predicted-vs-GT-box dice delta. Trains with the bed-robust
    recipe's knobs (per-batch aug + explicit epoch budget) to cover their
    plumb-through into both chain stages."""
    res = R.runner_production_chain(out_dir=tmp_path, small_run=True,
                                    use_augmentation="batch", epochs=2,
                                    n_synthetic=3, synth_hw=128, synth_slices=10)
    assert 0 <= res["dice_chained"] <= 1
    assert 0 <= res["dice_gt_boxes"] <= 1
    assert res["n_eval_slices"] > 0
    assert (tmp_path / "production_chain_report.json").exists()
    assert (tmp_path / "production_chain_gallery.png").exists()


@pytest.mark.slow
def test_production_chain_runner_one_stop_classify(tmp_path, monkeypatch):
    """Menu 'seven' --classify: the full one-stop chain (lung seg +
    infection seg + classification) trains all three models and reports the
    chain's classification quality on the held-out case."""
    seen = {}
    orig_cls = R.runner_classification

    def spy(*a, **k):
        seen.update(k)
        return orig_cls(*a, **k)

    monkeypatch.setattr(R, "runner_classification", spy)
    res = R.runner_production_chain(out_dir=tmp_path, small_run=True,
                                    classify=True, cls_dim=32, n_synthetic=3,
                                    use_augmentation="batch",
                                    synth_hw=128, synth_slices=10)
    # the chain's aug flag must reach the classifier stage too (the GAP
    # transfer recipe is aug-dependent, round5_cls_gap.json)
    assert seen.get("use_augmentation") == "batch"
    assert 0 <= res["dice_chained"] <= 1
    assert 0 <= res["cls_accuracy_at_0.5"] <= 1
    assert res["classifier"] is not None
    # regression (VERDICT r4 weak #6): --cls-dim must NOT be silently
    # dropped under small_run — the classifier trains AND serves at cls_dim
    # (the Flatten head pins the input size: fc0's fan-in is
    # (cls_dim/8)^2 * widths[-1], here (32/8)^2 * 16)
    fc0 = res["classifier"]["state"].params["fc0"]["kernel"]
    assert fc0.shape[0] == (32 // 8) ** 2 * 16
    # plain (non-QAT) chain runs carry the per-checkpoint int8 gate note
    assert "lottery" in res.get("int8_serving_note", "")
    assert 0 <= res["cls_val_auc"] <= 1
    a, b = res["cls_calibration"]          # serve --cls-calibration A B
    assert np.isfinite(a) and np.isfinite(b)
    # the classifier rode the chain without perturbing segmentation (the
    # runner asserts mask equality internally); its own report also exists
    assert (tmp_path / "production_chain_report.json").exists()
    assert (tmp_path / "classification_report.json").exists()
