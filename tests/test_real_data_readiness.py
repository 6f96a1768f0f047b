"""Real-dataset readiness (VERDICT r2 missing #1, offline half): a full
20-case tree in the Kaggle ``covid19-ct-scans`` layout — metadata.csv rows
carrying the dataset's actual ``../input/covid19-ct-scans/...`` path
prefixes (which the reference strips by regex, ref holdout.py:136), the
real subdir names (``ct_scans`` plural vs the ``ct_scan`` CSV column), real
file names, and a mix of .nii / .nii.gz — driven through the native loader
into ALL seven runners. The day the real data lands, only the volumes
change."""

import numpy as np
import pytest

from onestop_tpu import runners as R
from onestop_tpu.data import save_nifti, synthetic_dataset
from onestop_tpu.data.acquire import load_metadata


@pytest.fixture(scope="module")
def kaggle_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kaggle") / "covid19-ct-scans"
    for sub in ("ct_scans", "lung_mask", "infection_mask"):
        (root / sub).mkdir(parents=True)
    # the real dataset's file names: 10 coronacases + 10 radiopaedia
    names = [f"coronacases_org_{i:03d}.nii" for i in range(1, 11)] + [
        f"radiopaedia_{i}_{85000 + i}_1.nii.gz" for i in range(10, 20)]
    rows = ["ct_scan,lung_mask,infection_mask"]
    cases = list(synthetic_dataset(n_cases=20, hw=96, n_slices=5, seed=7,
                                   infected_fraction=0.8))
    for case, name in zip(cases, names):
        save_nifti(root / "ct_scans" / name, case.ct.astype(np.float32))
        save_nifti(root / "lung_mask" / name, case.lung_mask.astype(np.uint8))
        save_nifti(root / "infection_mask" / name,
                   case.infection_mask.astype(np.uint8))
        rows.append(",".join(
            f"../input/covid19-ct-scans/{sub}/{name}"
            for sub in ("ct_scans", "lung_mask", "infection_mask")))
    (root / "metadata.csv").write_text("\n".join(rows) + "\n")
    return root


def test_metadata_resolves_kaggle_prefixes(kaggle_tree):
    rows = load_metadata(kaggle_tree)
    assert len(rows) == 20
    from pathlib import Path
    for row in rows:
        for col in ("ct_scan", "lung_mask", "infection_mask"):
            assert Path(row[col]).exists(), row[col]
    assert rows[0]["ct_scan"].endswith("ct_scans/coronacases_org_001.nii")
    assert rows[-1]["infection_mask"].endswith(".nii.gz")


@pytest.mark.slow
def test_all_seven_runners_on_kaggle_tree(kaggle_tree, tmp_path):
    """Every public entry point end-to-end against the 20-case tree through
    the native loader, sharing one ingestion cache."""
    cache = tmp_path / "cache"
    kw = dict(data_dir=kaggle_tree, small_run=True, cache_dir=cache,
              save_figures=False)

    res = R.holdout_runner_unet_infection_segmentation(
        out_dir=tmp_path / "three", cluster_analysis=False, **kw)
    assert 0 <= res["val_dice"] <= 1
    n_task1 = res["n_train"] + res["n_val"]
    assert n_task1 > 20          # 20 cases of kept slices

    res = R.three_fold_runner_unet_infection_segmentation(
        out_dir=tmp_path / "one", **kw)
    assert res["n_folds"] == 3 and np.isfinite(res["mean_fold_dice"])

    res = R.four_fold_runner_unet_infection_segmentation(
        out_dir=tmp_path / "two", **kw)
    assert res["n_folds"] == 4 and np.isfinite(res["mean_fold_dice"])

    res = R.holdout_runner_unetplusplus_infection_segmentation(
        out_dir=tmp_path / "four", **kw)
    assert 0 <= res["val_dice"] <= 1

    res = R.runner_classification(out_dir=tmp_path / "five", epochs=2, **kw)
    assert 0 <= res["auc"] <= 1
    # the label builder kept every windowed slice (positives + negatives)
    assert res["n_train"] + res["n_val"] >= n_task1

    res = R.runner_lung_segmentation(out_dir=tmp_path / "six", **kw)
    assert 0 <= res["val_dice"] <= 1

    res = R.runner_production_chain(out_dir=tmp_path / "seven", epochs=2, **kw)
    assert 0 <= res["dice_chained"] <= 1
    assert res["n_eval_slices"] > 0
