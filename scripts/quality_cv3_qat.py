"""Fresh-init 3-fold CV: the last published reference quality row, honestly.

The reference's 3-fold U-Net CV publishes mean-fold dice 0.948 / IoU 0.903
(README.md:117; task1_crossval_3folds_unet.py) — numbers that embed its
cross-fold weight leak (SURVEY.md §8 Q5: one model object reused across
folds, so folds 2-3 train from fold 1's weights and overlap its val data).
Our parity mode brackets that at 0.936 (round-2, `sequential_reference`).
What has never been recorded is the HONEST fresh-init 3-fold number with
the round-4 recipe (QAT-as-regularizer, round4_cv_aug.json: 4-fold 0.9720
at the 80-epoch budget, 0.9789 at 160).

Same 16-phantom bed and law as the 4-fold study (n_synthetic=16,
synth_hw=512, synth_slices=40, seed=7; reference hyperparameters,
fold_epochs=(3,2,2)-split 80-epoch budget), two arms:

  - no_aug — fresh-init 3-fold baseline (never measured; the round-2 3-fold
             ran only in leak-parity mode)
  - qat    — fake-quant 3x3 convs (the 4-fold winning ingredient)

Writes artifacts_tpu/round4_cv3_qat.json. Pass --arms to subset.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

KW = dict(n_synthetic=16, synth_hw=512, synth_slices=40, seed=7)
ARMS = {"no_aug": False, "qat": True}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", nargs="*", default=list(ARMS),
                    choices=list(ARMS))
    args = ap.parse_args()

    from onestop_tpu.runners import three_fold_runner_unet_infection_segmentation

    path = "artifacts_tpu/round4_cv3_qat.json"
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)

    for arm in args.arms:
        t0 = time.time()
        res = three_fold_runner_unet_infection_segmentation(
            out_dir=f"artifacts_tpu/r4_cv3/{arm}", qat=ARMS[arm],
            cache_dir="artifacts_tpu/cache_r2", save_figures=False, **KW)
        out[arm] = {
            "mean_fold_dice": res.get("mean_fold_dice"),
            "mean_fold_iou": res.get("mean_fold_iou"),
            "per_fold_max_dice": res.get("per_fold_max_dice"),
            "mean_fold_precision": res.get("mean_fold_precision"),
            "mean_fold_recall": res.get("mean_fold_recall"),
            "best_thresholds_dice": res.get("best_thresholds_dice"),
            "train_seconds": res.get("train_seconds"),
            "seconds": round(time.time() - t0, 1),
        }
        print(json.dumps({arm: out[arm]}), flush=True)
        os.makedirs("artifacts_tpu", exist_ok=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
