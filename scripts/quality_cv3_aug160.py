"""Beat the reference's 3-fold row HONESTLY (VERDICT r4 item 3).

The reference's last published quality row is 3-fold mean-fold dice 0.948
(README.md:117, task1_crossval_3folds_unet.py:1005-1046) — a number that
needs its cross-fold weight leak: fresh init at its own (80,20,20) budget
collapses to 0.556-0.578 (round4_cv3_qat.json — the 20-epoch folds are
untrainable from scratch), and leak-parity mode brackets the row at 0.936.
The bed-robust recipe (per-batch aug at 2x the reference budget) scored
0.9780/0.9773 fresh-init on the 4-fold law on BOTH phantom beds
(round4_cv_aug*.json) but was never run through the 3-fold runner — so the
framework beats the 4-fold row honestly but has no honest 3-fold number.

Same 16-phantom bed and law as the 4-fold study (fresh init per fold,
reference hyperparameters, sklearn KFold seed 42), EQUAL 160-epoch folds
(the honest budget: the reference's (80,20,20) only makes sense with the
carry-over), arms:

  - aug_batch_160     — the bed-robust quality recipe
  - aug_batch_qat_160 — the deployment recipe (+ int8-lottery removal)

Run with --seed 13 for the replication bed. Writes
artifacts_tpu/round5_cv3_aug{_seedN}.json.
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
ARMS = {"aug_batch_160": ("batch", False, (160, 160, 160)),
        "aug_batch_qat_160": ("batch", True, (160, 160, 160))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", nargs="*", default=list(ARMS),
                    choices=list(ARMS))
    ap.add_argument("--seed", type=int, default=None,
                    help="phantom-bed seed override (default 7); results go "
                         "to round5_cv3_aug_seed{N}.json with fresh caches")
    args = ap.parse_args()
    kw, path_tag, cache = dict(KW), "", "artifacts_tpu/cache_r2"
    if args.seed is not None and args.seed != KW["seed"]:
        kw["seed"] = args.seed
        path_tag = f"_seed{args.seed}"
        cache = f"artifacts_tpu/cache_cv_seed{args.seed}"

    from onestop_tpu.runners import three_fold_runner_unet_infection_segmentation

    path = f"artifacts_tpu/round5_cv3_aug{path_tag}.json"
    out = {"reference_published_3fold_dice": 0.948,
           "leak_parity_3fold_dice": 0.936}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)

    for arm in args.arms:
        t0 = time.time()
        aug, qat, fe = ARMS[arm]
        res = three_fold_runner_unet_infection_segmentation(
            out_dir=f"artifacts_tpu/r5_cv3_aug{path_tag}/{arm}",
            use_augmentation=aug, qat=qat, fold_epochs=fe,
            cache_dir=cache, save_figures=False, **kw)
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
