"""Fresh-init 4-fold CV augmentation A/B (VERDICT r3 item 3).

The honest (fresh-init) 4-fold mean-fold dice sits at 0.913 on the 16-case
phantom bed (round2_quality.json, `q2_cv4`) vs the ≥0.95 north-star — the
reference's published 0.956 embeds its cross-fold weight leak (SURVEY.md §8
Q5; our `sequential_reference` parity mode brackets it at 0.963). The
framework ships train-usable augmentation precisely to beat that number
fairly, but no CV quality run with augmentation on was ever recorded.

Same bed and law as the round-2 study (n_synthetic=16, synth_hw=512,
synth_slices=40, seed=7; fresh init per fold, reference hyperparameters),
three arms:

  - no_aug      — reproduces the 0.913 baseline (re-run for A/B fairness
                  against XLA autotune variance and code drift)
  - aug_batch   — every training batch through the on-device joint
                  flip/affine warp (per-fold keys)
  - aug_concat  — per-fold materialized merge, n_samples per fold appended
                  to that fold's train rows only (no leakage into any val)

Writes artifacts_tpu/round4_cv_aug.json. Pass --arms to subset.
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
# aug arms (VERDICT item 3) + QAT arms: the round-4 holdout A/B measured
# fake-quant training as a strong regularizer on this bed (infection val
# 0.8772 -> 0.9697, round4_qat{,_twin}.json) — if that transfers to CV it
# may clear the >=0.95 bar on its own or compound with augmentation
ARMS = {"no_aug": (False, False, None), "aug_batch": ("batch", False, None),
        "aug_concat": ("concat", False, None), "qat": (False, True, None),
        "aug_batch_qat": ("batch", True, None),
        # per-batch aug makes every epoch a fresh draw — the reference's
        # 80-epoch budget under-trains it (first pass: fold variance
        # 0.737-0.978); double the budget for the aug arm
        "aug_batch_160": ("batch", False, (160, 160, 160, 160)),
        "qat_160": (False, True, (160, 160, 160, 160)),
        # plain 160-epoch baseline: needed on replication beds (seed 13)
        # where the 80-epoch QAT arm LOST to no_aug — distinguishes "QAT
        # hurts here" from "everything is undertrained here"
        "no_aug_160": (False, False, (160, 160, 160, 160)),
        # deployment recipe candidate: aug is the bed-robust quality
        # ingredient (0.978 on both beds @160) and QAT is what makes the
        # promoted int8 serving path safe (lottery removal) — a deployed
        # int8 model wants BOTH, and their interaction at 160 epochs is
        # unmeasured (at 80 they were non-additive)
        "aug_batch_qat_160": ("batch", True, (160, 160, 160, 160))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", nargs="*", default=list(ARMS),
                    choices=list(ARMS))
    ap.add_argument("--seed", type=int, default=None,
                    help="override the phantom-bed seed (default 7); results "
                         "go to round4_cv_aug_seed{N}.json with fresh caches "
                         "so a replication can't silently reuse seed-7 data")
    args = ap.parse_args()
    kw, path_tag, cache = dict(KW), "", "artifacts_tpu/cache_r2"
    if args.seed is not None and args.seed != KW["seed"]:
        kw["seed"] = args.seed
        path_tag = f"_seed{args.seed}"
        cache = f"artifacts_tpu/cache_cv_seed{args.seed}"

    from onestop_tpu.runners import four_fold_runner_unet_infection_segmentation

    path = f"artifacts_tpu/round4_cv_aug{path_tag}.json"
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)

    for arm in args.arms:
        t0 = time.time()
        aug, qat, fe = ARMS[arm]
        res = four_fold_runner_unet_infection_segmentation(
            out_dir=f"artifacts_tpu/r4_cv_aug{path_tag}/{arm}",
            use_augmentation=aug, qat=qat, fold_epochs=fe,
            cache_dir=cache,
            save_figures=False, **kw)
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
