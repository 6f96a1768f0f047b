"""Round-2 quality runs on the real TPU (synthetic phantoms).

1. VERDICT r1 weak #5 diagnostic: the unbiased 4-fold CV lagged its
   reference counterpart (0.918/0.851 vs 0.956/0.917) while the leaky 3-fold
   parity mode exceeded its. Hypothesis: phantom count/realism, not the
   framework. Controlled run: 4x the cases (16 x 40-slice 512^2 phantoms vs
   round 1's 4) at identical hyperparameters.
2. VERDICT item 6: chained production demo (lung model -> predicted boxes ->
   infection model, no GT) — record the dice delta vs GT boxes.

Writes artifacts_tpu/round2_quality.json.

Usage: python scripts/quality_r2.py [--cases 16] [--skip-chain] [--skip-cv]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=16)
    ap.add_argument("--skip-chain", action="store_true")
    ap.add_argument("--skip-cv", action="store_true")
    args = ap.parse_args()

    from onestop_tpu.runners import (
        four_fold_runner_unet_infection_segmentation, runner_production_chain)

    out = {}
    kw = dict(n_synthetic=args.cases, synth_hw=512, synth_slices=40, seed=7)

    if not args.skip_cv:
        t0 = time.time()
        res = four_fold_runner_unet_infection_segmentation(
            out_dir="artifacts_tpu/q2_cv4", **kw)
        out["cv4_fresh_16cases"] = {
            "mean_fold_dice": res.get("mean_fold_dice"),
            "mean_fold_iou": res.get("mean_fold_iou"),
            "per_fold_max_dice": res.get("per_fold_max_dice"),
            "mean_fold_precision": res.get("mean_fold_precision"),
            "mean_fold_recall": res.get("mean_fold_recall"),
            "train_seconds": res.get("train_seconds"),
            "seconds": round(time.time() - t0, 1),
        }
        print(json.dumps(out["cv4_fresh_16cases"]), flush=True)

    if not args.skip_chain:
        t0 = time.time()
        res = runner_production_chain(out_dir="artifacts_tpu/q2_chain", **kw)
        out["production_chain"] = {
            "dice_chained": res["dice_chained"],
            "dice_gt_boxes": res["dice_gt_boxes"],
            "dice_delta": res["dice_delta"],
            "lung_val_dice": res["lung_val_dice"],
            "infection_val_dice": res["infection_val_dice"],
            "n_eval_slices": res["n_eval_slices"],
            "seconds": round(time.time() - t0, 1),
        }
        print(json.dumps(out["production_chain"]), flush=True)

    os.makedirs("artifacts_tpu", exist_ok=True)
    path = "artifacts_tpu/round2_quality.json"
    prev = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
    prev.update(out)
    with open(path, "w") as f:
        json.dump(prev, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
