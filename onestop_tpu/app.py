"""Text-menu CLI over the six runners — the reference's ``Scripts/app.py``
dispatcher (menu tokens 'one'…'six', ``app.py:7-57``), plus non-interactive
flags. Run: ``python -m onestop_tpu.app [token] [--data-dir D] [--out-dir O]
[--small-run]``."""

from __future__ import annotations

import argparse
import sys

from onestop_tpu.runners import RUNNERS

_MENU = """
Which task would you like to run?
  one   : Task1 — 3-fold CV U-Net infection segmentation
  two   : Task1 — 4-fold CV U-Net infection segmentation
  three : Task1 — holdout U-Net infection segmentation (full preprocessing)
  four  : Task1 — holdout U-Net++ infection segmentation
  five  : Task2 — COVID-19 slice classification CNN
  six   : Task3 — lung segmentation U-Net
  seven : Production chain — lung U-Net boxes -> infection U-Net (no GT;
          --classify adds the task2 classifier for the full one-stop chain)
"""


def main(argv=None):
    parser = argparse.ArgumentParser(description="onestop_tpu task runner")
    parser.add_argument("task", nargs="?", choices=sorted(RUNNERS),
                        help="menu token (prompts interactively if omitted)")
    parser.add_argument("--data-dir", default=None,
                        help="Kaggle covid19-ct-scans directory (synthetic data if omitted)")
    parser.add_argument("--out-dir", default="artifacts")
    parser.add_argument("--small-run", action="store_true",
                        help="tiny synthetic smoke configuration")
    parser.add_argument("--cache-dir", default=None,
                        help="preprocessed-array cache directory (the reference's "
                             "joblib pickle reload flow); second runs skip ingestion")
    parser.add_argument("--use-augmentation", default=None,
                        choices=("batch", "concat"),
                        help="train-time augmentation: per-batch on-device, or "
                             "materialize n_samples and concat (reference's "
                             "commented-out merge)")
    parser.add_argument("--epochs", type=int, default=None,
                        help="('seven' only) override the chain stages' epoch "
                             "budget — per-batch aug wants ~2x the reference "
                             "default (the bed-robust recipe: --use-augmentation "
                             "batch --epochs 160, RESULTS.md round-4 CV study)")
    parser.add_argument("--lung-dim", type=int, default=None,
                        help="('seven' only) train/serve the chain's stage-1 "
                             "lung U-Net at this resolution (e.g. 112 for "
                             "~4x fewer stage-1 FLOPs; boxes only need "
                             "lung-scale precision)")
    parser.add_argument("--cls-dim", type=int, default=None,
                        help="('five'/'seven') train+serve the classifier at "
                             "this input resolution (e.g. 112 — its lane-"
                             "bound convs make overhead scale with positions, "
                             "not FLOPs; see profile_cls_overhead)")
    parser.add_argument("--cls-head", default=None,
                        choices=("flatten", "gap"),
                        help="('five'/'seven') classifier head: 'flatten' "
                             "(reference topology, default) or 'gap' "
                             "(global-avg-pool transfer variant — "
                             "scripts/quality_cls_gap.py)")
    parser.add_argument("--classify", action="store_true",
                        help="('seven' only) also train the task2 classifier "
                             "and serve the full one-stop chain (lung seg + "
                             "infection seg + per-slice classification, one "
                             "jit, no GT)")
    parser.add_argument("--qat", action="store_true",
                        help="quantization-aware training: fake-quantize the "
                             "3x3 convs in every forward (train/qat.py) so "
                             "the checkpoint is robust to int8 serving — "
                             "int8 sensitivity is per-checkpoint")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args(argv)

    token = args.task
    while token not in RUNNERS:
        print(_MENU)
        token = input("Enter choice: ").strip().lower()
        if token in ("q", "quit", "exit"):
            return 0
        if token not in RUNNERS:
            print(f"Unknown choice {token!r} — expected one of {sorted(RUNNERS)}")

    runner = RUNNERS[token]
    print(f"Running {runner.__name__} ...")
    extra = {}
    if args.use_augmentation:
        extra["use_augmentation"] = args.use_augmentation
    if args.epochs is not None and token == "seven":
        extra["epochs"] = args.epochs
    if args.lung_dim is not None and token == "seven":
        extra["lung_dim"] = args.lung_dim
    if args.cls_dim is not None and token in ("five", "seven"):
        extra["cls_dim"] = args.cls_dim
    if args.cls_head is not None and token in ("five", "seven"):
        extra["cls_head"] = args.cls_head
    if args.classify and token == "seven":
        extra["classify"] = True
    if args.qat:
        extra["qat"] = True
    results = runner(data_dir=args.data_dir, out_dir=args.out_dir,
                     small_run=args.small_run, verbose=args.verbose,
                     cache_dir=args.cache_dir, **extra)
    keys = [k for k in ("val_dice", "best_dice", "best_iou", "best_threshold",
                        "mean_fold_dice", "mean_fold_iou", "auc", "train_seconds",
                        "dice_chained", "dice_gt_boxes", "cls_auc",
                        "cls_accuracy_at_0.5")
            if k in results]
    for k in keys:
        print(f"  {k}: {results[k]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
