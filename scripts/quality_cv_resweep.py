"""Post-hoc extended-threshold resweep of saved CV fold checkpoints.

The CV runners sweep the reference's own fold grid — 0.30–0.80 step 0.05
(`SweepConfig.cv_grid`, ref task1_crossval_4folds_unet.py's np.arange) —
whose last point is 0.75. On the seed-13 replication bed EVERY fold's
best threshold railed at that edge (round4_cv_aug_seed13.json), so the
recorded mean-fold dice there are lower bounds, not optima. This script
reloads each saved fold checkpoint, re-predicts its validation split
(identical fold assignment: `kfold_indices`, seed 42), and sweeps an
extended grid, reporting both the extended optimum and the value the
reference window caps it to — quantifying exactly how much the published
grid under-reads each arm without touching any training artifact.

Usage (CPU is fine — pure inference):
  PYTHONPATH= JAX_PLATFORMS=cpu python scripts/quality_cv_resweep.py \
      --seed 13 --arms no_aug qat
Writes artifacts_tpu/round4_cv_resweep_seed{N}.json (merging per arm).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

BED = dict(n_synthetic=16, synth_hw=512, synth_slices=40)
REF_GRID_MAX = 0.75  # last point of the reference's 0.30-0.80/0.05 CV grid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=13, help="phantom-bed seed")
    ap.add_argument("--arms", nargs="*", default=["no_aug", "qat"],
                    help="subdirs of artifacts_tpu/r4_cv_aug_seed{N}/ "
                         "(or r4_cv_aug/ for the seed-7 bed)")
    ap.add_argument("--n-folds", type=int, default=4)
    ap.add_argument("--grid", nargs=3, type=float, default=(0.05, 1.0, 0.01),
                    metavar=("LO", "HI", "STEP"))
    ap.add_argument("--base", default=None,
                    help="checkpoint dir root (default "
                         "artifacts_tpu/r4_cv_aug{_seedN}; e.g. "
                         "artifacts_tpu/r5_cv3_aug for the round-5 3-fold "
                         "runs — pair with --n-folds 3)")
    ap.add_argument("--out-tag", default=None,
                    help="output filename tag (default round4_cv_resweep"
                         "{_seedN}; use e.g. round5_cv3_resweep)")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from onestop_tpu import config as C
    from onestop_tpu.data.splits import kfold_indices
    from onestop_tpu.metrics.segmentation import grid, threshold_sweep
    from onestop_tpu.runners import _build_unet, _seg_data
    from onestop_tpu.train.checkpoint import load_model_variables

    tag = "" if args.seed == 7 else f"_seed{args.seed}"
    cache = "artifacts_tpu/cache_r2" if args.seed == 7 \
        else f"artifacts_tpu/cache_cv_seed{args.seed}"
    base = args.base + tag if args.base else f"artifacts_tpu/r4_cv_aug{tag}"
    name = f"unet_covid_{args.n_folds}fold"

    task_cfg = C.task1_4fold() if args.n_folds == 4 else C.task1_3fold()
    x, y = _seg_data(None, None, task_cfg, cache, "task1",
                     dict(seed=args.seed, **BED))
    folds = kfold_indices(len(x), args.n_folds, task_cfg.split.seed)
    model = _build_unet(task_cfg)
    ths = grid(*args.grid)
    ref_mask = ths <= REF_GRID_MAX + 1e-6
    bs = task_cfg.sweep.eval_batch_size

    path = (f"artifacts_tpu/{args.out_tag}{tag}.json" if args.out_tag
            else f"artifacts_tpu/round4_cv_resweep{tag}.json")
    out = {"grid": [float(v) for v in args.grid]}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)

    for arm in args.arms:
        rows = []
        for f_i, (_, va_idx) in enumerate(folds):
            ckpt = f"{base}/{arm}/{name}_fold{f_i + 1}.msgpack"
            if not os.path.exists(ckpt):
                print(f"skip {arm}: missing {ckpt}")
                rows = None
                break
            variables = load_model_variables(model, ckpt, x.shape[1:3])
            probs = np.concatenate([
                np.asarray(model.apply(variables, jnp.asarray(x[va_idx[i:i + bs]]),
                                       train=False))
                for i in range(0, len(va_idx), bs)])
            res = threshold_sweep(y[va_idx], probs, ths, batch_size=bs)
            d = res["dice"]
            rows.append({
                "fold": f_i + 1,
                "ext_best_dice": float(d.max()),
                "ext_best_threshold": float(ths[int(d.argmax())]),
                "refgrid_best_dice": float(d[ref_mask].max()),
                "refgrid_best_threshold": float(ths[ref_mask][int(d[ref_mask].argmax())]),
            })
        if rows is None:
            continue
        out[arm] = {
            "per_fold": rows,
            "mean_fold_dice_extended": float(np.mean([r["ext_best_dice"] for r in rows])),
            "mean_fold_dice_refgrid": float(np.mean([r["refgrid_best_dice"] for r in rows])),
        }
        print(json.dumps({arm: out[arm]}))

    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
