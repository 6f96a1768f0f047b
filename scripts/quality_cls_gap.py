"""Classifier-head transfer probe: GAP vs the reference's Flatten head
(VERDICT r4 item 4).

Round-4 status (round4_cls_transfer.json): the reference-topology classifier
(task2:747-780, Flatten -> Dense 32) tops out at held-out pooled AUC 0.739
on the diversified 28-phantom bed with fully saturated sigmoids, and every
augmentation arm scores BELOW no-aug. That was documented as a
"data-diversity/architecture ceiling" — but only the reference's exact
flatten head was ever tried, so "ceiling" was not yet distinguished from
"flatten head memorizes per-position patterns" (fc0 alone holds ~1.6 M of
the 1.68 M params).

This study: the EXACT round-4 bed, split, and protocol (28 phantoms at 512²,
infected_fraction=0.75, infection_z_band=(0.25, 0.75), volume-level 22/6
split, matched Platt on 3 of the 6 held-out volumes), three arms:

  - flatten_noaug — same-session baseline twin of round-4's best arm (0.739)
  - gap_noaug     — ClassifierCNN(head='gap'): position-invariant head,
                    64->32 dense stack
  - gap_aug_batch — GAP + per-batch aug (flatten arms all lost to no-aug;
                    a smaller head may be the regime where aug finally helps)

Decision rule (VERDICT): held-out pooled AUC >= 0.9 promotes the GAP head as
the opt-in transfer recipe; below that, the head is EXCLUDED from the
ceiling explanation and the predicted-mask-area signal (AUC 0.928-0.945,
round4_cls_mask_auc.json, already productized in serve.VolumeReport) stays
the transferable per-slice classifier. Writes
artifacts_tpu/round5_cls_gap.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np

KW = dict(n_synthetic=28, synth_hw=512, synth_slices=40, seed=11,
          infected_fraction=0.75, infection_z_band=(0.25, 0.75))
N_HELDOUT = 6
N_CAL = 3


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=11,
                    help="phantom-bed seed (11 = the round-4/5 transfer bed;"
                         " any other runs a replication bed and writes a"
                         " _seed{N}-tagged artifact/out dir)")
    ap.add_argument("--arms", nargs="*",
                    default=["flatten_noaug", "gap_noaug", "gap_aug_batch"])
    args = ap.parse_args()
    KW["seed"] = args.seed
    tag = "" if args.seed == 11 else f"_seed{args.seed}"
    path = f"artifacts_tpu/round5_cls_gap{tag}.json"

    from onestop_tpu import config as C
    from onestop_tpu import runners as R
    from onestop_tpu.data.ingest import build_classification_dataset
    from onestop_tpu.metrics.classification import (
        apply_platt, expected_calibration_error, fit_platt, roc_auc)

    task2 = C.task2_classification()
    pre = task2.preprocess

    t0 = time.time()
    triples = list(R._case_slice_triples(None, pre, **KW))
    tr_triples = triples[:-N_HELDOUT]
    ho_triples = triples[-N_HELDOUT:]
    x_tr, y_tr = build_classification_dataset(tr_triples, pre)
    ho_sets = [build_classification_dataset([t], pre) for t in ho_triples]

    out = {
        "kw": {k: (list(v) if isinstance(v, tuple) else v) for k, v in KW.items()},
        "round4_flatten_baseline_heldout_auc": 0.739,
        "round4_mask_area_auc": 0.928,
        "n_train_volumes": len(tr_triples), "n_heldout_volumes": N_HELDOUT,
        "train_slices": int(len(x_tr)),
        "train_balance": [int((y_tr == 0).sum()), int((y_tr == 1).sum())],
        "dataset_build_seconds": time.time() - t0,
        "arms": {},
    }
    print(json.dumps({k: out[k] for k in ("train_slices", "train_balance")}),
          flush=True)

    arm_defs = {"flatten_noaug": (None, False), "gap_noaug": ("gap", False),
                "gap_aug_batch": ("gap", "batch")}
    for arm in args.arms:
        head, aug = arm_defs[arm]
        t1 = time.time()
        res = R.runner_classification(
            data=(x_tr, y_tr), out_dir=f"artifacts_tpu/r5_cls_gap{tag}/{arm}",
            use_augmentation=aug, save_figures=False, cls_head=head)
        state, trainer = res["state"], res["trainer"]

        probs_v, ys_v, per_vol = [], [], []
        for xv, yv in ho_sets:
            p = trainer.predict(state, xv).ravel()
            probs_v.append(p)
            ys_v.append(yv.astype(np.float32))
            per_vol.append(float(roc_auc(yv.astype(np.float32), p))
                           if len(np.unique(yv)) > 1 else None)
        p_all = np.concatenate(probs_v)
        y_all = np.concatenate(ys_v)
        p_cal = np.concatenate(probs_v[:N_CAL]); y_cal = np.concatenate(ys_v[:N_CAL])
        p_ev = np.concatenate(probs_v[N_CAL:]); y_ev = np.concatenate(ys_v[N_CAL:])
        a, b = fit_platt(y_cal, p_cal)
        arm_out = {
            "val_auc": res["auc"],
            "heldout_auc_pooled": float(roc_auc(y_all, p_all)),
            "heldout_auc_per_volume": per_vol,
            "heldout_prob_quantiles": np.quantile(
                p_all, [0.0, 0.25, 0.5, 0.75, 1.0]).round(4).tolist(),
            "platt_matched": {"a": float(a), "b": float(b)},
            "ece_eval_before": float(expected_calibration_error(y_ev, p_ev)),
            "ece_eval_after": float(expected_calibration_error(
                y_ev, np.asarray(apply_platt(p_ev, a, b)))),
            "train_seconds": res["train_seconds"],
            "arm_seconds": time.time() - t1,
        }
        out["arms"][arm] = arm_out
        print(json.dumps({arm: arm_out}), flush=True)
        os.makedirs("artifacts_tpu", exist_ok=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
