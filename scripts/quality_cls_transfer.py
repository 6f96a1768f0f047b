"""Full-scale classifier transfer study (VERDICT r3 item 5).

Round-3 diagnosis chain (round3_one_stop_cls_diag.json,
round3_cls_negatives.json): the task2 classifier trained on the standard
phantom bed saturates (~0.997 for every slice) on UNSEEN volumes, making
held-out AUC noise — its training negatives were dominated by wholly-clean
volumes, and at small scale (4 volumes, 128²) neither negative recomposition
nor anything else transferred. The conclusion was "closing transfer needs
data diversity" — this study runs the full-scale version of that experiment:

- **volume-level split** (the transfer metric the chain actually needs):
  22 train volumes / 6 held-out volumes never seen in any form;
- **diversified composition**: 28 phantoms at 512², infected_fraction=0.75
  with infection_z_band=(0.25, 0.75), so negatives include BOTH whole-clean
  volumes and clean edge slices of infected volumes (the reference dataset's
  actual negative composition — its 497 negatives are clean windowed slices
  of infected volumes, ref task2:413-418);
- **augmentation A/B/C**: off / 'batch' (on-device per-batch image aug) /
  'concat' (the reference's commented-out merge, with the task2
  correspondence bug fixed — labels carried by index);
- **distribution-matched Platt calibration**: constants fitted on 3 of the
  held-out volumes' labeled slices, evaluated (AUC unchanged; ECE) on the
  other 3 — the serving recipe for `serve_volumes(cls_calibration=(a,b))`.

Writes artifacts_tpu/round4_cls_transfer.json.
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
N_CAL = 3  # held-out volumes used to fit Platt (matched distribution)


def main():
    from onestop_tpu import config as C
    from onestop_tpu import runners as R
    from onestop_tpu.data.ingest import build_classification_dataset
    from onestop_tpu.metrics.classification import (
        apply_platt, expected_calibration_error, fit_platt, roc_auc)

    import dataclasses

    task2 = C.task2_classification()
    pre = task2.preprocess
    pre112 = dataclasses.replace(pre, new_dim=112)

    t0 = time.time()
    triples = list(R._case_slice_triples(None, pre, **KW))
    tr_triples = triples[:-N_HELDOUT]
    ho_triples = triples[-N_HELDOUT:]

    x_tr, y_tr = build_classification_dataset(tr_triples, pre)
    # held-out volumes kept separate so per-volume AUC and the cal/eval
    # split stay at volume granularity
    ho_sets = [build_classification_dataset([t], pre) for t in ho_triples]
    # the 112² serving-preset classifier (profile_cls_overhead.py) trains on
    # the same crops at its own resolution
    x_tr112, y_tr112 = build_classification_dataset(tr_triples, pre112)
    ho_sets112 = [build_classification_dataset([t], pre112) for t in ho_triples]
    build_s = time.time() - t0

    out = {
        "kw": {k: (list(v) if isinstance(v, tuple) else v) for k, v in KW.items()},
        "n_train_volumes": len(tr_triples), "n_heldout_volumes": N_HELDOUT,
        "train_slices": int(len(x_tr)),
        "train_balance": [int((y_tr == 0).sum()), int((y_tr == 1).sum())],
        "heldout_balance": [int(sum((y == 0).sum() for _, y in ho_sets)),
                            int(sum((y == 1).sum() for _, y in ho_sets))],
        "dataset_build_seconds": build_s,
        "arms": {},
    }
    print(json.dumps({k: out[k] for k in
                      ("train_slices", "train_balance", "heldout_balance")}),
          flush=True)

    for arm, aug, dim in (("no_aug", False, None), ("aug_batch", "batch", None),
                          ("aug_concat", "concat", None),
                          ("aug_batch_112", "batch", 112)):
        t1 = time.time()
        res = R.runner_classification(
            data=(x_tr, y_tr) if dim is None else (x_tr112, y_tr112),
            out_dir=f"artifacts_tpu/r4_cls_transfer/{arm}",
            use_augmentation=aug, save_figures=(arm == "aug_batch"),
            cls_dim=dim)
        state, trainer = res["state"], res["trainer"]

        probs_v, ys_v, per_vol = [], [], []
        for xv, yv in (ho_sets if dim is None else ho_sets112):
            p = trainer.predict(state, xv).ravel()
            probs_v.append(p)
            ys_v.append(yv.astype(np.float32))
            per_vol.append(float(roc_auc(yv.astype(np.float32), p))
                           if len(np.unique(yv)) > 1 else None)
        p_all = np.concatenate(probs_v)
        y_all = np.concatenate(ys_v)

        # matched-data Platt: fit on the first N_CAL held-out volumes,
        # evaluate ECE on the remaining ones
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
            "acc_eval_calibrated_0.5": float(
                ((np.asarray(apply_platt(p_ev, a, b)) > 0.5) == (y_ev > 0.5)).mean()),
            "train_seconds": res["train_seconds"],
            "arm_seconds": time.time() - t1,
        }
        out["arms"][arm] = arm_out
        print(json.dumps({arm: arm_out}), flush=True)

    os.makedirs("artifacts_tpu", exist_ok=True)
    with open("artifacts_tpu/round4_cls_transfer.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts_tpu/round4_cls_transfer.json")


if __name__ == "__main__":
    main()
