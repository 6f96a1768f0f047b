"""Does reference-faithful negative composition fix the classifier's
edge-slice saturation? (closure of the round-3 one-stop AUC diagnosis)

Round-3 diagnosis (round3_one_stop_cls_diag.json): the one-stop runner's
chain-served held-out AUC 0.295 was NOT a chain artifact — the crop frame
moves the probabilities by only 3e-4 — the classifier itself saturates
(probs 0.9964–0.9978 on every slice) on the clean EDGE slices of an unseen
infected volume, because its training negatives are dominated by slices of
wholly-clean phantom volumes (infected_fraction=0.5).

The reference's data law is the opposite: all 20 Kaggle volumes are
infected, and task2's 497 negatives are exactly their clean windowed slices
(ref task2_covid19_classifcation.py:413-418 — the label is per-slice mask
emptiness, not per-volume health). This study A/Bs exactly that:

  A (old composition)       infected_fraction=0.5 — negatives mostly from
                            clean volumes (the r3_one_stop law)
  B (reference composition) infected_fraction=1.0 +
                            infection_z_band=(0.30, 0.76) — every volume
                            infected, ~25% clean edge slices as negatives
                            (the Kaggle 497/2112 ≈ 24% law)

Both arms train the identical classifier/protocol (task2 config: stratified
70/30, balanced class weights, best-val-AUC snapshot) and are then evaluated
on the SAME held-out reference-composition volumes (GT-box crops). If the
diagnosis is right, B ranks the held-out clean edge slices correctly while
A saturates.

Writes artifacts_tpu/round3_cls_negatives.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import _timing  # noqa: F401,E402  (compile cache + tunnel-safe timing setup)

from onestop_tpu import config as C
from onestop_tpu import runners as R
from onestop_tpu.data.ingest import build_classification_dataset
from onestop_tpu.metrics.classification import roc_auc

BAND = (0.30, 0.76)
ARM_A = dict(n_synthetic=16, synth_hw=512, synth_slices=40, seed=7,
             infected_fraction=0.5)                      # r3_one_stop law
ARM_B = dict(n_synthetic=16, synth_hw=512, synth_slices=40, seed=11,
             infected_fraction=1.0, infection_z_band=BAND)
HELD = dict(n_synthetic=6, synth_hw=512, synth_slices=40, seed=99,
            infected_fraction=1.0, infection_z_band=BAND)


def main():
    smoke = "--smoke" in sys.argv  # tiny CPU shape check of the protocol
    if smoke:
        for kw in (ARM_A, ARM_B, HELD):
            kw.update(synth_hw=128, synth_slices=16)
            kw["n_synthetic"] = max(4, kw["n_synthetic"] // 4)
        pre = R._small(C.task2_classification(), epochs=2).preprocess
    else:
        pre = C.task2_classification().preprocess

    def build(kw):
        triples = list(R._case_slice_triples(None, pre, **kw))
        return build_classification_dataset(triples, pre)

    print("building arm datasets (512^2 ingest through the Pallas CLAHE)...")
    data = {name: build(kw) for name, kw in (("A", ARM_A), ("B", ARM_B))}
    for name, (x, y) in data.items():
        print(f"  arm {name}: {len(y)} slices, "
              f"{int((y == 0).sum())} neg / {int((y == 1).sum())} pos")

    held_triples = list(R._case_slice_triples(None, pre, **HELD))
    held_vols = [build_classification_dataset([t], pre) for t in held_triples]
    xh = np.concatenate([v[0] for v in held_vols])
    yh = np.concatenate([v[1] for v in held_vols])
    print(f"held-out: {len(held_vols)} volumes, {len(yh)} slices, "
          f"{int((yh == 0).sum())} neg / {int((yh == 1).sum())} pos")

    out = {"band": BAND, "arms": {}, "held_out": {
        "n_volumes": len(held_vols), "n_slices": int(len(yh)),
        "n_neg": int((yh == 0).sum()), "n_pos": int((yh == 1).sum())}}
    for name, (x, y) in data.items():
        res = R.runner_classification(
            data=(x, y), out_dir=f"artifacts_tpu/r3_cls_neg{name}",
            save_figures=(name == "B") and not smoke, small_run=smoke)
        probs = np.asarray(
            res["trainer"].predict(res["state"], xh)).ravel()
        per_vol = []
        for (xv, yv) in held_vols:
            if 0 < yv.sum() < len(yv):  # AUC needs both classes
                pv = np.asarray(
                    res["trainer"].predict(res["state"], xv)).ravel()
                per_vol.append(float(roc_auc(yv, pv)))
        # does the val-fitted Platt calibration TRANSFER? (AUC is invariant
        # under the monotone map — this measures probability quality only)
        from onestop_tpu.metrics.classification import (
            apply_platt, expected_calibration_error)

        a_cal, b_cal = (res["calibration"]["platt_a"],
                        res["calibration"]["platt_b"])
        probs_cal = apply_platt(probs, a_cal, b_cal)
        out["arms"][name] = {
            "train_law": {k: v for k, v in
                          (ARM_A if name == "A" else ARM_B).items()},
            "n_train_neg": int((y == 0).sum()),
            "n_train_pos": int((y == 1).sum()),
            "val_auc_in_distribution": res["auc"],
            "held_out_auc_pooled": float(roc_auc(yh, probs)),
            "held_out_auc_per_volume": per_vol,
            "held_out_mean_prob_neg": float(probs[yh == 0].mean()),
            "held_out_mean_prob_pos": float(probs[yh == 1].mean()),
            "held_out_min_prob": float(probs.min()),
            "platt_from_val": [a_cal, b_cal],
            "held_out_ece_raw": expected_calibration_error(yh, probs),
            "held_out_ece_val_platt": expected_calibration_error(yh, probs_cal),
            "held_out_acc_0.5_raw": float(((probs > 0.5) == (yh > 0.5)).mean()),
            "held_out_acc_0.5_val_platt": float(
                ((probs_cal > 0.5) == (yh > 0.5)).mean()),
        }
        a = out["arms"][name]
        print(f"arm {name}: val AUC {a['val_auc_in_distribution']:.4f} | "
              f"held-out pooled AUC {a['held_out_auc_pooled']:.4f} | "
              f"neg-prob {a['held_out_mean_prob_neg']:.4f} vs "
              f"pos-prob {a['held_out_mean_prob_pos']:.4f}")

    os.makedirs("artifacts_tpu", exist_ok=True)
    with open("artifacts_tpu/round3_cls_negatives.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts_tpu/round3_cls_negatives.json")


if __name__ == "__main__":
    main()
