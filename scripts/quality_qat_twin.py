"""Contemporaneous PLAIN twin of scripts/quality_qat.py (round 4).

The round-4 QAT run scored infection val dice 0.9697 vs the round-3 plain
ld112 study's 0.8772 under nominally the same law — too large a gap to
attribute to QAT regularization, so the cross-ROUND "0.914 int8 twin"
comparison is confounded (phantom/law drift between rounds). This re-runs
the identical ld112 training law with qat=False TODAY and evaluates the
same arms, giving a clean same-code lottery comparison:
QAT(bf16/int8) vs plain(bf16/int8) on one bed.

This study re-runs the EXACT ld112 training law (quality_chain_lowres.py:
n_synthetic=16, synth_hw=512, synth_slices=40, seed=7, lung_dim=112) with
``qat=False``, then evaluates the same held-out case (triples[-1]) on the
same all-int8 fast112 serving arm (112² lung + refined boxes + both U-Nets
s8×s8→s32, calibrated on real stage inputs) and on the bf16 chain:

  - dice_bf16     — the PLAIN (qat=False) checkpoint served bf16
  - dice_int8     — the PLAIN checkpoint served all-int8 (if it loses
                    dice here while round4_qat.json's QAT checkpoint does
                    not, the lottery is real and QAT closes it)
  - int8-vs-bf16 delta — the gate is |delta| < 0.005 (the int8 promotion
                    criterion of scripts/quality_int8.py)

Writes artifacts_tpu/round4_qat_twin.json.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

KW = dict(n_synthetic=16, synth_hw=512, synth_slices=40, seed=7)


def _dice(pred, tgt):
    p = np.asarray(pred[..., 0], np.float64)
    t = np.asarray(tgt, np.float64)
    return float((2 * (p * t).sum() + 1.0) / (p.sum() + t.sum() + 1.0))


def main():
    from onestop_tpu import config as C
    from onestop_tpu import runners as R
    from onestop_tpu.data.ingest import _kernel_mask, _to_u8
    from onestop_tpu.production import chained_infer
    from onestop_tpu.runners import runner_production_chain
    from onestop_tpu.serve import calibrate_quant
    from onestop_tpu.serve_int8 import chained_infer_int8

    t0 = time.time()
    res = runner_production_chain(
        out_dir="artifacts_tpu/r4_chain_ld112_twin", lung_dim=112, qat=False,
        cache_dir="artifacts_tpu/cache_r2", **KW)
    out = {
        "lung_dim": 112,
        "qat": False,
        "lung_val_dice": res["lung_val_dice"],
        "infection_val_dice": res["infection_val_dice"],
        "train_plus_eval_seconds": time.time() - t0,
        # round-3 cross-round reference points on the same serving arms
        # (superseded by this twin's same-round dice_bf16/dice_int8):
        "round3_ref_bf16": 0.9408,   # round3_refined_boxes.json
        "round3_ref_int8": 0.914,    # round3_fast112_int8_diag.json
    }
    print(json.dumps(out), flush=True)

    # --- held-out case, same as the stride/refine/int8 studies ---
    task1 = C.task1_holdout()
    d = task1.preprocess.new_dim
    triples = list(R._case_slice_triples(None, task1.preprocess, **KW))
    ct_e, lung_e, inf_e = triples[-1]
    keep = (lung_e > 0).reshape(len(lung_e), -1).max(axis=1) > 0
    raw_u8 = jnp.asarray(_to_u8(ct_e[keep]))
    inf_u8 = jnp.asarray(_to_u8(inf_e[keep]))

    t3 = C.task3_lung()
    t3 = dataclasses.replace(
        t3, preprocess=dataclasses.replace(t3.preprocess, new_dim=112),
        model=dataclasses.replace(t3.model, in_size=112))
    lung_model = R._build_unet(t3)
    seg_model = R._build_unet(task1)

    def _vars(r):
        st = r["state"]
        return {"params": st.params, "batch_stats": st.batch_stats}

    lv, sv = _vars(res["lung"]), _vars(res["infection"])

    # bf16 chain (plain checkpoint served bf16)
    m, b1, b2 = chained_infer(lung_model, lv, seg_model, sv, raw_u8,
                              model_hw=(d, d), threshold=0.5,
                              lung_hw=(112, 112))
    tgt = _kernel_mask(inf_u8, b1, b2, (d, d // 2)) / 255.0 > 0.5
    out["dice_bf16"] = _dice(m, tgt)

    # all-int8 fast112 arm, calibrated on real stage inputs
    quant = calibrate_quant(np.asarray(raw_u8), lung_model, lv, seg_model, sv,
                            model_hw=(d, d), lung_hw=(112, 112), n_cal=8)
    m8, b1q, b2q = chained_infer_int8(
        lung_model, quant["lung"], lv, seg_model, quant["seg"], sv, raw_u8,
        model_hw=(d, d), threshold=0.5, lung_hw=(112, 112), refine_boxes=True)
    tgt8 = _kernel_mask(inf_u8, b1q, b2q, (d, d // 2)) / 255.0 > 0.5
    out["dice_int8"] = _dice(m8, tgt8)
    out["int8_minus_bf16"] = out["dice_int8"] - out["dice_bf16"]
    out["gate_abs_delta_lt_0.005"] = abs(out["int8_minus_bf16"]) < 0.005

    print(json.dumps(out, indent=2), flush=True)
    with open("artifacts_tpu/round4_qat_twin.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts_tpu/round4_qat_twin.json")


if __name__ == "__main__":
    main()
