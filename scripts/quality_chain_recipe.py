"""Deployment-recipe study: train the PROMOTED serving chain with the
bed-robust CV recipe and gate it on the serving arms.

``--lung-dim`` selects the law (112 = the round-4 study, artifact
round4_chain_recipe.json; 64 = the round-5 promoted chained default,
artifact round5_chain_recipe_ld64.json). Every arm also evaluates the
MIXED split (bf16 lung + int8 infection, ``serve_int8.chained_infer_mixed``)
— the promoted serving config — alongside bf16 and all-int8.

The round-4 CV study (RESULTS.md, round4_cv_aug*.json) found two training
ingredients with different jobs:
  - per-batch augmentation @ 2x epochs — the bed-ROBUST quality recipe
    (fresh-init 4-fold 0.9780/0.9773 on seeds 7/13);
  - QAT — removes the per-checkpoint int8 lottery (round4_qat*.json:
    plain twin loses 0.025 dice under int8, QAT twin loses nothing) and
    regularizes on SOME beds (seed-7 only).
A deployed int8 chain wants both. This study trains the EXACT ld112
serving law (quality_chain_lowres.py bed: 16 phantoms at 512x512, seed 7,
lung_dim=112) with aug+QAT at 160 epochs (and optionally aug-only), then
evaluates the same held-out case on the same serving arms as
quality_qat.py:

  - dice_bf16 — checkpoint served through the bf16 chain
    (production.chained_infer, refined boxes);
  - dice_int8 — the all-int8 fast112 arm (112^2 lung + refined boxes +
    both U-Nets s8xs8->s32, real-input calibration);
  - the int8 promotion gate |delta| < 0.005 (scripts/quality_int8.py).

Twins to beat (same bed, same serving arms):
  plain @80: bf16 0.9408 / int8 0.9155 (round4_qat_twin.json)
  QAT @80:   bf16 0.9837 / int8 0.9845 (round4_qat.json)

Usage (TPU):  python scripts/quality_chain_recipe.py [--arms aug_qat_160 ...]
Writes artifacts_tpu/round4_chain_recipe.json (merging per arm).
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

KW = dict(n_synthetic=16, synth_hw=512, synth_slices=40, seed=7)

# arm -> (use_augmentation, qat, epochs)
ARMS = {
    "aug_qat_160": ("batch", True, 160),   # the full deployment recipe
    "aug_160": ("batch", False, 160),      # quality-max bf16 arm (no QAT)
}


def _dice(pred, tgt):
    import numpy as np
    p = np.asarray(pred[..., 0] if pred.ndim == 4 else pred, np.float64)
    t = np.asarray(tgt, np.float64)
    return float((2 * (p * t).sum() + 1.0) / (p.sum() + t.sum() + 1.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", nargs="*", default=["aug_qat_160"],
                    choices=list(ARMS))
    ap.add_argument("--lung-dim", type=int, default=112)
    args = ap.parse_args()
    ld = args.lung_dim

    import jax.numpy as jnp
    import numpy as np

    from onestop_tpu import config as C
    from onestop_tpu import runners as R
    from onestop_tpu.data.ingest import _kernel_mask, _to_u8
    from onestop_tpu.production import chained_infer
    from onestop_tpu.serve import calibrate_quant
    from onestop_tpu.serve_int8 import chained_infer_int8, chained_infer_mixed

    path = ("artifacts_tpu/round4_chain_recipe.json" if ld == 112
            else f"artifacts_tpu/round5_chain_recipe_ld{ld}.json")
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)

    # held-out case, identical to the stride/refine/int8/qat studies
    task1 = C.task1_holdout()
    d = task1.preprocess.new_dim
    triples = list(R._case_slice_triples(None, task1.preprocess, **KW))
    ct_e, lung_e, inf_e = triples[-1]
    keep = (lung_e > 0).reshape(len(lung_e), -1).max(axis=1) > 0
    raw_u8 = jnp.asarray(_to_u8(ct_e[keep]))
    inf_u8 = jnp.asarray(_to_u8(inf_e[keep]))

    t3 = C.task3_lung()
    t3 = dataclasses.replace(
        t3, preprocess=dataclasses.replace(t3.preprocess, new_dim=ld),
        model=dataclasses.replace(t3.model, in_size=ld))
    lung_model = R._build_unet(t3)
    seg_model = R._build_unet(task1)

    for arm in args.arms:
        aug, qat, epochs = ARMS[arm]
        t0 = time.time()
        tag = "r4_chain_recipe" if ld == 112 else f"r5_chain_recipe_ld{ld}"
        res = R.runner_production_chain(
            out_dir=f"artifacts_tpu/{tag}/{arm}", lung_dim=ld,
            qat=qat, use_augmentation=aug, epochs=epochs,
            cache_dir="artifacts_tpu/cache_r2", save_figures=False, **KW)
        rec = {
            "lung_dim": ld, "qat": qat, "use_augmentation": aug,
            "epochs": epochs,
            "lung_val_dice": res["lung_val_dice"],
            "infection_val_dice": res["infection_val_dice"],
            "train_plus_eval_seconds": round(time.time() - t0, 1),
        }

        def _vars(r):
            st = r["state"]
            return {"params": st.params, "batch_stats": st.batch_stats}

        lv, sv = _vars(res["lung"]), _vars(res["infection"])

        m, b1, b2 = chained_infer(lung_model, lv, seg_model, sv, raw_u8,
                                  model_hw=(d, d), threshold=0.5,
                                  lung_hw=(ld, ld))
        tgt = _kernel_mask(inf_u8, b1, b2, (d, d // 2)) / 255.0 > 0.5
        rec["dice_bf16"] = _dice(m, tgt)

        quant = calibrate_quant(np.asarray(raw_u8), lung_model, lv,
                                seg_model, sv, model_hw=(d, d),
                                lung_hw=(ld, ld), n_cal=8)
        # the PROMOTED serving config: bf16 lung + int8 infection
        mm, b1m, b2m = chained_infer_mixed(
            lung_model, lv, seg_model, quant["seg"], sv, raw_u8,
            model_hw=(d, d), threshold=0.5, lung_hw=(ld, ld),
            refine_boxes=True)
        tgtm = _kernel_mask(inf_u8, b1m, b2m, (d, d // 2)) / 255.0 > 0.5
        rec["dice_mixed"] = _dice(mm, tgtm)
        rec["mixed_minus_bf16"] = rec["dice_mixed"] - rec["dice_bf16"]

        m8, b1q, b2q = chained_infer_int8(
            lung_model, quant["lung"], lv, seg_model, quant["seg"], sv,
            raw_u8, model_hw=(d, d), threshold=0.5, lung_hw=(ld, ld),
            refine_boxes=True)
        tgt8 = _kernel_mask(inf_u8, b1q, b2q, (d, d // 2)) / 255.0 > 0.5
        rec["dice_int8"] = _dice(m8, tgt8)
        rec["int8_minus_bf16"] = rec["dice_int8"] - rec["dice_bf16"]
        rec["gate_abs_delta_lt_0.005"] = abs(rec["int8_minus_bf16"]) < 0.005

        out[arm] = rec
        print(json.dumps({arm: rec}), flush=True)
        os.makedirs("artifacts_tpu", exist_ok=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
