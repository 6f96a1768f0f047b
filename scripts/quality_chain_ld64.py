"""64² lung stage for the no-GT chain (round 4): train + gate the config
the speed measurement already picked.

`bench.py --chained --lung-dim 64 --no-extras` (random weights) measured
**6,359 slices/s** amortized vs the promoted 112 default's 5,096 (+25%) —
the 112² lung stage costs far more than its FLOP share because the U-Net's
low-channel convs sit at the C<128 lane ceiling (wall-clock scales with
spatial positions). This script answers the quality half: train the lung
U-Net at 64² (same plain recipe as the r3_chain_ld112 study — 16-case
phantom bed, seed 7, reference epochs), then on the held-out case measure

  - chained dice, bf16 chain, lung_hw=64, refinement on
      (compare: 112 twin 0.9408 / 224 0.9405 — round3_refined_boxes.json);
  - chained dice, deployment mixed split (bf16 lung + int8 infection);
  - per-dispatch batch-256 chain timing for both.

Box-precision context: pre-refinement, a 64² stage quantizes every box
edge to 8 raw px (512²/64) ×2 for ccl_stride — the probability-field
refinement (ops.bbox.refine_boxes_bilinear) re-derives edges from the
bilinearly-upsampled prob field, which is exactly the mechanism that made
112 quality-neutral. Writes artifacts_tpu/round5_chain_ld64.json (round 4
trained the checkpoints but never recorded the gate; by default this run
reuses them and evaluates only — --retrain repeats the training half).
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _timing import timed  # noqa: E402

import jax
import jax.numpy as jnp

KW = dict(n_synthetic=16, synth_hw=512, synth_slices=40, seed=7)
CKPT_DIR = "artifacts_tpu/r4_chain_ld64"
LUNG_CKPT = os.path.join(CKPT_DIR, "unet_lung_fullframe_0.9721.msgpack")
SEG_CKPT = os.path.join(CKPT_DIR, "unet_infection_for_chain_0.8772.msgpack")


def _dice(pred, tgt):
    p = np.asarray(pred[..., 0] if pred.ndim == 4 else pred, np.float64)
    t = np.asarray(tgt, np.float64)
    return float((2 * (p * t).sum() + 1.0) / (p.sum() + t.sum() + 1.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--retrain", action="store_true",
                    help="retrain even if the r4 checkpoints exist")
    args = ap.parse_args()

    from onestop_tpu import config as C
    from onestop_tpu import runners as R
    from onestop_tpu.data.ingest import _kernel_mask, _to_u8
    from onestop_tpu.production import chained_infer
    from onestop_tpu.runners import runner_production_chain
    from onestop_tpu.serve_int8 import chained_infer_mixed, quantize_model
    from onestop_tpu.train.checkpoint import load_model_variables

    task1 = C.task1_holdout()
    d = task1.preprocess.new_dim
    t3 = C.task3_lung()
    t3 = dataclasses.replace(
        t3, preprocess=dataclasses.replace(t3.preprocess, new_dim=64),
        model=dataclasses.replace(t3.model, in_size=64))
    lung_model = R._build_unet(t3)
    seg_model = R._build_unet(task1)

    reuse = (not args.retrain and os.path.exists(LUNG_CKPT)
             and os.path.exists(SEG_CKPT))
    out = {
        "lung_dim": 64,
        "reference_112_dice_chained": 0.9408,
        "reference_224_dice_chained_stride2": 0.9405,
        "speed_bench_random_weights_slices_per_s": 6359.1,
    }
    if reuse:
        # Training half already ran in round 4 (r4_chain_ld64 checkpoints +
        # production_chain_report.json: chained dice 0.9405); this run is the
        # gate evaluation the round never recorded.
        rep = json.load(open(os.path.join(CKPT_DIR,
                                          "production_chain_report.json")))
        out.update({k: rep[k] for k in (
            "dice_chained", "dice_gt_boxes", "dice_delta",
            "lung_val_dice", "infection_val_dice")})
        out["reused_r4_checkpoints"] = True
        lv = load_model_variables(lung_model, LUNG_CKPT, (64, 64))
        sv = load_model_variables(seg_model, SEG_CKPT, (d, d))
    else:
        t0 = time.time()
        res = runner_production_chain(
            out_dir=CKPT_DIR, lung_dim=64,
            cache_dir="artifacts_tpu/cache_r2", **KW)
        out.update({
            "dice_chained": res["dice_chained"],
            "dice_gt_boxes": res["dice_gt_boxes"],
            "dice_delta": res["dice_delta"],
            "lung_val_dice": res["lung_val_dice"],
            "infection_val_dice": res["infection_val_dice"],
            "train_plus_eval_seconds": time.time() - t0,
        })

        def _vars(r):
            st = r["state"]
            return {"params": st.params, "batch_stats": st.batch_stats}

        lv, sv = _vars(res["lung"]), _vars(res["infection"])
    print(json.dumps(out), flush=True)
    rng = np.random.default_rng(0)
    x_cal = jnp.asarray(rng.random((8, d, d, 1)), jnp.float32)
    q_seg = quantize_model(seg_model, sv, x_cal)
    kw = dict(model_hw=(d, d), threshold=0.5, lung_hw=(64, 64))

    # held-out case (same protocol as verify_refined_boxes / verify_bisect)
    triples = list(R._case_slice_triples(None, task1.preprocess, **KW))
    ct_e, lung_e, inf_e = triples[-1]
    keep = (lung_e > 0).reshape(len(lung_e), -1).max(axis=1) > 0
    raw_u8 = jnp.asarray(_to_u8(ct_e[keep]))
    inf_u8 = jnp.asarray(_to_u8(inf_e[keep]))
    out["n_eval_slices"] = int(keep.sum())

    arms = {
        "bf16_64": lambda x: chained_infer(
            lung_model, lv, seg_model, sv, x, **kw),
        "mixed_64": lambda x: chained_infer_mixed(
            lung_model, lv, seg_model, q_seg, sv, x, **kw),
    }
    for name, fn in arms.items():
        m, b1, b2 = fn(raw_u8)
        tgt = _kernel_mask(inf_u8, b1, b2, (d, d // 2)) / 255.0 > 0.5
        out[f"dice_heldout_{name}"] = _dice(m, tgt)
        print(f"{name}: dice {out[f'dice_heldout_{name}']:.4f}", flush=True)

    b_, s_ = 256, 256
    raws = [jax.device_put(jnp.asarray(
        rng.integers(0, 256, (b_, s_, s_), dtype=np.uint8))) for _ in range(3)]
    for name, fn in arms.items():
        jfn = jax.jit(lambda x, f=fn: f(x)[0])
        t = timed(jfn, raws)
        out[f"ms_per_{b_}_{name}"] = round(t * 1e3, 1)
        out[f"slices_per_s_{name}"] = round(b_ / t, 1)
        print(f"{name}: {t*1e3:7.1f} ms/{b_}  {b_/t:6.0f} slices/s", flush=True)

    os.makedirs("artifacts_tpu", exist_ok=True)
    with open("artifacts_tpu/round5_chain_ld64.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts_tpu/round5_chain_ld64.json")


if __name__ == "__main__":
    main()
