"""Stage-1+2 residual of the PROMOTED ld64 chained default, and one
targeted fix A/B (VERDICT r4 item 6).

Round-4 breakdown at ld112 (round4_fast112_breakdown.json): stages 1+2
(CLAHE + lung U-Net + CCL boxes + refinement) cost ~36.5 ms/256 above the
boxes-given int8 floor. The ld64 promotion (round5_chain_ld64.json) shrinks
the lung conv; this script re-itemizes what remains and A/Bs the one lever
left: the lung U-Net's WIDTH. Evidence shaping the choice:

  - CCL is a non-cost at the deployment grid (bisect A/B was
    throughput-neutral, round4_bisect_boxes.json) — not worth attacking;
  - quantizing the lung stage made the ld112 chain SLOWER (all-int8 4,754
    vs mixed 5,001 slices/s — quant/dequant overhead beats the conv win at
    C<128 channel counts), so int8-lung is excluded as the fix;
  - the lung U-Net keeps the full 32..512 reference topology at 64² where
    its convs are latency-/lane-bound — but its task (full-frame lung
    masks, val dice 0.97-0.98) is far easier than infection segmentation,
    so a HALF-WIDTH stage-1 model (16-32-64-128, bridge 256 — 1/4 the
    params/FLOPs) may hold box quality while cutting the dominant residual.

Protocol: per-dispatch batch-256 timing (distinct buffers, includes the
~60 ms tunnel floor — compare differences), held-out chained dice on the
r4_chain_ld64 bed (same held-out case/protocol as quality_chain_ld64).
The narrow lung model trains fresh on the identical 16-phantom law; the
infection U-Net stays the recorded r4 checkpoint in every arm, so the A/B
isolates stage 1. Accept if narrow-lung chained dice is within 0.005 of
the full-width 0.9405 AND the timing gain is real; either way the decision
is recorded. Writes artifacts_tpu/round5_ld64_residual.json.
"""

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
NARROW = dict(unet_widths=(16, 32, 64, 128), unet_bridge=256)


def _dice(pred, tgt):
    p = np.asarray(pred[..., 0] if pred.ndim == 4 else pred, np.float64)
    t = np.asarray(tgt, np.float64)
    return float((2 * (p * t).sum() + 1.0) / (p.sum() + t.sum() + 1.0))


def main():
    from onestop_tpu import config as C
    from onestop_tpu import runners as R
    from onestop_tpu.data.ingest import _kernel_mask, _to_u8
    from onestop_tpu.production import build_plain_lung_dataset, chained_infer
    from onestop_tpu.serve_int8 import (calibrate_and_quantize,
                                        chained_infer_mixed, fused_infer_int8,
                                        quantize_model)
    from onestop_tpu.train.checkpoint import load_model_variables

    task1 = C.task1_holdout()
    d = task1.preprocess.new_dim
    t3 = C.task3_lung()
    t3 = dataclasses.replace(
        t3, preprocess=dataclasses.replace(t3.preprocess, new_dim=64),
        model=dataclasses.replace(t3.model, in_size=64))
    t3n = dataclasses.replace(
        t3, model=dataclasses.replace(t3.model, **NARROW))

    lung_model = R._build_unet(t3)
    seg_model = R._build_unet(task1)
    lv = load_model_variables(lung_model, LUNG_CKPT, (64, 64))
    sv = load_model_variables(seg_model, SEG_CKPT, (d, d))

    rng = np.random.default_rng(0)
    x_cal = jnp.asarray(rng.random((8, d, d, 1)), jnp.float32)
    q_seg = quantize_model(seg_model, sv, x_cal)
    kw = dict(model_hw=(d, d), threshold=0.5, lung_hw=(64, 64))

    # --- train the narrow stage-1 model on the identical chain law --------
    triples = list(R._case_slice_triples(None, task1.preprocess, **KW))
    train_triples, (ct_e, lung_e, inf_e) = triples[:-1], triples[-1]
    src_key = R._source_key(None, dict(KW)) + "|trainset=all-but-last"
    xl, yl = R._maybe_cached(
        lambda: build_plain_lung_dataset(
            [(ct, lung) for ct, lung, _ in train_triples], t3n.preprocess),
        "artifacts_tpu/cache_r2", "chain_lung_plain", t3n.preprocess,
        ("cts_fullframe", "lungs_fullframe"), source_key=src_key)
    lung_model_n = R._build_unet(t3n)
    t0 = time.time()
    res_n = R._run_holdout_segmentation(
        lung_model_n, t3n, xl, yl, "artifacts_tpu/r5_ld64_narrow",
        "unet_lung_narrow64", save_figures=False)
    out = {
        "narrow_widths": list(NARROW["unet_widths"]),
        "narrow_bridge": NARROW["unet_bridge"],
        "narrow_lung_val_dice": res_n["val_dice"],
        "fullwidth_lung_val_dice": 0.9721,
        "narrow_train_seconds": round(time.time() - t0, 1),
        "reference_dice_chained_ld64": 0.9405,
    }
    print(json.dumps(out), flush=True)
    lvn = {"params": res_n["state"].params,
           "batch_stats": res_n["state"].batch_stats}

    # --- held-out chained dice, full-width vs narrow stage 1 --------------
    keep = (lung_e > 0).reshape(len(lung_e), -1).max(axis=1) > 0
    raw_u8 = jnp.asarray(_to_u8(ct_e[keep]))
    inf_u8 = jnp.asarray(_to_u8(inf_e[keep]))
    arms_q = {
        "mixed_full": lambda x: chained_infer_mixed(
            lung_model, lv, seg_model, q_seg, sv, x, **kw),
        "mixed_narrow": lambda x: chained_infer_mixed(
            lung_model_n, lvn, seg_model, q_seg, sv, x, **kw),
        "bf16_narrow": lambda x: chained_infer(
            lung_model_n, lvn, seg_model, sv, x, **kw),
    }
    for name, fn in arms_q.items():
        m, b1, b2 = fn(raw_u8)
        tgt = _kernel_mask(inf_u8, b1, b2, (d, d // 2)) / 255.0 > 0.5
        out[f"dice_heldout_{name}"] = _dice(m, tgt)
        print(f"{name}: dice {out[f'dice_heldout_{name}']:.4f}", flush=True)

    # --- per-dispatch residual itemization + A/B timing --------------------
    b_, s_ = 256, 256
    raws = [jax.device_put(jnp.asarray(
        rng.integers(0, 256, (b_, s_, s_), dtype=np.uint8))) for _ in range(3)]
    q_full = calibrate_and_quantize(sv, x_cal)
    b1f = jax.device_put(jnp.tile(jnp.array(
        [s_ // 8, s_ // 6, s_ // 3, (2 * s_) // 3], jnp.int32), (b_, 1)))
    b2f = jax.device_put(jnp.tile(jnp.array(
        [(5 * s_) // 9, s_ // 6, (3 * s_) // 10, (3 * s_) // 5], jnp.int32),
        (b_, 1)))
    arms_t = {
        "mixed_full": jax.jit(lambda x: chained_infer_mixed(
            lung_model, lv, seg_model, q_seg, sv, x, **kw)[0]),
        "mixed_full_norefine": jax.jit(lambda x: chained_infer_mixed(
            lung_model, lv, seg_model, q_seg, sv, x, refine_boxes=False,
            **kw)[0]),
        "mixed_narrow": jax.jit(lambda x: chained_infer_mixed(
            lung_model_n, lvn, seg_model, q_seg, sv, x, **kw)[0]),
        "seg_only_int8": jax.jit(lambda x: fused_infer_int8(
            q_full, x, b1f, b2f, out_hw=(d, d), threshold=0.5)),
    }
    for name, fn in arms_t.items():
        t = timed(fn, raws)
        out[f"ms_per_{b_}_{name}"] = round(t * 1e3, 1)
        out[f"slices_per_s_{name}"] = round(b_ / t, 1)
        print(f"{name:20s}: {t*1e3:7.1f} ms/{b_}  {b_/t:6.0f} slices/s",
              flush=True)
    out["refine_ms_per_256"] = round(
        out["ms_per_256_mixed_full"] - out["ms_per_256_mixed_full_norefine"], 1)
    out["stage12_ms_per_256_approx"] = round(
        out["ms_per_256_mixed_full"] - out["ms_per_256_seg_only_int8"], 1)
    out["narrow_gain_ms_per_256"] = round(
        out["ms_per_256_mixed_full"] - out["ms_per_256_mixed_narrow"], 1)
    gate = (abs(out["dice_heldout_mixed_narrow"]
                - out["dice_heldout_mixed_full"]) < 0.005)
    out["narrow_quality_gate"] = "pass" if gate else "fail"
    print(json.dumps(out), flush=True)

    os.makedirs("artifacts_tpu", exist_ok=True)
    with open("artifacts_tpu/round5_ld64_residual.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts_tpu/round5_ld64_residual.json")


if __name__ == "__main__":
    main()
