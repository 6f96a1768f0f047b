"""Stage breakdown of the promoted chained-serving default (fast112 +
mixed int8): where do the ~1,500 slices/s between the chained default
(5,067, BENCH r4) and the boxes-given int8 chain (6,610) go?

Arms (batch 256 of 256² slices, distinct-buffer amortized timing — the
per-dispatch numbers include the tunnel's fixed ~60 ms dispatch+fetch
floor, so compare DIFFERENCES between arms, not absolutes):

  - full           — chained_infer_mixed, the deployment default
  - no_refine      — refine_boxes=False (the probability-field refinement's
                     marginal cost)
  - stage12_only   — CLAHE + 112² lung U-Net + CCL boxes only (the chain
                     minus the int8 infection pass)
  - seg_only       — CLAHE + crop + int8 infection U-Net with FIXED boxes
                     (the chain minus stages 1-2; fused_infer_int8 protocol)

Writes artifacts_tpu/round4_fast112_breakdown.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _timing import timed  # noqa: E402

import jax
import jax.numpy as jnp

from onestop_tpu import config as C
from onestop_tpu import runners as R
from onestop_tpu.production import chained_infer
from onestop_tpu.serve_int8 import chained_infer_mixed, quantize_model
from onestop_tpu.train.checkpoint import load_model_variables


def main():
    task1, task3 = C.task1_holdout(), C.task3_lung()
    d = task1.preprocess.new_dim

    import dataclasses
    t3 = dataclasses.replace(
        task3, preprocess=dataclasses.replace(task3.preprocess, new_dim=112),
        model=dataclasses.replace(task3.model, in_size=112))
    lung_model = R._build_unet(t3)
    seg_model = R._build_unet(task1)
    lung_vars = load_model_variables(
        lung_model, "artifacts_tpu/r4_chain_ld112_twin/unet_lung_fullframe_0.9833.msgpack",
        (112, 112))
    seg_vars = load_model_variables(
        seg_model, "artifacts_tpu/r4_chain_ld112_twin/unet_infection_for_chain_0.8772.msgpack",
        (d, d))

    b_, s_ = 256, 256
    rng = np.random.default_rng(0)
    raws = [jax.device_put(jnp.asarray(
        rng.integers(0, 256, (b_, s_, s_), dtype=np.uint8))) for _ in range(3)]
    x_cal = jnp.asarray(rng.random((8, d, d, 1)), jnp.float32)
    q_seg = quantize_model(seg_model, seg_vars, x_cal)

    kw = dict(model_hw=(d, d), threshold=0.5, lung_hw=(112, 112))

    fn_full = jax.jit(lambda x: chained_infer_mixed(
        lung_model, lung_vars, seg_model, q_seg, seg_vars, x, **kw)[0])
    fn_norefine = jax.jit(lambda x: chained_infer_mixed(
        lung_model, lung_vars, seg_model, q_seg, seg_vars, x,
        refine_boxes=False, **kw)[0])
    # stages 1+2 only: bf16 chain but return boxes without running stage 3 —
    # chained_infer has no such switch, so time the bf16 full chain minus a
    # boxes-given bf16 seg pass instead: approximate stage12 = full - seg.
    # Directly measurable arm: the bf16 chain (for the mixed-vs-bf16 delta).
    fn_bf16 = jax.jit(lambda x: chained_infer(
        lung_model, lung_vars, seg_model, seg_vars, x, **kw)[0])

    from onestop_tpu.serve_int8 import fused_infer_int8, calibrate_and_quantize
    q_full = calibrate_and_quantize(seg_vars, x_cal)
    b1 = jax.device_put(jnp.tile(
        jnp.array([s_ // 8, s_ // 6, s_ // 3, (2 * s_) // 3], jnp.int32), (b_, 1)))
    b2 = jax.device_put(jnp.tile(
        jnp.array([(5 * s_) // 9, s_ // 6, (3 * s_) // 10, (3 * s_) // 5], jnp.int32), (b_, 1)))
    fn_seg_only = jax.jit(lambda x: fused_infer_int8(
        q_full, x, b1, b2, out_hw=(d, d), threshold=0.5))

    out = {}
    for name, fn in (("full_mixed", fn_full), ("no_refine_mixed", fn_norefine),
                     ("full_bf16", fn_bf16), ("seg_only_int8", fn_seg_only)):
        t = timed(fn, raws)
        out[f"ms_per_{b_}_{name}"] = round(t * 1e3, 1)
        out[f"slices_per_s_{name}"] = round(b_ / t, 1)
        print(f"{name:16s}: {t*1e3:7.1f} ms/{b_}  {b_/t:6.0f} slices/s",
              flush=True)
    out["refine_ms_per_256"] = round(
        out["ms_per_256_full_mixed"] - out["ms_per_256_no_refine_mixed"], 1)
    out["stage12_ms_per_256_approx"] = round(
        out["ms_per_256_full_mixed"] - out["ms_per_256_seg_only_int8"], 1)
    print(json.dumps(out), flush=True)

    os.makedirs("artifacts_tpu", exist_ok=True)
    with open("artifacts_tpu/round4_fast112_breakdown.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts_tpu/round4_fast112_breakdown.json")


if __name__ == "__main__":
    main()
