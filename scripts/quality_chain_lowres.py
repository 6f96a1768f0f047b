"""Low-resolution lung stage for the no-GT chain (round 3): train + evaluate
the production chain with the stage-1 lung U-Net at 112² instead of 224²
(runner_production_chain(lung_dim=112)), then time chained_infer with the
trained models.

The lung stage exists only to produce two crop boxes; at 112² it costs ~1/4
of the FLOPs. This script answers (a) what that does to chained dice on the
full-fidelity phantoms (vs the 224² q2 chain: dice_chained 0.9448 / 0.9405
at ccl_stride 2), and (b) what it does to end-to-end chain throughput.

Writes artifacts_tpu/round3_chain_lowres.json.
"""

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


def main():
    from onestop_tpu.runners import runner_production_chain
    from onestop_tpu.production import chained_infer

    t0 = time.time()
    res = runner_production_chain(
        out_dir="artifacts_tpu/r3_chain_ld112", lung_dim=112,
        cache_dir="artifacts_tpu/cache_r2", **KW)
    out = {
        "lung_dim": 112,
        "dice_chained": res["dice_chained"],
        "dice_gt_boxes": res["dice_gt_boxes"],
        "dice_delta": res["dice_delta"],
        "lung_val_dice": res["lung_val_dice"],
        "infection_val_dice": res["infection_val_dice"],
        "train_plus_eval_seconds": time.time() - t0,
        "reference_224_dice_chained_stride2": 0.9405,
    }
    print(json.dumps(out), flush=True)

    # throughput: same protocol as verify_ccl_stride (batch 256 of 256^2).
    # flax modules are stateless config holders — rebuild them exactly as the
    # runner did (task3 with new_dim/in_size=112) and reuse the trained state
    import dataclasses

    from onestop_tpu import config as C
    from onestop_tpu import runners as R

    t3 = C.task3_lung()
    t3 = dataclasses.replace(
        t3, preprocess=dataclasses.replace(t3.preprocess, new_dim=112),
        model=dataclasses.replace(t3.model, in_size=112))
    lung_model = R._build_unet(t3)
    seg_model = R._build_unet(C.task1_holdout())

    def _vars(r):
        st = r["state"]
        return {"params": st.params, "batch_stats": st.batch_stats}

    lv, sv = _vars(res["lung"]), _vars(res["infection"])
    b_, s_ = 256, 256
    rng = np.random.default_rng(0)
    raws = [jax.device_put(jnp.asarray(
        rng.integers(0, 256, (b_, s_, s_), dtype=np.uint8))) for _ in range(3)]
    fn = jax.jit(lambda x: chained_infer(
        lung_model, lv, seg_model, sv, x, model_hw=(224, 224),
        threshold=0.5, lung_hw=(112, 112))[0])
    t = timed(fn, raws)
    out["ms_per_256"] = t * 1e3
    out["slices_per_s"] = b_ / t
    print(f"lung112 chain: {t*1e3:7.1f} ms/{b_}  {b_/t:6.0f} slices/s", flush=True)

    with open("artifacts_tpu/round3_chain_lowres.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts_tpu/round3_chain_lowres.json")


if __name__ == "__main__":
    main()
