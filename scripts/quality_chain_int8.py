"""Quality check for the int8 no-GT chain (serve_int8.chained_infer_int8):
chained dice with BOTH U-Nets int8 vs the bf16 chain, on the round-2 chain
checkpoints and the same held-out phantom case.

Extends the per-family int8 gate (round3_int8_quality.json) to the composed
pipeline: stage-1 quantization can move boxes, which moves the stage-3 crop
frame — a failure mode no single-model study sees.

Writes artifacts_tpu/round3_chain_int8.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _timing import timed  # noqa: E402

import jax
import jax.numpy as jnp

from verify_ccl_stride import KW, _dice, _load  # noqa: E402

from onestop_tpu import config as C
from onestop_tpu import runners as R
from onestop_tpu.data.ingest import _kernel_mask, _to_u8
from onestop_tpu.production import chained_infer
from onestop_tpu.serve_int8 import chained_infer_int8, quantize_model


def main():
    task1, task3 = C.task1_holdout(), C.task3_lung()
    d = task1.preprocess.new_dim
    triples = list(R._case_slice_triples(None, task1.preprocess, **KW))
    ct_e, lung_e, inf_e = triples[-1]
    keep = (lung_e > 0).reshape(len(lung_e), -1).max(axis=1) > 0
    raw_u8 = jnp.asarray(_to_u8(ct_e[keep]))
    inf_u8 = jnp.asarray(_to_u8(inf_e[keep]))

    lung_model = R._build_unet(task3)
    seg_model = R._build_unet(task1)
    lung_vars = _load(lung_model,
                      "artifacts_tpu/q2_chain/unet_lung_fullframe_0.9907.msgpack",
                      (d, d))
    seg_vars = _load(seg_model,
                     "artifacts_tpu/q2_chain/unet_infection_for_chain_0.8759.msgpack",
                     (d, d))

    # calibrate on the eval case's own preprocessed inputs (full-frame for
    # the lung model; crop-frame would need boxes — the lung stage input
    # distribution is what stage-1 sees, and stage-3 activations are close
    # enough that the same slices calibrate both, like the serving flow would)
    from onestop_tpu.ops.resize import resize2d
    x_cal = (resize2d(raw_u8[:16].astype(jnp.float32), (d, d), "area") / 255.0)[..., None]
    q_lung = quantize_model(lung_model, lung_vars, x_cal)
    q_seg = quantize_model(seg_model, seg_vars, x_cal)

    m_bf16, b1f, b2f = chained_infer(lung_model, lung_vars, seg_model,
                                     seg_vars, raw_u8, model_hw=(d, d),
                                     threshold=0.5)
    m_int8, b1q, b2q = chained_infer_int8(lung_model, q_lung, lung_vars,
                                          seg_model, q_seg, seg_vars, raw_u8,
                                          model_hw=(d, d), threshold=0.5)
    t_bf16 = _kernel_mask(inf_u8, b1f, b2f, (d, d // 2)) / 255.0 > 0.5
    t_int8 = _kernel_mask(inf_u8, b1q, b2q, (d, d // 2)) / 255.0 > 0.5

    out = {
        "n_eval_slices": int(keep.sum()),
        "dice_bf16_chain": _dice(np.asarray(m_bf16), np.asarray(t_bf16)),
        "dice_int8_chain": _dice(np.asarray(m_int8), np.asarray(t_int8)),
        "max_box_delta_px": float(np.max(np.abs(np.concatenate(
            [np.asarray(b1f) - np.asarray(b1q),
             np.asarray(b2f) - np.asarray(b2q)], 0)))),
    }
    out["dice_delta"] = out["dice_bf16_chain"] - out["dice_int8_chain"]
    print(json.dumps(out), flush=True)

    # throughput on the bench batch geometry
    b_, s_ = 256, 256
    rng = np.random.default_rng(0)
    raws = [jax.device_put(jnp.asarray(
        rng.integers(0, 256, (b_, s_, s_), dtype=np.uint8))) for _ in range(3)]
    fn = jax.jit(lambda x: chained_infer_int8(
        lung_model, q_lung, lung_vars, seg_model, q_seg, seg_vars, x,
        model_hw=(d, d), threshold=0.5)[0])
    t = timed(fn, raws)
    out["ms_per_256"] = t * 1e3
    out["slices_per_s"] = b_ / t
    print(f"int8 chain: {t*1e3:7.1f} ms/{b_}  {b_/t:6.0f} slices/s", flush=True)

    with open("artifacts_tpu/round3_chain_int8.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts_tpu/round3_chain_int8.json")


if __name__ == "__main__":
    main()
