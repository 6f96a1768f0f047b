"""Quality check for the fast-preset chain served int8: 112² lung stage +
probability-field box refinement + BOTH U-Nets s8×s8→s32
(`bench.py --chained --lung-dim 112 --int8`, 4,753.8 slices/s amortized).

The bf16 fast preset measured dice parity with the 224 default
(round3_refined_boxes.json: 0.9408 vs 0.9405); this closes the remaining
cell — int8 on the same arm, same held-out case and checkpoints. Appends
dice_112_s2_refine_int8 to artifacts_tpu/round3_refined_boxes.json.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from onestop_tpu import config as C
from onestop_tpu import runners as R
from onestop_tpu.data.ingest import _kernel_mask, _to_u8
from onestop_tpu.serve_int8 import chained_infer_int8, quantize_model

KW = dict(n_synthetic=16, synth_hw=512, synth_slices=40, seed=7)


from onestop_tpu.serve import _load_vars as _load  # shared checkpoint loader


def _dice(pred, tgt):
    p = np.asarray(pred[..., 0], np.float64)
    t = np.asarray(tgt, np.float64)
    return float((2 * (p * t).sum() + 1.0) / (p.sum() + t.sum() + 1.0))


def main():
    task1, task3 = C.task1_holdout(), C.task3_lung()
    d = task1.preprocess.new_dim
    triples = list(R._case_slice_triples(None, task1.preprocess, **KW))
    ct_e, lung_e, inf_e = triples[-1]
    keep = (lung_e > 0).reshape(len(lung_e), -1).max(axis=1) > 0
    raw_u8 = jnp.asarray(_to_u8(ct_e[keep]))
    inf_u8 = jnp.asarray(_to_u8(inf_e[keep]))

    seg_model = R._build_unet(task1)
    t3_112 = dataclasses.replace(
        task3, preprocess=dataclasses.replace(task3.preprocess, new_dim=112),
        model=dataclasses.replace(task3.model, in_size=112))
    lung112 = R._build_unet(t3_112)
    lv = _load(lung112,
               "artifacts_tpu/r3_chain_ld112/unet_lung_fullframe_0.9833.msgpack",
               (112, 112))
    sv = _load(seg_model,
               "artifacts_tpu/r3_chain_ld112/unet_infection_for_chain_0.8772.msgpack",
               (d, d))

    # calibrate on real stage inputs (same approach as serve.calibrate_quant)
    from onestop_tpu.serve import calibrate_quant

    quant = calibrate_quant(np.asarray(raw_u8), lung112, lv, seg_model, sv,
                            model_hw=(d, d), lung_hw=(112, 112), n_cal=8)

    m, b1, b2 = chained_infer_int8(
        lung112, quant["lung"], lv, seg_model, quant["seg"], sv, raw_u8,
        model_hw=(d, d), threshold=0.5, lung_hw=(112, 112), refine_boxes=True)
    tgt = _kernel_mask(inf_u8, b1, b2, (d, d // 2)) / 255.0 > 0.5
    dice = _dice(m, tgt)
    print(json.dumps({"dice_112_s2_refine_int8": dice}), flush=True)

    path = "artifacts_tpu/round3_refined_boxes.json"
    with open(path) as f:
        out = json.load(f)
    out["dice_112_s2_refine_int8"] = dice
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"updated {path}")


if __name__ == "__main__":
    main()
