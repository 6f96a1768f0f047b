"""Quality + throughput A/B for probability-field box refinement
(production.chained_infer refine_boxes / ops.bbox.refine_boxes_bilinear).

Coarse CCL boxes are quantized to the labeling grid (ccl_stride × lung_hw);
round 3 measured that cost directly: stride-2 boxes lose 0.0043 chained dice
(round3_ccl_stride.json) and the 112² lung stage loses 0.04
(round3_chain_lowres.json) purely from box-frame quantization. The
refinement re-derives every box edge from the bilinearly-upsampled lung
probability field at raw-pixel precision, so the question here is whether it
recovers those deltas and what it costs in chain wall-clock.

Arms (all on the same held-out phantom case as the stride study):
  224/s1/plain  — exact-CCL baseline (round-2 report number)
  224/s2/plain  — the pre-refinement default
  224/s2/refine — the new default
  112/s2/plain  — low-res lung stage, scaled coarse boxes (round-3 study)
  112/s2/refine — low-res lung stage + refinement (the payoff arm: can the
                  112² stage's 1.4× chain speedup be had at full quality?)

Writes artifacts_tpu/round3_refined_boxes.json.
"""

import dataclasses
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
from onestop_tpu.data.ingest import _kernel_mask, _to_u8
from onestop_tpu.production import chained_infer

KW = dict(n_synthetic=16, synth_hw=512, synth_slices=40, seed=7)


from onestop_tpu.serve import _load_vars as _load  # shared checkpoint loader


def _dice(pred, tgt):
    p = np.asarray(pred[..., 0] if pred.ndim == 4 else pred, np.float64)
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
    lung224 = R._build_unet(task3)
    t3_112 = dataclasses.replace(
        task3, preprocess=dataclasses.replace(task3.preprocess, new_dim=112),
        model=dataclasses.replace(task3.model, in_size=112))
    lung112 = R._build_unet(t3_112)

    lv224 = _load(lung224,
                  "artifacts_tpu/q2_chain/unet_lung_fullframe_0.9907.msgpack",
                  (d, d))
    sv224 = _load(seg_model,
                  "artifacts_tpu/q2_chain/unet_infection_for_chain_0.8759.msgpack",
                  (d, d))
    lv112 = _load(lung112,
                  "artifacts_tpu/r3_chain_ld112/unet_lung_fullframe_0.9833.msgpack",
                  (112, 112))
    sv112 = _load(seg_model,
                  "artifacts_tpu/r3_chain_ld112/unet_infection_for_chain_0.8772.msgpack",
                  (d, d))

    arms = {
        "224_s1_plain": dict(lm=lung224, lv=lv224, sv=sv224, s=1, ref=False, lhw=None),
        "224_s2_plain": dict(lm=lung224, lv=lv224, sv=sv224, s=2, ref=False, lhw=None),
        "224_s2_refine": dict(lm=lung224, lv=lv224, sv=sv224, s=2, ref=True, lhw=None),
        "112_s2_plain": dict(lm=lung112, lv=lv112, sv=sv112, s=2, ref=False, lhw=(112, 112)),
        "112_s2_refine": dict(lm=lung112, lv=lv112, sv=sv112, s=2, ref=True, lhw=(112, 112)),
    }

    out = {"n_eval_slices": int(keep.sum())}
    for name, a in arms.items():
        m, b1, b2 = chained_infer(a["lm"], a["lv"], seg_model, a["sv"],
                                  raw_u8, model_hw=(d, d), threshold=0.5,
                                  ccl_stride=a["s"], lung_hw=a["lhw"],
                                  refine_boxes=a["ref"])
        tgt = _kernel_mask(inf_u8, b1, b2, (d, d // 2)) / 255.0 > 0.5
        out[f"dice_{name}"] = _dice(m, tgt)
        print(f"{name}: dice {out[f'dice_{name}']:.4f}", flush=True)

    # throughput: batch 256 of 256^2 raw slices, 3 fresh buffers
    b_, s_ = 256, 256
    rng = np.random.default_rng(0)
    raws = [jax.device_put(jnp.asarray(
        rng.integers(0, 256, (b_, s_, s_), dtype=np.uint8))) for _ in range(3)]
    for name, a in arms.items():
        fn = jax.jit(lambda x, a=a: chained_infer(
            a["lm"], a["lv"], seg_model, a["sv"], x, model_hw=(d, d),
            threshold=0.5, ccl_stride=a["s"], lung_hw=a["lhw"],
            refine_boxes=a["ref"])[0])
        t = timed(fn, raws)
        out[f"ms_per_{b_}_{name}"] = t * 1e3
        out[f"slices_per_s_{name}"] = b_ / t
        print(f"{name}: {t*1e3:7.1f} ms/{b_}  {b_/t:6.0f} slices/s", flush=True)

    os.makedirs("artifacts_tpu", exist_ok=True)
    with open("artifacts_tpu/round3_refined_boxes.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts_tpu/round3_refined_boxes.json")


if __name__ == "__main__":
    main()
