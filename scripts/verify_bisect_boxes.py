"""Quality + throughput A/B for CCL-free lung boxes
(ops.bbox.bisect_lung_components, box_mode="bisect" in the chains).

The round-4 stage breakdown (artifacts_tpu/round4_fast112_breakdown.json)
puts stages 1+2 (CLAHE + 112² lung U-Net + CCL boxes) at ~36.5 ms/256
per-dispatch — the dominant residual of the promoted chained default above
the boxes-given int8 floor — and the CCL while_loop fixpoint (segmented
scans until convergence + MXU size histogram + top-k) is its only
iteration-bound piece. The chain only ever needs TWO boxes and lungs are
bilateral, so "bisect" replaces general labeling with a column-marginal
valley split: pure reductions, no while_loop. This script gates it:

  quality — held-out phantom case (same protocol as
      scripts/verify_refined_boxes.py): chained dice at threshold 0.5 for
      box_mode ccl vs bisect, on BOTH the bf16 chain and the deployment
      mixed (bf16 lung + int8 seg) chain, lung_hw=112, stride 2, refine on;
  throughput — per-dispatch batch-256 timing of the same four arms
      (the bench-protocol amortized number comes from
      `python bench.py --chained --box-mode bisect` if this gate passes).

Writes artifacts_tpu/round4_bisect_boxes.json.
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
from onestop_tpu.serve import _load_vars as _load
from onestop_tpu.serve_int8 import chained_infer_mixed, quantize_model

KW = dict(n_synthetic=16, synth_hw=512, synth_slices=40, seed=7)


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
    t3_112 = dataclasses.replace(
        task3, preprocess=dataclasses.replace(task3.preprocess, new_dim=112),
        model=dataclasses.replace(task3.model, in_size=112))
    lung112 = R._build_unet(t3_112)

    # the same checkpoints as the round-4 stage breakdown
    lv = _load(lung112,
               "artifacts_tpu/r4_chain_ld112_twin/unet_lung_fullframe_0.9833.msgpack",
               (112, 112))
    sv = _load(seg_model,
               "artifacts_tpu/r4_chain_ld112_twin/unet_infection_for_chain_0.8772.msgpack",
               (d, d))
    rng = np.random.default_rng(0)
    x_cal = jnp.asarray(rng.random((8, d, d, 1)), jnp.float32)
    q_seg = quantize_model(seg_model, sv, x_cal)

    kw = dict(model_hw=(d, d), threshold=0.5, lung_hw=(112, 112))

    def arm_fns():
        for mode in ("ccl", "bisect"):
            yield (f"bf16_{mode}", lambda x, m=mode: chained_infer(
                lung112, lv, seg_model, sv, x, box_mode=m, **kw))
            yield (f"mixed_{mode}", lambda x, m=mode: chained_infer_mixed(
                lung112, lv, seg_model, q_seg, sv, x, box_mode=m, **kw))

    out = {"n_eval_slices": int(keep.sum())}
    for name, fn in arm_fns():
        m, b1, b2 = fn(raw_u8)
        tgt = _kernel_mask(inf_u8, b1, b2, (d, d // 2)) / 255.0 > 0.5
        out[f"dice_{name}"] = _dice(m, tgt)
        print(f"{name}: dice {out[f'dice_{name}']:.4f}", flush=True)

    b_, s_ = 256, 256
    raws = [jax.device_put(jnp.asarray(
        rng.integers(0, 256, (b_, s_, s_), dtype=np.uint8))) for _ in range(3)]
    for name, fn in arm_fns():
        jfn = jax.jit(lambda x, f=fn: f(x)[0])
        t = timed(jfn, raws)
        out[f"ms_per_{b_}_{name}"] = round(t * 1e3, 1)
        out[f"slices_per_s_{name}"] = round(b_ / t, 1)
        print(f"{name}: {t*1e3:7.1f} ms/{b_}  {b_/t:6.0f} slices/s", flush=True)

    os.makedirs("artifacts_tpu", exist_ok=True)
    with open("artifacts_tpu/round4_bisect_boxes.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts_tpu/round4_bisect_boxes.json")


if __name__ == "__main__":
    main()
