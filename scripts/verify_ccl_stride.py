"""Quality + throughput A/B for the round-3 chained-pipeline optimizations
(CLAHE dedupe + coarse-CCL boxes, production.chained_infer ccl_stride).

Loads the round-2 chain checkpoints (artifacts_tpu/q2_chain), rebuilds the
same held-out phantom case (16 cases, seed 7 — the last case is the eval
case, exactly as runner_production_chain splits), and reports:
  - chained dice vs the cropped GT for ccl_stride in {1, 2},
  - box deltas between the two strides,
  - end-to-end chained_infer ms/256 for both strides (timed protocol from
    scripts/_timing.py) — the number behind bench.py --chained.

Writes artifacts_tpu/round3_ccl_stride.json.
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
from onestop_tpu.data.ingest import _kernel_boxes, _kernel_mask, _to_u8
from onestop_tpu.production import chained_infer
from onestop_tpu.train.checkpoint import load_checkpoint

KW = dict(n_synthetic=16, synth_hw=512, synth_slices=40, seed=7)


def _load(model, path, in_hw):
    tmpl = model.init({"params": jax.random.PRNGKey(0)},
                      jnp.zeros((1,) + in_hw + (1,), jnp.float32), train=False)
    params, bstats = load_checkpoint(path, tmpl["params"],
                                     tmpl.get("batch_stats", {}))
    return {"params": params, "batch_stats": bstats}


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

    lung_model = R._build_unet(task3)
    seg_model = R._build_unet(task1)
    lung_vars = _load(lung_model,
                      "artifacts_tpu/q2_chain/unet_lung_fullframe_0.9907.msgpack",
                      (d, d))
    seg_vars = _load(seg_model,
                     "artifacts_tpu/q2_chain/unet_infection_for_chain_0.8759.msgpack",
                     (d, d))

    out = {"n_eval_slices": int(keep.sum())}
    masks = {}
    for s in (1, 2):
        m, b1, b2 = chained_infer(lung_model, lung_vars, seg_model, seg_vars,
                                  raw_u8, model_hw=(d, d), threshold=0.5,
                                  ccl_stride=s)
        tgt = _kernel_mask(inf_u8, b1, b2, (d, d // 2)) / 255.0 > 0.5
        masks[s] = (np.asarray(m), np.asarray(b1), np.asarray(b2))
        out[f"dice_stride{s}"] = _dice(m, tgt)
    out["dice_delta"] = out["dice_stride1"] - out["dice_stride2"]
    out["max_box_delta_px"] = float(np.max(np.abs(
        np.concatenate([masks[1][1] - masks[2][1], masks[1][2] - masks[2][2]], 0))))
    print(json.dumps(out), flush=True)

    # throughput: batch 256 of 256^2 raw slices, 3 fresh buffers
    b_, s_ = 256, 256
    rng = np.random.default_rng(0)
    raws = [jax.device_put(jnp.asarray(
        rng.integers(0, 256, (b_, s_, s_), dtype=np.uint8))) for _ in range(3)]
    for s in (1, 2):
        fn = jax.jit(lambda x, s=s: chained_infer(
            lung_model, lung_vars, seg_model, seg_vars, x,
            model_hw=(d, d), threshold=0.5, ccl_stride=s)[0])
        t = timed(fn, raws)
        out[f"ms_per_{b_}_stride{s}"] = t * 1e3
        out[f"slices_per_s_stride{s}"] = b_ / t
        print(f"stride {s}: {t*1e3:7.1f} ms/{b_}  {b_/t:6.0f} slices/s", flush=True)

    os.makedirs("artifacts_tpu", exist_ok=True)
    with open("artifacts_tpu/round3_ccl_stride.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts_tpu/round3_ccl_stride.json")


if __name__ == "__main__":
    main()
