"""One-stop classifier overhead reduction (VERDICT r3 item 6).

Round-3 measurement (round3_one_stop.json): the task2 classifier costs
+18.7% chain wall-clock per dispatch for ~3% of the chain's FLOPs — its
16/32-channel convs sit at the C<128 lane ceiling (structural,
profile_decoder_pack2), so time scales with SPATIAL POSITIONS, not FLOPs.
The int8 classifier measured SLOWER than bf16 (tiny convs are latency
bound; quant ops add work). The lever left is resolution: a 112² classifier
quarters the positions. This profiles `one_stop_infer(cls_hw=(112,112))`
(one extra area-resize of the stage-3 crop feeds a 112-input classifier):

  - chained_bf16            — two U-Nets, no classifier (baseline)
  - one_stop_cls224         — the round-3 number (re-measured)
  - one_stop_cls112         — classifier at 112² (random-init head:
                              timing-only; quality measured separately by
                              quality_cls_transfer.py arm aug_batch_112)
  - fast112_* variants      — the same three on the --lung-dim 112 preset

Timing: batch 256 of 256² slices, distinct-buffer amortized protocol
(scripts/_timing.py). Writes artifacts_tpu/round4_cls_overhead.json.
"""

import glob
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
from onestop_tpu.models import ClassifierCNN
from onestop_tpu.production import chained_infer, one_stop_infer
from onestop_tpu.train.checkpoint import load_model_variables as _load


def main():
    task1, task2, task3 = (C.task1_holdout(), C.task2_classification(),
                           C.task3_lung())
    d = task1.preprocess.new_dim
    m2 = task2.model

    lung_model = R._build_unet(task3)
    seg_model = R._build_unet(task1)
    lung_vars = _load(lung_model,
                      "artifacts_tpu/q2_chain/unet_lung_fullframe_0.9907.msgpack",
                      (d, d))
    seg_vars = _load(seg_model,
                     "artifacts_tpu/q2_chain/unet_infection_for_chain_0.8759.msgpack",
                     (d, d))

    def cls(in_dim):
        model = ClassifierCNN(widths=tuple(m2.cls_widths), dense=m2.cls_dense,
                              dropout=m2.cls_dropout, dtype=jnp.bfloat16)
        return model, model.init(
            {"params": jax.random.PRNGKey(2)},
            jnp.zeros((1, in_dim, in_dim, 1), jnp.float32), train=False)

    cls224, v224 = cls(d)
    ckpts = sorted(glob.glob(
        "artifacts_tpu/q2_cls_balanced/covid_classifier_*.msgpack"))
    if ckpts:  # trained 224 weights when present (timing identical)
        v224 = _load(cls224, ckpts[-1], (d, d))
    cls112, v112 = cls(112)
    cls56, v56 = cls(56)

    b_, s_ = 256, 256
    rng = np.random.default_rng(0)
    raws = [jax.device_put(jnp.asarray(
        rng.integers(0, 256, (b_, s_, s_), dtype=np.uint8))) for _ in range(3)]

    out = {}
    for preset, lung_hw in (("", None), ("fast112_", (112, 112))):
        kw = dict(model_hw=(d, d), threshold=0.5, lung_hw=lung_hw)
        arms = {
            f"{preset}chained_bf16": jax.jit(lambda x, kw=kw: chained_infer(
                lung_model, lung_vars, seg_model, seg_vars, x, **kw)[0]),
            f"{preset}one_stop_cls224": jax.jit(lambda x, kw=kw: one_stop_infer(
                lung_model, lung_vars, seg_model, seg_vars, cls224, v224,
                x, **kw)[:2]),
            f"{preset}one_stop_cls112": jax.jit(lambda x, kw=kw: one_stop_infer(
                lung_model, lung_vars, seg_model, seg_vars, cls112, v112,
                x, cls_hw=(112, 112), **kw)[:2]),
            f"{preset}one_stop_cls56": jax.jit(lambda x, kw=kw: one_stop_infer(
                lung_model, lung_vars, seg_model, seg_vars, cls56, v56,
                x, cls_hw=(56, 56), **kw)[:2]),
        }
        for name, fn in arms.items():
            t = timed(fn, raws)
            out[f"ms_per_{b_}_{name}"] = round(t * 1e3, 1)
            out[f"slices_per_s_{name}"] = round(b_ / t, 1)
            print(f"{name:24s}: {t*1e3:7.1f} ms/{b_}  {b_/t:6.0f} slices/s",
                  flush=True)
        base = out[f"ms_per_{b_}_{preset}chained_bf16"]
        for v in ("cls224", "cls112", "cls56"):
            out[f"{preset}overhead_pct_{v}"] = round(
                100.0 * (out[f"ms_per_{b_}_{preset}one_stop_{v}"] / base - 1.0), 2)
        print(json.dumps({k: v for k, v in out.items() if k.startswith(
            f"{preset}overhead")}), flush=True)

    os.makedirs("artifacts_tpu", exist_ok=True)
    with open("artifacts_tpu/round4_cls_overhead.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts_tpu/round4_cls_overhead.json")


if __name__ == "__main__":
    main()
