"""Throughput + quality for the ONE-STOP chain (lung seg -> CCL boxes ->
crop -> infection seg + classification in one jit, production.one_stop_infer).

Quantifies the "classifier rides ~free" claim with real numbers: the delta
between chained_infer (two U-Nets) and one_stop_infer (two U-Nets + the
task2 classifier on the identical stage-3 crop) is the classifier's whole
marginal cost — there is no extra preprocessing. Also times the all-int8
one-stop (serve_int8.one_stop_infer_int8).

Quality: round-2 chain checkpoints (artifacts_tpu/q2_chain) + the balanced
task2 classifier (artifacts_tpu/q2_cls_balanced) evaluated on the same
held-out phantom case as verify_ccl_stride.py; per-slice infection labels
are "infection mask has any positive pixel" — exactly the reference's task2
label rule (task2_covid19_classifcation.py:413-418).

Writes artifacts_tpu/round3_one_stop.json.
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
from onestop_tpu.data.ingest import _to_u8
from onestop_tpu.metrics.classification import roc_auc
from onestop_tpu.models import ClassifierCNN
from onestop_tpu.production import chained_infer, one_stop_infer
from onestop_tpu.serve_int8 import one_stop_infer_int8, quantize_model
from onestop_tpu.train.checkpoint import load_checkpoint

KW = dict(n_synthetic=16, synth_hw=512, synth_slices=40, seed=7)


def _load(model, path, in_hw):
    tmpl = model.init({"params": jax.random.PRNGKey(0)},
                      jnp.zeros((1,) + in_hw + (1,), jnp.float32), train=False)
    params, bstats = load_checkpoint(path, tmpl["params"],
                                     tmpl.get("batch_stats", {}))
    return {"params": params, "batch_stats": bstats}


def main():
    task1, task2, task3 = (C.task1_holdout(), C.task2_classification(),
                           C.task3_lung())
    d = task1.preprocess.new_dim

    lung_model = R._build_unet(task3)
    seg_model = R._build_unet(task1)
    m2 = task2.model
    cls_model = ClassifierCNN(widths=tuple(m2.cls_widths), dense=m2.cls_dense,
                              dropout=m2.cls_dropout, dtype=jnp.bfloat16)
    lung_vars = _load(lung_model,
                      "artifacts_tpu/q2_chain/unet_lung_fullframe_0.9907.msgpack",
                      (d, d))
    seg_vars = _load(seg_model,
                     "artifacts_tpu/q2_chain/unet_infection_for_chain_0.8759.msgpack",
                     (d, d))
    cls_ckpt = sorted(glob.glob(
        "artifacts_tpu/q2_cls_balanced/covid_classifier_*.msgpack"))[-1]
    cls_vars = _load(cls_model, cls_ckpt, (d, d))

    # quality: held-out phantom case, one-stop outputs vs chained outputs
    triples = list(R._case_slice_triples(None, task1.preprocess, **KW))
    ct_e, lung_e, inf_e = triples[-1]
    keep = (lung_e > 0).reshape(len(lung_e), -1).max(axis=1) > 0
    raw_eval = jnp.asarray(_to_u8(ct_e[keep]))
    y_true = (inf_e[keep] > 0).reshape(int(keep.sum()), -1).max(axis=1)

    kw = dict(model_hw=(d, d), threshold=0.5)
    cm, cb1, cb2 = chained_infer(lung_model, lung_vars, seg_model, seg_vars,
                                 raw_eval, **kw)
    om, probs, ob1, ob2 = one_stop_infer(lung_model, lung_vars, seg_model,
                                         seg_vars, cls_model, cls_vars,
                                         raw_eval, **kw)
    probs = np.asarray(probs, np.float64)
    out = {
        "n_eval_slices": int(keep.sum()),
        "cls_ckpt": cls_ckpt,
        # the classifier must not perturb the segmentation stages
        "masks_boxes_identical_to_chained": bool(
            np.array_equal(np.asarray(cm), np.asarray(om))
            and np.array_equal(np.asarray(cb1), np.asarray(ob1))
            and np.array_equal(np.asarray(cb2), np.asarray(ob2))),
        "cls_accuracy_at_0.5": float(((probs > 0.5) == y_true).mean()),
        "cls_n_positive": int(y_true.sum()),
    }
    if 0 < y_true.sum() < len(y_true):
        out["cls_auc"] = float(roc_auc(
            jnp.asarray(y_true, jnp.float32), jnp.asarray(probs, jnp.float32)))
    print(json.dumps(out), flush=True)

    # throughput: batch 256 of 256^2 raw slices (bench.py --chained protocol)
    b_, s_ = 256, 256
    rng = np.random.default_rng(0)
    raws = [jax.device_put(jnp.asarray(
        rng.integers(0, 256, (b_, s_, s_), dtype=np.uint8))) for _ in range(3)]

    fn_chain = jax.jit(lambda x: chained_infer(
        lung_model, lung_vars, seg_model, seg_vars, x, **kw)[0])
    fn_one = jax.jit(lambda x: one_stop_infer(
        lung_model, lung_vars, seg_model, seg_vars, cls_model, cls_vars,
        x, **kw)[:2])

    x_cal = jnp.asarray(rng.random((8, d, d, 1)), jnp.float32)
    q_lung = quantize_model(lung_model, lung_vars, x_cal)
    q_seg = quantize_model(seg_model, seg_vars, x_cal)
    q_cls = quantize_model(cls_model, cls_vars, x_cal)
    fn_one8 = jax.jit(lambda x: one_stop_infer_int8(
        lung_model, q_lung, lung_vars, seg_model, q_seg, seg_vars,
        cls_model, q_cls, cls_vars, x, **kw)[:2])

    for name, fn in (("chained_bf16", fn_chain), ("one_stop_bf16", fn_one),
                     ("one_stop_int8", fn_one8)):
        t = timed(fn, raws)
        out[f"ms_per_{b_}_{name}"] = t * 1e3
        out[f"slices_per_s_{name}"] = b_ / t
        print(f"{name:14s}: {t*1e3:7.1f} ms/{b_}  {b_/t:6.0f} slices/s",
              flush=True)
    out["classifier_overhead_pct"] = 100.0 * (
        out[f"ms_per_{b_}_one_stop_bf16"] / out[f"ms_per_{b_}_chained_bf16"] - 1.0)

    os.makedirs("artifacts_tpu", exist_ok=True)
    with open("artifacts_tpu/round3_one_stop.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts_tpu/round3_one_stop.json")


if __name__ == "__main__":
    main()
