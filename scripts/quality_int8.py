"""Int8 serving quality study (VERDICT r2 next-round #3): per-task delta
table int8-vs-bf16 on the round-2 trained checkpoints, full-fidelity
phantoms, real TPU.

For each family (task1 U-Net, task1 U-Net++, task3 lung U-Net: dice; task2
classifier: AUC/accuracy), loads the q2 checkpoint, rebuilds the identical
dataset (cache_r2 where the key matches), runs the bf16 and generic-int8
forward on the val split, and reports:
  - best-sweep dice (bf16) at its best threshold,
  - int8 dice at the SAME threshold (the deployment swap: threshold tuned
    on bf16, served int8),
  - int8 best-sweep dice (re-tuned),
  - mask agreement at the bf16 threshold, mean |prob delta|.

Acceptance criterion (promotion gate, RESULTS.md): int8 may ship for a task
when dice/AUC at the bf16-tuned threshold is within 0.005 of bf16 and mask
agreement > 99%.

Writes artifacts_tpu/round3_int8_quality.json.
"""

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _timing import timed  # noqa: E402  (sets repo path + compile cache)

import jax
import jax.numpy as jnp

from onestop_tpu import config as C
from onestop_tpu import runners as R
from onestop_tpu.data.splits import (stratified_shuffle_split_indices,
                                     train_test_split_indices)
from onestop_tpu.metrics.classification import roc_auc
from onestop_tpu.metrics.segmentation import sweep_report
from onestop_tpu.models import ClassifierCNN, UNet, UNetPP
from onestop_tpu.serve_int8 import apply_int8_model, quantize_model
from onestop_tpu.train.checkpoint import load_checkpoint

KW = dict(n_synthetic=16, synth_hw=512, synth_slices=40, seed=7)
CACHE = "artifacts_tpu/cache_r2"


def batched_apply(fn, x, bs=32):
    n = len(x)
    steps = -(-n // bs)
    pad = steps * bs - n
    xp = jnp.concatenate([jnp.asarray(x), jnp.zeros((pad,) + x.shape[1:], jnp.float32)])
    xp = xp.reshape((steps, bs) + x.shape[1:])
    out = jax.lax.map(fn, xp)
    return np.asarray(out.reshape((steps * bs,) + out.shape[2:])[:n])


def seg_study(name, model, ckpt_glob, x, y, cal_n=32):
    tr_idx, te_idx = train_test_split_indices(len(x), 0.3, 42)
    x_tr, x_val, y_val = x[tr_idx], x[te_idx], y[te_idx]
    tmpl = model.init({"params": jax.random.PRNGKey(0)},
                      jnp.zeros((1,) + x.shape[1:], jnp.float32), train=False)
    ckpt = sorted(glob.glob(ckpt_glob))[-1]
    params, bstats = load_checkpoint(ckpt, tmpl["params"], tmpl.get("batch_stats", {}))
    v = {"params": params, "batch_stats": bstats}

    bf16 = jax.jit(lambda xb: model.apply(v, xb, train=False))
    q = quantize_model(model, v, jnp.asarray(x_tr[:cal_n], jnp.float32))
    int8 = jax.jit(lambda xb: apply_int8_model(model, q, v, xb))

    p_bf16 = batched_apply(bf16, x_val)
    p_int8 = batched_apply(int8, x_val)

    rep_b = sweep_report(y_val, p_bf16)
    rep_i = sweep_report(y_val, p_int8)
    t = rep_b["best_threshold"]
    # int8 dice at the bf16-tuned threshold
    i_at_t = float(np.interp(t, rep_i["fine"]["thresholds"], rep_i["fine"]["dice"]))
    agree = float(((p_bf16 > t) == (p_int8 > t)).mean())
    out = {
        "checkpoint": ckpt,
        "bf16_best_dice": rep_b["best_dice"],
        "bf16_best_threshold": t,
        "int8_dice_at_bf16_threshold": i_at_t,
        "int8_best_dice": rep_i["best_dice"],
        "int8_best_threshold": rep_i["best_threshold"],
        "dice_delta_at_threshold": rep_b["best_dice"] - i_at_t,
        "mask_agreement": agree,
        "mean_abs_prob_delta": float(np.abs(p_bf16 - p_int8).mean()),
        "n_val": int(len(x_val)),
    }
    print(name, json.dumps(out), flush=True)
    return out


def cls_study(name, ckpt_glob, x, y, cal_n=32):
    tr_idx, te_idx = stratified_shuffle_split_indices(y, 0.3, 42)
    x_tr, x_val, y_val = x[tr_idx], x[te_idx], y[te_idx]
    m = C.task2_classification().model
    model = ClassifierCNN(widths=tuple(m.cls_widths), dense=m.cls_dense,
                          dropout=m.cls_dropout, dtype=jnp.bfloat16)
    tmpl = model.init({"params": jax.random.PRNGKey(0)},
                      jnp.zeros((1,) + x.shape[1:], jnp.float32), train=False)
    ckpt = sorted(glob.glob(ckpt_glob))[-1]
    params, bstats = load_checkpoint(ckpt, tmpl["params"], tmpl.get("batch_stats", {}))
    v = {"params": params, "batch_stats": bstats}

    bf16 = jax.jit(lambda xb: model.apply(v, xb, train=False))
    q = quantize_model(model, v, jnp.asarray(x_tr[:cal_n], jnp.float32))
    int8 = jax.jit(lambda xb: apply_int8_model(model, q, v, xb))
    p_b = batched_apply(bf16, x_val).ravel()
    p_i = batched_apply(int8, x_val).ravel()
    out = {
        "checkpoint": ckpt,
        "bf16_auc": float(roc_auc(jnp.asarray(y_val), jnp.asarray(p_b))),
        "int8_auc": float(roc_auc(jnp.asarray(y_val), jnp.asarray(p_i))),
        "label_agreement@0.5": float(((p_b > 0.5) == (p_i > 0.5)).mean()),
        "mean_abs_prob_delta": float(np.abs(p_b - p_i).mean()),
        "n_val": int(len(x_val)),
    }
    print(name, json.dumps(out), flush=True)
    return out


def main():
    # optional: names of studies to (re)run; others keep their values from an
    # existing artifacts_tpu/round3_int8_quality.json
    only = set(sys.argv[1:])
    out = {}
    if only and os.path.exists("artifacts_tpu/round3_int8_quality.json"):
        with open("artifacts_tpu/round3_int8_quality.json") as f:
            out = json.load(f)

    def want(name):
        return not only or name in only

    task1 = C.task1_holdout()
    unet = UNet(dtype=jnp.bfloat16)
    if want("task1_unet") or want("task1_unetpp"):
        x, y = R._seg_data(None, None, task1, CACHE, "task1", dict(KW))
    if want("task1_unet"):
        out["task1_unet"] = seg_study(
            "task1_unet", unet,
            "artifacts_tpu/q2_holdout/unet_covid_holdout_*.msgpack", x, y)

    if want("task1_unetpp"):
        m = C.task1_unetpp().model
        unetpp = UNetPP(widths=tuple(m.unetpp_widths),
                        backbone_dropout=m.unetpp_backbone_dropout,
                        block_dropout=m.unetpp_block_dropout, dtype=jnp.bfloat16)
        out["task1_unetpp"] = seg_study(
            "task1_unetpp", unetpp,
            "artifacts_tpu/q2_unetpp/unetpp_covid_holdout_*.msgpack", x, y)

    # task3 trains on the LUNG-target dataset (build_lung_dataset), not the
    # infection one, and its q2 checkpoint was trained on 8 cases — rebuild
    # exactly what the checkpoint saw
    task3 = C.task3_lung()
    kw3 = dict(KW, n_synthetic=8)

    if want("task3_lung"):
        def _build_t3():
            from onestop_tpu.data import build_lung_dataset
            pairs = list(R._case_slice_triples(None, task3.preprocess,
                                               with_infection=False, **kw3))
            return build_lung_dataset(pairs, task3.preprocess)

        x3, y3 = R._maybe_cached(_build_t3, CACHE, "task3", task3.preprocess,
                                 ("cts_cropped_lungs_224", "lungs_cropped_224"),
                                 source_key=R._source_key(None, kw3))
        out["task3_lung"] = seg_study(
            "task3_lung", unet,
            "artifacts_tpu/q2_task3/unet_lung_segmentation_*.msgpack", x3, y3)

    # the q2 'balanced' classifier checkpoint trained on infected_fraction=0.5
    kw2 = dict(KW, infected_fraction=0.5)

    if want("task2_classifier"):
        def _build_cls():
            t = list(R._case_slice_triples(
                None, C.task2_classification().preprocess, **kw2))
            from onestop_tpu.data import build_classification_dataset
            return build_classification_dataset(
                t, C.task2_classification().preprocess)

        x2, y2 = R._maybe_cached(_build_cls, CACHE, "task2",
                                 C.task2_classification().preprocess,
                                 ("cts_cropped_lungs_224", "y_label"),
                                 source_key=R._source_key(None, kw2))
        out["task2_classifier"] = cls_study(
            "task2_classifier", "artifacts_tpu/q2_cls*/covid_classifier_*.msgpack",
            x2, np.asarray(y2, np.float32))

    gate = lambda r: (r.get("dice_delta_at_threshold", 0.0) < 0.005
                      and r.get("mask_agreement", 1.0) > 0.99)
    out["promotion_gate"] = {
        k: bool(gate(r)) for k, r in out.items() if isinstance(r, dict) and "checkpoint" in r}

    os.makedirs("artifacts_tpu", exist_ok=True)
    with open("artifacts_tpu/round3_int8_quality.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts_tpu/round3_int8_quality.json")


if __name__ == "__main__":
    main()
