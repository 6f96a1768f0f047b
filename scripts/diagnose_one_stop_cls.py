"""Why did the r3 one-stop runner's chain-served classifier AUC read 0.295?

The runner's held-out case has 22 infected / 2 clean slices (round3_one_stop
_runner.json) — an AUC over 44 pos/neg pairs, dominated by where exactly two
clean edge slices land. This script separates the two candidate causes:

  a) crop-frame shift: classifier trained on GT-box crops, chain serves
     predicted-box crops → compare probs on BOTH crops slice by slice;
  b) the classifier itself mis-ranking the clean slices even in its own
     training frame (GT boxes).

Rebuilds the runner's exact dataset (infected_fraction=0.5 — CLAUDE.md:
a mismatched rebuild silently reads as a regression) and loads the
r3_one_stop checkpoints. Writes artifacts_tpu/round3_one_stop_cls_diag.json.
"""

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import _timing  # noqa: F401,E402

import jax
import jax.numpy as jnp

from onestop_tpu import config as C
from onestop_tpu import runners as R
from onestop_tpu.data.ingest import _kernel_boxes, _to_u8
from onestop_tpu.metrics.classification import roc_auc
from onestop_tpu.models import ClassifierCNN
from onestop_tpu.ops.pipeline import serving_preproc
from onestop_tpu.production import one_stop_infer
from onestop_tpu.train.checkpoint import load_checkpoint

KW = dict(n_synthetic=16, synth_hw=512, synth_slices=40, seed=7,
          infected_fraction=0.5)
OUT = "artifacts_tpu/r3_one_stop"


def _load(model, pattern, in_hw):
    path = sorted(glob.glob(pattern))[-1]
    tmpl = model.init({"params": jax.random.PRNGKey(0)},
                      jnp.zeros((1,) + in_hw + (1,), jnp.float32), train=False)
    params, bstats = load_checkpoint(path, tmpl["params"],
                                     tmpl.get("batch_stats", {}))
    return {"params": params, "batch_stats": bstats}


def main():
    task1, task2, task3 = (C.task1_holdout(), C.task2_classification(),
                           C.task3_lung())
    d = task1.preprocess.new_dim
    m2 = task2.model

    lung_model = R._build_unet(task3)
    seg_model = R._build_unet(task1)
    cls_model = ClassifierCNN(widths=tuple(m2.cls_widths), dense=m2.cls_dense,
                              dropout=m2.cls_dropout, dtype=jnp.bfloat16)
    lung_vars = _load(lung_model, f"{OUT}/unet_lung_fullframe_*.msgpack", (d, d))
    seg_vars = _load(seg_model, f"{OUT}/unet_infection_for_chain_*.msgpack", (d, d))
    cls_vars = _load(cls_model, f"{OUT}/covid_classifier_*.msgpack", (d, d))

    triples = list(R._case_slice_triples(None, task1.preprocess, **KW))
    ct_e, lung_e, inf_e = triples[-1]
    keep = (lung_e > 0).reshape(len(lung_e), -1).max(axis=1) > 0
    raw_u8 = jnp.asarray(_to_u8(ct_e[keep]))
    lung01 = jnp.asarray((lung_e[keep] > 0).astype(np.float32))
    y_true = (inf_e[keep] > 0).reshape(int(keep.sum()), -1).max(axis=1)

    # chain-served probs (predicted boxes)
    _, probs_chain, _, _ = one_stop_infer(
        lung_model, lung_vars, seg_model, seg_vars, cls_model, cls_vars,
        raw_u8, model_hw=(d, d), threshold=0.5)
    probs_chain = np.asarray(probs_chain, np.float64)

    # GT-box crops — the classifier's training frame
    gb1, gb2, _ = _kernel_boxes(lung01, (d, d // 2))
    x_gt = serving_preproc(raw_u8, gb1, gb2, (d, d))
    probs_gt = np.asarray(
        cls_model.apply(cls_vars, x_gt.astype(jnp.bfloat16), train=False)[:, 0],
        np.float64)

    neg = np.where(~y_true)[0]
    out = {
        "n_eval": int(len(y_true)), "n_negative": int((~y_true).sum()),
        "auc_chain_boxes": float(roc_auc(jnp.asarray(y_true, jnp.float32),
                                         jnp.asarray(probs_chain, jnp.float32))),
        "auc_gt_boxes": float(roc_auc(jnp.asarray(y_true, jnp.float32),
                                      jnp.asarray(probs_gt, jnp.float32))),
        "neg_slice_idx": neg.tolist(),
        "neg_probs_chain": probs_chain[neg].tolist(),
        "neg_probs_gt": probs_gt[neg].tolist(),
        "pos_prob_chain_min_med_max": [float(f(probs_chain[y_true]))
                                       for f in (np.min, np.median, np.max)],
        "pos_prob_gt_min_med_max": [float(f(probs_gt[y_true]))
                                    for f in (np.min, np.median, np.max)],
        "mean_abs_prob_shift_chain_vs_gt": float(
            np.abs(probs_chain - probs_gt).mean()),
    }
    print(json.dumps(out, indent=2), flush=True)
    with open("artifacts_tpu/round3_one_stop_cls_diag.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
