"""Mask-derived classification on the transfer bed (VERDICT r3 item 5).

quality_cls_transfer.py measures the task2 classifier's volume-level
transfer: saturated sigmoids and held-out AUC ~0.74 pooled (round 4, 22
train volumes, diversified negatives) — better than round 3's 0.63 but
short of the 0.9 bar. The segmentation stage, by contrast, is the part of
the chain that transfers (chained dice ~0.94 on unseen volumes), and the
one-stop chain computes an infection mask for every slice anyway. This
study scores the ZERO-COST alternative classifier on the identical
held-out volumes: per-slice predicted-mask statistics from the no-GT chain
(the twin study's checkpoints — plain-trained, ld112 stage 1):

  - auc_mask_area   — thresholded-mask pixel count
  - auc_prob_mass   — sum of sigmoid probabilities (soft area)
  - auc_prob_max    — max probability (any-confident-pixel)

vs the task2 classifier's pooled 0.74 on the same bed. Labels are the
reference's per-slice emptiness rule (task2:413-418) on raw infection
masks. Writes artifacts_tpu/round4_cls_mask_auc.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import dataclasses

import jax.numpy as jnp

from onestop_tpu import config as C
from onestop_tpu import runners as R
from onestop_tpu.data.ingest import _to_u8
from onestop_tpu.metrics.classification import roc_auc
from onestop_tpu.production import chained_infer
from onestop_tpu.train.checkpoint import load_model_variables

# the quality_cls_transfer.py bed — imported, not copied, so the two
# studies cannot silently diverge if the bed is ever tuned
from quality_cls_transfer import KW, N_HELDOUT


def _classifier_baseline():
    """The task2 classifier's measured held-out pooled AUC on this bed,
    read from the transfer study's artifact (None if it hasn't run)."""
    try:
        with open("artifacts_tpu/round4_cls_transfer.json") as f:
            return json.load(f)["arms"]["no_aug"]["heldout_auc_pooled"]
    except (OSError, KeyError, TypeError, ValueError):
        return None


def main():
    task1, task3 = C.task1_holdout(), C.task3_lung()
    d = task1.preprocess.new_dim
    t3 = dataclasses.replace(
        task3, preprocess=dataclasses.replace(task3.preprocess, new_dim=112),
        model=dataclasses.replace(task3.model, in_size=112))
    lung_model = R._build_unet(t3)
    seg_model = R._build_unet(task1)
    lung_vars = load_model_variables(
        lung_model,
        "artifacts_tpu/r4_chain_ld112_twin/unet_lung_fullframe_0.9833.msgpack",
        (112, 112))
    seg_vars = load_model_variables(
        seg_model,
        "artifacts_tpu/r4_chain_ld112_twin/unet_infection_for_chain_0.8772.msgpack",
        (d, d))

    triples = list(R._case_slice_triples(None, task1.preprocess, **KW))
    ho = triples[-N_HELDOUT:]

    y_all, area, mass, pmax = [], [], [], []
    per_vol = []
    for ct_s, lung_s, inf_s in ho:
        raw = jnp.asarray(_to_u8(ct_s))
        probs, _, _ = chained_infer(
            lung_model, lung_vars, seg_model, seg_vars, raw,
            model_hw=(d, d), threshold=None, lung_hw=(112, 112))
        p = np.asarray(probs, np.float64)[..., 0]
        y = (np.asarray(inf_s).reshape(len(inf_s), -1) > 0).any(axis=1)
        a = (p > 0.5).reshape(len(p), -1).sum(axis=1)
        m = p.reshape(len(p), -1).sum(axis=1)
        x = p.reshape(len(p), -1).max(axis=1)
        y_all.append(y.astype(np.float32))
        area.append(a); mass.append(m); pmax.append(x)
        per_vol.append({
            "n": int(len(y)), "n_pos": int(y.sum()),
            "auc_mask_area": (float(roc_auc(y.astype(np.float32),
                                            a.astype(np.float32)))
                              if 0 < y.sum() < len(y) else None),
        })
        print(json.dumps(per_vol[-1]), flush=True)

    y_all = np.concatenate(y_all)
    out = {
        "kw": {k: (list(v) if isinstance(v, tuple) else v)
               for k, v in KW.items()},
        "n_heldout_slices": int(len(y_all)),
        "heldout_balance": [int((y_all == 0).sum()), int((y_all == 1).sum())],
        "auc_mask_area": float(roc_auc(y_all, np.concatenate(area).astype(np.float32))),
        "auc_prob_mass": float(roc_auc(y_all, np.concatenate(mass).astype(np.float32))),
        "auc_prob_max": float(roc_auc(y_all, np.concatenate(pmax).astype(np.float32))),
        "per_volume": per_vol,
        "classifier_pooled_auc_same_bed": _classifier_baseline(),
        "checkpoints": "r4_chain_ld112_twin (plain-trained)",
    }
    print(json.dumps(out), flush=True)
    os.makedirs("artifacts_tpu", exist_ok=True)
    with open("artifacts_tpu/round4_cls_mask_auc.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts_tpu/round4_cls_mask_auc.json")


if __name__ == "__main__":
    main()
