"""Quantify the serving-vs-training preprocessing skew on the real TPU.

The infection model trains on the reference's dataset geometry — crop each
lung to (250, 125) INTER_AREA, hstack, resize to 224 INTER_LINEAR, uint8
truncate, /255 (``data/ingest.py``). The serving chain (``ops.pipeline``)
crops straight to (224, 112) tiles in one INTER_AREA resample — same
geometry, different resampling path, so pixel values differ slightly. This
script measures what that does to the masks, using the trained chain
checkpoint and the same phantoms the chain quality run used.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _timing import timed  # noqa: F401,E402  (sets repo path + compile cache)

import jax
import jax.numpy as jnp

from onestop_tpu import config as C
from onestop_tpu.data.ingest import (
    _kernel_boxes, _kernel_ct, _kernel_mask, _resize_batch_linear, _to_u8,
    _trunc_uint8)
from onestop_tpu.models import UNet
from onestop_tpu.ops.pipeline import fused_infer
from onestop_tpu.runners import _case_slice_triples
from onestop_tpu.train.checkpoint import load_checkpoint


def dice(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float((2 * (a * b).sum() + 1.0) / (a.sum() + b.sum() + 1.0))


def main():
    pre = C.task1_holdout().preprocess
    triples = list(_case_slice_triples(None, pre, n_synthetic=16, synth_hw=512,
                                       synth_slices=40, seed=7))
    ct_e, lung_e, inf_e = triples[-1]  # the chain run's held-out case
    lungs_bin = lung_e > 0
    keep = lungs_bin.reshape(len(lungs_bin), -1).max(axis=1) > 0
    raw_u8 = jnp.asarray(_to_u8(ct_e[keep]))
    inf_u8 = jnp.asarray(_to_u8(inf_e[keep]))
    d = pre.new_dim

    model = UNet(dtype=jnp.bfloat16)
    tmpl = model.init({"params": jax.random.PRNGKey(0)},
                      jnp.zeros((1, d, d, 1)), train=False)
    params, bstats = load_checkpoint(
        "artifacts_tpu/q2_chain/unet_infection_for_chain_0.8759.msgpack",
        tmpl["params"], tmpl["batch_stats"])
    variables = {"params": params, "batch_stats": bstats}

    b1, b2, _ = _kernel_boxes(jnp.asarray(lungs_bin[keep], jnp.float32), (d, d // 2))
    t = 0.599  # the checkpoint's best_threshold

    # serving path: direct (224, 112) INTER_AREA crop inside fused_infer
    probs_serve = np.asarray(fused_infer(model, variables, raw_u8, b1, b2,
                                         out_hw=(d, d), threshold=None))[..., 0]

    # training path: (250,125) crop -> 224 INTER_LINEAR -> uint8 -> /255
    crops = np.asarray(_kernel_ct(raw_u8, b1, b2, tuple(pre.crop_tile)))
    x_train = _trunc_uint8(_resize_batch_linear(crops, d)).astype(np.float32) / 255.0
    probs_train = np.asarray(model.apply(variables, jnp.asarray(x_train)[..., None],
                                         train=False))[..., 0]

    # targets via the dataset path (the frame both preprocs approximate)
    tgt = np.asarray(_kernel_mask(inf_u8, b1, b2, tuple(pre.crop_tile)))
    tgt = (_trunc_uint8(_resize_batch_linear(tgt, d)).astype(np.float32) / 255.0) > 0.5

    m_serve = probs_serve > t
    m_train = probs_train > t
    print(f"n_slices={int(keep.sum())}  threshold={t}")
    print(f"prob |delta| mean={np.abs(probs_serve - probs_train).mean():.5f} "
          f"max={np.abs(probs_serve - probs_train).max():.4f}")
    print(f"mask agreement serve-vs-train: {(m_serve == m_train).mean():.5f}")
    print(f"dice(serve mask, train mask) : {dice(m_serve, m_train):.5f}")
    print(f"dice vs GT — serving path    : {dice(m_serve, tgt):.5f}")
    print(f"dice vs GT — training path   : {dice(m_train, tgt):.5f}")


if __name__ == "__main__":
    main()
