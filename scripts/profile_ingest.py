"""Dataset-build wall-clock on the real TPU: exact-XLA CLAHE ingest path vs
the Pallas-routed path (VERDICT r1 #10 before/after), plus a train-step A/B
of the s2d stem."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _timing import timed  # noqa: E402  (also sets repo path + compile cache)


import jax
import jax.numpy as jnp

from onestop_tpu import config as C
from onestop_tpu.data import ingest
from onestop_tpu.runners import _case_slice_triples


def build(pairs, cfg):
    t0 = time.perf_counter()
    x, y = ingest.build_segmentation_dataset(pairs, cfg)
    return time.perf_counter() - t0, x.shape


def main():
    cfg = C.PreprocessConfig()
    pairs = list(_case_slice_triples(None, cfg, n_synthetic=8, synth_hw=512,
                                     synth_slices=24, seed=3))

    # round-1 path: exact XLA CLAHE, chunk 8
    orig_chunk, orig_pallas = ingest._chunk_size, ingest._use_pallas_clahe
    ingest._chunk_size = lambda: 8
    ingest._use_pallas_clahe = lambda: False
    dt_old, shp = build(pairs, cfg)  # includes compile on first chunk shape
    dt_old2, _ = build(pairs, cfg)   # warm
    print(f"ingest exact-XLA chunk=8 : {dt_old:6.1f} s cold, {dt_old2:6.1f} s warm  -> {shp}", flush=True)

    ingest._chunk_size, ingest._use_pallas_clahe = orig_chunk, orig_pallas
    dt_new, shp = build(pairs, cfg)
    dt_new2, _ = build(pairs, cfg)
    print(f"ingest pallas  chunk=64  : {dt_new:6.1f} s cold, {dt_new2:6.1f} s warm  -> {shp}", flush=True)

    # s2d stem: one training step, batch 32, 224^2 (inputs from HBM)
    from onestop_tpu.models import UNet
    from onestop_tpu.train.trainer import Trainer
    rng = np.random.default_rng(0)
    x = np.clip(rng.random((64, 224, 224, 1)), 0, 1).astype(np.float32)
    y = (rng.random((64, 224, 224, 1)) > 0.7).astype(np.float32)
    for stem in (False, True):
        model = UNet(dtype=jnp.bfloat16, s2d_stem=stem)
        tr = Trainer(model, C.TrainConfig(batch_size=32, epochs=1, schedule="constant"))
        st = tr.init_state(jax.random.PRNGKey(0), x.shape[1:])
        t0 = time.perf_counter()
        st, hist, best = tr.fit(st, x, y, x[:32], y[:32])
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(5):
            st, hist, best = tr.fit(st, x, y, x[:32], y[:32])
        dt = (time.perf_counter() - t0) / 5
        print(f"train epoch (2 steps+eval) stem={stem}: {dt*1e3:7.1f} ms warm "
              f"({warm:.1f} s first)", flush=True)


if __name__ == "__main__":
    main()
