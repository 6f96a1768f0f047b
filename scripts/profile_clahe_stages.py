"""Sub-profile CLAHE stages + U-Net variants on the real TPU.

Usage: python scripts/profile_clahe_stages.py [--batch 1024]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _timing import timed  # noqa: E402  (also sets repo path + compile cache)


import jax
import jax.numpy as jnp

from onestop_tpu.ops.clahe_pallas import (
    tile_histograms, tile_histograms_nibble, _finalize_luts,
    _apply_luts_pallas, clahe_fused)



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    B, s = args.batch, 256
    rng = np.random.default_rng(0)

    imgs = [jax.device_put(jnp.asarray(
        rng.integers(0, 256, (B, s, s), dtype=np.uint8))) for _ in range(args.iters)]
    luts = [jax.device_put(jnp.asarray(
        rng.integers(0, 256, (B, 64, 256), dtype=np.uint8))) for _ in range(args.iters)]
    hists = [jax.device_put(jnp.asarray(
        rng.integers(0, 16, (B, 64, 256)).astype(np.float32))) for _ in range(args.iters)]

    t_hist = timed(jax.jit(lambda x: tile_histograms(x)), [(x,) for x in imgs])
    t_nib = timed(jax.jit(lambda x: tile_histograms_nibble(x)), [(x,) for x in imgs])
    t_fin = timed(jax.jit(lambda h: _finalize_luts(h, 3.0, 32 * 32)), [(h,) for h in hists])
    t_apply = timed(jax.jit(lambda x, l: _apply_luts_pallas(x, l)),
                    list(zip(imgs, luts)))
    t_full = timed(jax.jit(lambda x: clahe_fused(x)), [(x,) for x in imgs])

    print(f"batch={B} backend={jax.default_backend()}")
    print(f"hist strip      : {t_hist*1e3:7.1f} ms/batch")
    print(f"hist nibble     : {t_nib*1e3:7.1f} ms/batch")
    print(f"finalize (XLA)  : {t_fin*1e3:7.1f} ms/batch")
    print(f"apply (pallas)  : {t_apply*1e3:7.1f} ms/batch")
    print(f"clahe_fused     : {t_full*1e3:7.1f} ms/batch")

    # on-chip bit-parity spot check vs cv2 (compiled Mosaic, not interpret)
    import cv2
    small = rng.integers(0, 256, (4, s, s), dtype=np.uint8)
    got = np.asarray(clahe_fused(jnp.asarray(small)))
    for i in range(4):
        ref = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8)).apply(small[i])
        assert np.array_equal(got[i], ref), f"cv2 mismatch on image {i}"
    print("cv2 bit-parity on TPU: OK")


if __name__ == "__main__":
    main()
