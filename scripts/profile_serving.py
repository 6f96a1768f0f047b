"""Component ablation timing for the fused serving pipeline on the real TPU.

Times, with the amortized distinct-buffer protocol from bench.py:
  1. CLAHE only            (Pallas hist + LUT apply)
  2. CLAHE + crop-resize   (adds the dynamic two-lung crop matmuls)
  3. U-Net only            (on a preformed (B, 224, 224, 1) tensor)
  4. full fused chain      (what bench.py measures)

Usage: python scripts/profile_serving.py [--batch 1024] [--iters 3]
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

from onestop_tpu.models import UNet
from onestop_tpu.ops.clahe_pallas import clahe_fused
from onestop_tpu.ops.crop import fuse_lung_crops
from onestop_tpu.ops.pipeline import fused_infer



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--in-hw", type=int, default=256)
    ap.add_argument("--out-hw", type=int, default=224)
    args = ap.parse_args()
    b, s, o = args.batch, args.in_hw, args.out_hw
    interpret = jax.default_backend() == "cpu"

    rng = np.random.default_rng(0)
    bufs_u8 = [jax.device_put(jnp.asarray(
        rng.integers(0, 256, (b, s, s), dtype=np.uint8))) for _ in range(args.iters)]
    bufs_f = [jax.device_put(jnp.asarray(
        rng.random((b, o, o, 1), dtype=np.float32))) for _ in range(args.iters)]
    b1 = jax.device_put(jnp.tile(jnp.array([s // 8, s // 6, s // 3, (2 * s) // 3], jnp.int32), (b, 1)))
    b2 = jax.device_put(jnp.tile(jnp.array([(5 * s) // 9, s // 6, (3 * s) // 10, (3 * s) // 5], jnp.int32), (b, 1)))

    model = UNet(dtype=jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, o, o, 1)), train=False)

    @jax.jit
    def clahe_only(x):
        return clahe_fused(x, interpret=interpret)

    @jax.jit
    def clahe_crop(x, bb1, bb2):
        e = clahe_fused(x, interpret=interpret)
        def crop_one(img, c1, c2):
            return fuse_lung_crops(img.astype(jnp.float32), c1, c2, (o, o // 2))
        return jax.vmap(crop_one)(e, bb1, bb2)

    @jax.jit
    def unet_only(x):
        return model.apply(variables, x, train=False) > 0.5

    def full(x):
        return fused_infer(model, variables, x, b1, b2,
                           out_hw=(o, o), threshold=0.5, interpret=interpret)

    t1 = timed(clahe_only, bufs_u8)
    t2 = timed(clahe_crop, bufs_u8, (b1, b2))
    t3 = timed(unet_only, bufs_f)
    t4 = timed(full, bufs_u8)

    gf = 18.7  # approx U-Net fwd GFLOPs/slice at 224^2
    print(f"batch={b} backend={jax.default_backend()}")
    print(f"clahe_only      : {t1*1e3:8.1f} ms/batch  {b/t1:9.0f} slices/s")
    print(f"clahe+crop      : {t2*1e3:8.1f} ms/batch  {b/t2:9.0f} slices/s  (crop ~{(t2-t1)*1e3:.1f} ms)")
    print(f"unet_only       : {t3*1e3:8.1f} ms/batch  {b/t3:9.0f} slices/s  (MFU ~{b*gf/t3/197e3:.2f})")
    print(f"full chain      : {t4*1e3:8.1f} ms/batch  {b/t4:9.0f} slices/s")


if __name__ == "__main__":
    main()
