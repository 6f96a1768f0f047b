"""Per-stage U-Net timing probe on the real TPU.

Times each encoder/bridge/decoder stage as its own jit program (fusion
across stages is lost, so the sum overshoots the fused total — use the
*relative* weights to find the hot stages).

Usage: python scripts/profile_unet_layers.py [--batch 1024]
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
from flax import linen as nn

from onestop_tpu.models.common import glorot_uniform, he_normal



def conv_flops(b, h, w, cin, cout, k=3):
    return 2.0 * b * h * w * cin * cout * k * k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    B = args.batch
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    # stage list: (name, in_hw, cin, fn builder)
    stages = []

    def dbl_conv(cin, cout, hw, name, k=3):
        m = nn.Sequential([
            nn.Conv(cout, (k, k), padding="SAME", kernel_init=he_normal(), dtype=dt),
            nn.relu,
            nn.Conv(cout, (k, k), padding="SAME", kernel_init=he_normal(), dtype=dt),
            nn.relu,
        ])
        v = m.init(key, jnp.zeros((1, hw, hw, cin), dt))
        f = jax.jit(lambda x: m.apply(v, x))
        fl = conv_flops(B, hw, hw, cin, cout) + conv_flops(B, hw, hw, cout, cout)
        stages.append((name, hw, cin, f, fl))

    def upconv(cin, cout, hw, name):
        m = nn.ConvTranspose(cout, (2, 2), strides=(2, 2), padding="SAME",
                             kernel_init=glorot_uniform(), dtype=dt)
        v = m.init(key, jnp.zeros((1, hw, hw, cin), dt))
        f = jax.jit(lambda x: m.apply(v, x))
        fl = 2.0 * B * hw * hw * cin * cout * 4
        stages.append((name, hw, cin, f, fl))

    dbl_conv(1, 32, 224, "enc0 224^2 1->32->32")
    dbl_conv(32, 64, 112, "enc1 112^2 32->64->64")
    dbl_conv(64, 128, 56, "enc2 56^2 64->128")
    dbl_conv(128, 256, 28, "enc3 28^2 128->256")
    dbl_conv(256, 512, 14, "bridge 14^2 256->512")
    upconv(512, 256, 14, "up3 14^2 512->256")
    dbl_conv(512, 256, 28, "dec3 28^2 512->256")
    upconv(256, 128, 28, "up2 28^2 256->128")
    dbl_conv(256, 128, 56, "dec2 56^2 256->128")
    upconv(128, 64, 56, "up1 56^2 128->64")
    dbl_conv(128, 64, 112, "dec1 112^2 128->64")
    upconv(64, 32, 112, "up0 112^2 64->32")
    dbl_conv(64, 32, 224, "dec0 224^2 64->32")

    total = 0.0
    print(f"batch={B} backend={jax.default_backend()}")
    for name, hw, cin, f, fl in stages:
        bufs = [jax.device_put(jnp.asarray(
            rng.standard_normal((B, hw, hw, cin), np.float32), dt))
            for _ in range(args.iters)]
        t = timed(f, bufs)
        total += t
        print(f"{name:28s}: {t*1e3:7.1f} ms  {fl/t/1e12:6.1f} TFLOP/s  ({fl/t/197e12*100:4.1f}% MXU)")
    print(f"{'SUM (unfused)':28s}: {total*1e3:7.1f} ms  -> {B/total:.0f} slices/s")


if __name__ == "__main__":
    main()
