"""Prototype A/B on the real TPU:
1. split-concat decoder: conv0([up, skip]) as conv_a(up) + conv_b(skip),
   BN applied per-half — avoids materializing the concat (params not
   checkpoint-compatible here; timing prototype only).
2. lax.map chunked mega-batch: one dispatch of 4x1024 to amortize the
   ~30-45 ms fixed dispatch/fetch cost.
"""

import os
import sys
import time
from typing import Sequence

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _timing import timed  # noqa: E402  (also sets repo path + compile cache)


import jax
import jax.numpy as jnp
from flax import linen as nn

from onestop_tpu.models import UNet
from onestop_tpu.models.common import batch_norm, glorot_uniform, he_normal
from onestop_tpu.ops.pipeline import fused_infer


class UNetSplitDec(nn.Module):
    widths: Sequence[int] = (32, 64, 128, 256)
    bridge: int = 512
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        conv = lambda w, name: nn.Conv(w, (3, 3), padding="SAME",
                                       kernel_init=he_normal(), dtype=self.dtype, name=name)
        convt = lambda w, name: nn.ConvTranspose(w, (2, 2), strides=(2, 2), padding="SAME",
                                                 kernel_init=glorot_uniform(), dtype=self.dtype, name=name)
        skips = []
        for i, w in enumerate(self.widths):
            x = nn.relu(conv(w, f"enc{i}_conv0")(x))
            x = nn.relu(conv(w, f"enc{i}_conv1")(x))
            x = batch_norm(train, self.dtype, name=f"enc{i}_bn")(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(self.bridge, "bridge_conv0")(x))
        x = nn.relu(conv(self.bridge, "bridge_conv1")(x))
        for i, w in reversed(list(enumerate(self.widths))):
            up = convt(w, f"dec{i}_up")(x)
            # per-half BN + split conv0: no concat materialization
            a = batch_norm(train, self.dtype, name=f"dec{i}_bn_a")(up)
            b = batch_norm(train, self.dtype, name=f"dec{i}_bn_b")(skips[i])
            ya = nn.Conv(w, (3, 3), padding="SAME", use_bias=False,
                         kernel_init=he_normal(), dtype=self.dtype, name=f"dec{i}_conv0a")(a)
            yb = nn.Conv(w, (3, 3), padding="SAME",
                         kernel_init=he_normal(), dtype=self.dtype, name=f"dec{i}_conv0b")(b)
            x = nn.relu(ya + yb)
            x = nn.relu(conv(w, f"dec{i}_conv1")(x))
        x = nn.Conv(1, (1, 1), kernel_init=glorot_uniform(), dtype=self.dtype, name="head")(x)
        return nn.sigmoid(x.astype(jnp.float32))



def main():
    iters, o = 3, 224
    rng = np.random.default_rng(0)
    b = 1024
    bufs_f = [jax.device_put(jnp.asarray(
        rng.random((b, o, o, 1), dtype=np.float32))) for _ in range(iters)]

    base = UNet(dtype=jnp.bfloat16)
    vb = base.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, o, o, 1)), train=False)
    t = timed(jax.jit(lambda x: base.apply(vb, x, train=False) > 0.5), bufs_f)
    print(f"unet baseline  b={b}: {t*1e3:7.1f} ms  {b/t:6.0f} slices/s", flush=True)

    split = UNetSplitDec()
    vs = split.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, o, o, 1)), train=False)
    t = timed(jax.jit(lambda x: split.apply(vs, x, train=False) > 0.5), bufs_f)
    print(f"unet split-dec b={b}: {t*1e3:7.1f} ms  {b/t:6.0f} slices/s", flush=True)
    del bufs_f

    # chunked mega-batch through the full serving chain
    s = 256
    model = base
    for total, chunk in ((4096, 1024),):
        imgs = jax.device_put(jnp.asarray(
            rng.integers(0, 256, (total, s, s), dtype=np.uint8)))
        b1 = jax.device_put(jnp.asarray(
            rng.integers(8, 64, (total, 4), dtype=np.int32)))
        b2 = jax.device_put(jnp.asarray(
            rng.integers(96, 160, (total, 4), dtype=np.int32)))

        @jax.jit
        def mega(x, bb1, bb2):
            def one(args):
                xc, c1, c2 = args
                return fused_infer(model, vb, xc, c1, c2, out_hw=(o, o), threshold=0.5)
            xs = x.reshape(total // chunk, chunk, s, s)
            b1s = bb1.reshape(total // chunk, chunk, 4)
            b2s = bb2.reshape(total // chunk, chunk, 4)
            return jax.lax.map(one, (xs, b1s, b2s))

        out = mega(imgs, b1, b2)
        np.asarray(out.ravel()[0])
        t0 = time.perf_counter()
        n = 2
        outs = [mega(imgs, b1, b2) for _ in range(n)]
        for ot in outs:
            np.asarray(ot.ravel()[0])
        dt = (time.perf_counter() - t0) / n
        print(f"mega chain {total} (chunks of {chunk}): {dt*1e3:7.1f} ms  {total/dt:6.0f} slices/s", flush=True)


if __name__ == "__main__":
    main()
