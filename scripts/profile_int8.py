"""Int8 vs bf16 U-Net serving on the real TPU: unet-only and the full
chunked mega-chain (same configuration as bench.py)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _timing import timed  # noqa: E402  (also sets repo path + compile cache)


import jax
import jax.numpy as jnp

from onestop_tpu.models import UNet
from onestop_tpu.serve_int8 import calibrate_and_quantize, fused_infer_int8, unet_apply_int8



def main():
    iters, o, s = 3, 224, 256
    rng = np.random.default_rng(0)
    model = UNet(dtype=jnp.bfloat16)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, o, o, 1)), train=False)
    q = calibrate_and_quantize(v, rng.random((8, o, o, 1)).astype(np.float32))

    b = 1024
    bufs = [jax.device_put(jnp.asarray(
        rng.random((b, o, o, 1), dtype=np.float32))) for _ in range(iters)]
    t = timed(jax.jit(lambda x: model.apply(v, x, train=False) > 0.5), bufs)
    print(f"unet bf16 b={b}: {t*1e3:7.1f} ms  {b/t:6.0f} slices/s", flush=True)
    t = timed(jax.jit(lambda x: unet_apply_int8(q, x) > 0.5), bufs)
    print(f"unet int8 b={b}: {t*1e3:7.1f} ms  {b/t:6.0f} slices/s", flush=True)
    del bufs

    total, chunk = 4096, 1024
    imgs = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (total, s, s), dtype=np.uint8)))
    b1 = jax.device_put(jnp.asarray(rng.integers(8, 64, (total, 4), dtype=np.int32)))
    b2 = jax.device_put(jnp.asarray(rng.integers(96, 160, (total, 4), dtype=np.int32)))

    @jax.jit
    def mega(x, bb1, bb2):
        def one(args):
            xc, c1, c2 = args
            return fused_infer_int8(q, xc, c1, c2, out_hw=(o, o), threshold=0.5)
        return jax.lax.map(one, (x.reshape(-1, chunk, s, s),
                                 bb1.reshape(-1, chunk, 4),
                                 bb2.reshape(-1, chunk, 4)))

    out = mega(imgs, b1, b2)
    np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    n = 2
    outs = [mega(imgs, b1, b2) for _ in range(n)]
    for ot in outs:
        np.asarray(ot.ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"mega chain int8 {total}: {dt*1e3:7.1f} ms  {total/dt:6.0f} slices/s", flush=True)


if __name__ == "__main__":
    main()
