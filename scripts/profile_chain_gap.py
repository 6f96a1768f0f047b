"""Find the ~45ms gap between the full serving chain and the sum of its
parts: time preproc-only, chain with an optimization barrier, and the
baseline chain."""

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



def main():
    iters, b, s, o = 3, 1024, 256, 224
    rng = np.random.default_rng(0)
    bufs = [jax.device_put(jnp.asarray(
        rng.integers(0, 256, (b, s, s), dtype=np.uint8))) for _ in range(iters)]
    b1 = jax.device_put(jnp.tile(jnp.array([s // 8, s // 6, s // 3, (2 * s) // 3], jnp.int32), (b, 1)))
    b2 = jax.device_put(jnp.tile(jnp.array([(5 * s) // 9, s // 6, (3 * s) // 10, (3 * s) // 5], jnp.int32), (b, 1)))
    model = UNet(dtype=jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, o, o, 1)), train=False)

    def preproc(x):
        e = clahe_fused(x)
        def crop_one(img, c1, c2):
            return fuse_lung_crops(img.astype(jnp.float32), c1, c2, (o, o // 2))
        crops = jax.vmap(crop_one)(e, b1, b2)
        return (crops / 255.0)[..., None]

    @jax.jit
    def preproc_only(x):
        return preproc(x)

    @jax.jit
    def chain(x):
        return model.apply(variables, preproc(x), train=False) > 0.5

    @jax.jit
    def chain_barrier(x):
        z = jax.lax.optimization_barrier(preproc(x))
        return model.apply(variables, z, train=False) > 0.5

    t0 = timed(preproc_only, bufs)
    print(f"preproc only    : {t0*1e3:7.1f} ms/batch", flush=True)
    t1 = timed(chain, bufs)
    print(f"chain           : {t1*1e3:7.1f} ms/batch  {b/t1:6.0f} slices/s", flush=True)
    t2 = timed(chain_barrier, bufs)
    print(f"chain + barrier : {t2*1e3:7.1f} ms/batch  {b/t2:6.0f} slices/s", flush=True)


if __name__ == "__main__":
    main()
