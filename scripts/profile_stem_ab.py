"""A/B the s2d stem and batch size for the serving chain on the real TPU."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _timing import timed  # noqa: E402  (also sets repo path + compile cache)


import jax
import jax.numpy as jnp

from onestop_tpu.models import UNet
from onestop_tpu.ops.pipeline import fused_infer



def main():
    iters = 3
    rng = np.random.default_rng(0)
    s, o = 256, 224

    for stem in (False, True):
        model = UNet(dtype=jnp.bfloat16, s2d_stem=stem)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((1, o, o, 1)), train=False)
        b = 1024
        bufs_f = [jax.device_put(jnp.asarray(
            rng.random((b, o, o, 1), dtype=np.float32))) for _ in range(iters)]
        t = timed(jax.jit(lambda x: model.apply(variables, x, train=False) > 0.5), bufs_f)
        print(f"unet_only stem={stem} b={b}: {t*1e3:7.1f} ms/batch  {b/t:7.0f} slices/s", flush=True)
        del bufs_f

    model = UNet(dtype=jnp.bfloat16, s2d_stem=False)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, o, o, 1)), train=False)
    for b in (1024, 2048):
        try:
            bufs = [jax.device_put(jnp.asarray(
                rng.integers(0, 256, (b, s, s), dtype=np.uint8))) for _ in range(iters)]
            b1 = jax.device_put(jnp.tile(jnp.array([s // 8, s // 6, s // 3, (2 * s) // 3], jnp.int32), (b, 1)))
            b2 = jax.device_put(jnp.tile(jnp.array([(5 * s) // 9, s // 6, (3 * s) // 10, (3 * s) // 5], jnp.int32), (b, 1)))
            t = timed(lambda x: fused_infer(model, variables, x, b1, b2,
                                            out_hw=(o, o), threshold=0.5), bufs)
            print(f"full chain stem=False b={b}: {t*1e3:7.1f} ms/batch  {b/t:7.0f} slices/s", flush=True)
            del bufs
        except Exception as e:
            print(f"full chain b={b}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
