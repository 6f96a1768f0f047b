"""Profile the full no-GT chained pipeline (production.chained_infer) on
TPU and break out the stage costs (VERDICT r2 next-round #1): the headline
bench feeds free boxes; the deployable chain must pay for the lung U-Net
AND the connected-component box extraction (ops/bbox.py), whose TPU cost was
never measured in rounds 1-2.

Stages timed on batch B of 256^2 uint8 slices (model 224^2):
  a. fused_infer with given boxes      (the bench chain)
  b. lung stage: CLAHE+resize+U-Net    (second model pass)
  c. lung_boxes_batch on binary masks  (CCL while_loop + histogram + top-k)
  d. connected_components alone        (the segmented-scan labeling)
  e. chained_infer end to end
Masks for (c)/(d) are realistic two-lung phantoms (CCL cost depends on
component shape, not pixel noise).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _timing import timed  # noqa: E402


import jax
import jax.numpy as jnp

from onestop_tpu.models import UNet
from onestop_tpu.ops.bbox import component_bboxes, connected_components
from onestop_tpu.ops.pipeline import fused_infer, lung_boxes_batch
from onestop_tpu.ops.resize import resize2d
from onestop_tpu.ops.clahe_pallas import clahe_fused
from onestop_tpu.production import chained_infer


def phantom_masks(b, hw, seed=0):
    """Binary two-lung masks at model resolution (hw x hw)."""
    rng = np.random.default_rng(seed)
    m = np.zeros((b, hw, hw), np.float32)
    yy, xx = np.mgrid[0:hw, 0:hw]
    for i in range(b):
        for cx in (hw * 0.3 + rng.normal(0, 3), hw * 0.7 + rng.normal(0, 3)):
            cy = hw * 0.5 + rng.normal(0, 4)
            ry, rx = hw * (0.28 + 0.04 * rng.random()), hw * (0.14 + 0.03 * rng.random())
            m[i][((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0] = 1.0
    return m


def main():
    iters, b, s, o = 3, 256, 256, 224
    rng = np.random.default_rng(0)
    raw = [jax.device_put(jnp.asarray(
        rng.integers(0, 256, (b, s, s), dtype=np.uint8))) for _ in range(iters)]
    masks = [jax.device_put(jnp.asarray(phantom_masks(b, o, seed=i)))
             for i in range(iters)]
    b1 = jax.device_put(jnp.tile(jnp.array([s // 8, s // 6, s // 3, (2 * s) // 3], jnp.int32), (b, 1)))
    b2 = jax.device_put(jnp.tile(jnp.array([(5 * s) // 9, s // 6, (3 * s) // 10, (3 * s) // 5], jnp.int32), (b, 1)))

    model = UNet(dtype=jnp.bfloat16)
    seg_vars = model.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, o, o, 1)), train=False)
    lung_vars = model.init({"params": jax.random.PRNGKey(1)},
                           jnp.zeros((1, o, o, 1)), train=False)

    @jax.jit
    def bench_chain(x):
        return fused_infer(model, seg_vars, x, b1, b2, out_hw=(o, o), threshold=0.5)

    @jax.jit
    def lung_stage(x):
        e = clahe_fused(x)
        xl = (resize2d(e.astype(jnp.float32), (o, o), "area") / 255.0)[..., None]
        return model.apply(lung_vars, xl, train=False)[..., 0] > 0.5

    boxes = jax.jit(lung_boxes_batch)

    @jax.jit
    def ccl_only(m):
        return jax.vmap(connected_components)(m > 0)

    @jax.jit
    def rank_only(lab):
        return jax.vmap(lambda l: component_bboxes(l, k=2))(lab)

    @jax.jit
    def full_chain(x):
        return chained_infer(model, lung_vars, model, seg_vars, x,
                             model_hw=(o, o), threshold=0.5)

    ta = timed(bench_chain, raw)
    print(f"a fused_infer (boxes given) : {ta*1e3:8.1f} ms/{b}  {b/ta:7.0f} slices/s", flush=True)
    tb = timed(lung_stage, raw)
    print(f"b lung stage (CLAHE+resize+UNet): {tb*1e3:8.1f} ms/{b}", flush=True)
    labs = [ccl_only(m) for m in masks]
    tc = timed(boxes, masks)
    print(f"c lung_boxes_batch          : {tc*1e3:8.1f} ms/{b}", flush=True)
    td = timed(ccl_only, masks)
    print(f"d   connected_components    : {td*1e3:8.1f} ms/{b}", flush=True)
    te = timed(rank_only, labs)
    print(f"e   histogram+top2+boxes    : {te*1e3:8.1f} ms/{b}", flush=True)
    tf_ = timed(full_chain, raw)
    print(f"f chained_infer end-to-end  : {tf_*1e3:8.1f} ms/{b}  {b/tf_:7.0f} slices/s", flush=True)
    print(f"  sum of parts a+b+c        : {(ta+tb+tc)*1e3:8.1f} ms/{b}")


if __name__ == "__main__":
    main()
