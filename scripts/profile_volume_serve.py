"""End-to-end volume-serving profile (onestop_tpu.serve): NIfTI files on
disk → per-volume reports, real TPU.

Measures what the runtime is FOR — overlap of host IO with device compute:

  - native C++ NIfTI decode vs the pure-Python reader on the same file;
  - per-volume host load vs device compute seconds from the reports;
  - pipeline wall-clock vs the no-overlap lower bound
    (Σ loads + Σ computes) → overlap efficiency;
  - volumes/min and slices/s for the bf16 chain at 224 and the fast 112
    preset (round3_refined_boxes.json quality arms).

Writes artifacts_tpu/round3_volume_serve.json.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from onestop_tpu import config as C
from onestop_tpu.data.nifti import save_nifti
from onestop_tpu.data.synthetic import synthetic_case
from onestop_tpu.models import UNet
from onestop_tpu.serve import _load_vars, serve_volumes

N_VOLUMES = 8
HW, SLICES = 512, 64


def _serving_unet(m):
    """The DEPLOYMENT build: bf16, stem-off (the s2d stem is ~8% slower for
    fused inference; checkpoints are param-identical either way) — matching
    serve.main and bench.py, NOT runners._build_unet's training build."""
    return UNet(widths=tuple(m.unet_widths), bridge=m.unet_bridge,
                dtype=jnp.bfloat16)


def main():
    out = {"n_volumes": N_VOLUMES, "hw": HW, "slices_per_volume": SLICES}
    tmp = tempfile.mkdtemp(prefix="serve_vols_")
    paths = []
    for i in range(N_VOLUMES):
        case = synthetic_case(seed=20 + i, hw=HW, n_slices=SLICES)
        p = os.path.join(tmp, f"case_{i}.nii.gz")
        save_nifti(p, case.ct)
        paths.append(p)

    # native vs Python decode on one file
    from onestop_tpu.data import native
    from onestop_tpu.data.nifti import load_nifti

    if native.native_available():
        t0 = time.perf_counter()
        a = native.load_fdata(paths[0])
        out["native_decode_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    b = load_nifti(paths[0]).get_fdata()
    out["python_decode_s"] = time.perf_counter() - t0
    if native.native_available():
        np.testing.assert_allclose(a, b)
        out["native_speedup"] = out["python_decode_s"] / out["native_decode_s"]
    print({k: v for k, v in out.items() if "decode" in k or "speedup" in k},
          flush=True)

    task1 = C.task1_holdout()
    d = task1.preprocess.new_dim
    seg_model = _serving_unet(task1.model)
    lung224 = _serving_unet(task1.model)
    lung112 = _serving_unet(task1.model)
    lv224 = _load_vars(lung224,
                       "artifacts_tpu/q2_chain/unet_lung_fullframe_0.9907.msgpack",
                       (d, d))
    sv = _load_vars(seg_model,
                    "artifacts_tpu/q2_chain/unet_infection_for_chain_0.8759.msgpack",
                    (d, d))
    lv112 = _load_vars(lung112,
                       "artifacts_tpu/r3_chain_ld112/unet_lung_fullframe_0.9833.msgpack",
                       (112, 112))

    arms = {
        "chain224": dict(lm=lung224, lv=lv224, lhw=None),
        "fast112": dict(lm=lung112, lv=lv112, lhw=(112, 112)),
    }
    for name, a in arms.items():
        kw = dict(img_size=HW, block=64, model_hw=(d, d), lung_hw=a["lhw"])
        # warm compile outside the timed window (one volume)
        next(iter(serve_volumes(paths[:1], a["lm"], a["lv"], seg_model, sv, **kw)))
        t0 = time.perf_counter()
        reports = list(serve_volumes(paths, a["lm"], a["lv"], seg_model, sv, **kw))
        wall = time.perf_counter() - t0
        loads = sum(r.load_seconds for r in reports)
        computes = sum(r.compute_seconds for r in reports)
        n_slices = sum(r.n_slices for r in reports)
        out[f"{name}_wall_s"] = wall
        out[f"{name}_sum_load_s"] = loads
        out[f"{name}_sum_compute_s"] = computes
        out[f"{name}_overlap_saved_s"] = loads + computes - wall
        out[f"{name}_volumes_per_min"] = N_VOLUMES / wall * 60
        out[f"{name}_slices_per_s"] = n_slices / wall
        print(f"{name}: wall {wall:.2f}s (loads {loads:.2f} + computes "
              f"{computes:.2f}) -> {out[f'{name}_volumes_per_min']:.1f} vol/min, "
              f"{out[f'{name}_slices_per_s']:.0f} slices/s end-to-end", flush=True)

    os.makedirs("artifacts_tpu", exist_ok=True)
    with open("artifacts_tpu/round3_volume_serve.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts_tpu/round3_volume_serve.json")


if __name__ == "__main__":
    main()
