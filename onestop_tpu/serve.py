"""Volume-level serving runtime: ``.nii``/``.nii.gz`` files in → per-volume
one-stop reports out, with host IO overlapped against TPU compute.

The reference has no deployment story at all — its "serving" is a notebook
cell calling ``model.predict`` on arrays that required ground-truth lung
masks to build (SURVEY.md §8 Q2). This module is the production front end
over the no-GT chain (``production.chained_infer`` /
``production.one_stop_infer``): a prefetching pipeline in which the native
C++ NIfTI loader (``data/native.py``, thread pool) decodes + windows +
resizes volume i+1 on the host while the TPU runs the chain on volume i.

TPU-first structure:

- **Static shapes everywhere.** Volumes have ragged slice counts, so each
  volume is chunked into fixed ``block``-slice batches (last block
  zero-padded, padding stripped after fetch) — every block of every volume
  reuses ONE compiled chain program.
- **Async dispatch as the second pipeline stage.** JAX dispatch returns
  before the TPU finishes; all of a volume's blocks are dispatched before
  the first fetch, so the device queue stays full while the host decodes
  the next volume.
- **Device-side summaries.** Masks are reduced to per-slice infected-pixel
  fractions on device; unless ``keep_masks`` is set, only O(slices) scalars
  cross the host link (a remote-tunnel full-mask fetch costs ~300 ms).
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from onestop_tpu.data.ingest import _to_u8, load_slices
from onestop_tpu.data.native import load_fdata_any

__all__ = ["VolumeReport", "serve_volumes", "serve_directory",
           "MASK_SLICE_THRESHOLD"]

# Default per-slice infected-mask-fraction above which a slice is reported
# infected (VolumeReport.summary "infected_slices_by_mask"). The reference's
# label rule is any-nonzero-pixel on GT masks (task2:413-418); a small
# AREA-FRACTION floor (16 pixels at the default 224² serving grid — scale it
# via the summary's mask_slice_threshold arg if serving at a much smaller
# model_hw) rejects speckle on *predicted* masks while staying well under
# any real lesion's footprint.
MASK_SLICE_THRESHOLD = 16 / (224 * 224)


@dataclasses.dataclass
class VolumeReport:
    """Per-volume output of ``serve_volumes``."""

    path: str
    n_slices: int                      # windowed slices actually served
    boxes1: np.ndarray                 # (S, 4) float32 raw-coord (x, y, w, h)
    boxes2: np.ndarray                 # (S, 4)
    infection_fraction: np.ndarray     # (S,) mean predicted-infected fraction
    cls_probs: np.ndarray | None       # (S,) classifier p(infected), if cls model
    masks: np.ndarray | None           # (S, oh, ow) bool, only if keep_masks
    load_seconds: float                # host decode+window+resize wall time
    compute_seconds: float             # dispatch→fetch wall time for the volume
    thresholded: bool = True           # False when served with threshold=None
    #   (infection_fraction is then a mean PROBABILITY, not a mask fraction,
    #   and the mask-derived slice classification below is suppressed)

    def summary(self, cls_threshold: float = 0.5,
                mask_slice_threshold: float = MASK_SLICE_THRESHOLD) -> dict:
        """JSON-friendly one-stop summary.

        ``infected_slices_by_mask`` is the mask-derived slice classification:
        a slice counts as infected when its predicted-infected pixel fraction
        exceeds ``mask_slice_threshold``. On held-out volumes this zero-cost
        signal ranks slices far better than the task2 classifier's saturated
        sigmoids (per-slice AUC study: `artifacts_tpu/round4_cls_mask_auc.json`
        vs the classifier's pooled transfer AUC in `round4_cls_transfer.json`),
        so volume reports always include it — with or without a classifier.
        """
        out = {
            "path": self.path,
            "n_slices": self.n_slices,
            "mean_infection_fraction": float(self.infection_fraction.mean()),
            "max_infection_fraction": float(self.infection_fraction.max()),
            "load_seconds": round(self.load_seconds, 4),
            "compute_seconds": round(self.compute_seconds, 4),
        }
        if self.thresholded:
            # meaningless for threshold=None runs, where infection_fraction
            # is a mean probability (~0.5 everywhere), not a mask fraction
            out["infected_slices_by_mask"] = int(
                (self.infection_fraction > mask_slice_threshold).sum())
            out["mask_slice_threshold"] = mask_slice_threshold
        if self.cls_probs is not None:
            out["infected_slices"] = int((self.cls_probs > cls_threshold).sum())
            out["max_cls_prob"] = float(self.cls_probs.max())
        return out


@jax.jit
def _frac(m):
    """Per-slice infected-pixel fraction (module-level jit: one compile per
    process, shared across serve_volumes calls)."""
    return jnp.mean(m.astype(jnp.float32), axis=(1, 2, 3))


def _prepare_volume(path, img_size, slice_lo, slice_hi):
    """Host stage: native (or Python) NIfTI decode → rot90/window/512²
    resize/min-max normalize (``data.ingest.load_slices``) → reference
    ``np.uint8(img*255)`` truncation. Runs on the loader thread pool."""
    t0 = time.perf_counter()
    sl = load_slices(load_fdata_any(path), img_size, slice_lo, slice_hi)
    return _to_u8(sl), time.perf_counter() - t0


def serve_volumes(
    paths,
    lung_model,
    lung_variables,
    seg_model,
    seg_variables,
    cls_model=None,
    cls_variables=None,
    *,
    quant: dict | None = None,
    img_size: int = 512,
    slice_lo: float = 0.2,
    slice_hi: float = 0.8,
    block: int = 64,
    prefetch: int = 2,
    model_hw: tuple[int, int] = (224, 224),
    lung_threshold: float = 0.5,
    threshold: float = 0.5,
    ccl_stride: int = 2,
    lung_hw: tuple[int, int] | None = None,
    refine_boxes: bool = True,
    cls_hw: tuple[int, int] | None = None,
    keep_masks: bool = False,
    cls_calibration: tuple[float, float] | None = None,
    interpret: bool = False,
):
    """Serve CT volumes through the no-GT chain; yields ``VolumeReport`` per
    path, in input order.

    With ``cls_model`` the full one-stop chain runs (lung seg → boxes →
    infection seg + per-slice classification); without it, the two-model
    chain. ``quant`` switches models to the int8 path: a dict with keys
    ``"lung"``/``"seg"`` (and ``"cls"`` when classifying) holding
    ``serve_int8.quantize_model`` outputs; OMIT the ``"lung"`` key to keep
    the lung stage bf16 (the quality-gated split for low-res ``lung_hw``,
    see ``serve_int8.chained_infer_mixed``).

    ``block`` is the static slice-batch size (compile-shape granularity);
    ``prefetch`` is how many volumes the host loader runs ahead.
    """
    with_cls = cls_model is not None
    if quant is not None:
        # fail fast with an actionable message instead of a KeyError from
        # inside the first block's jit dispatch (after a full volume decode)
        needed = {"seg"} | ({"cls"} if with_cls else set())
        missing = needed - set(quant)
        if missing:
            raise ValueError(
                f"quant dict is missing {sorted(missing)} for this serving "
                f"mode (cls_model {'set' if with_cls else 'absent'}); build "
                f"it with serve.calibrate_quant(cls_model=...) matching the "
                f"models you serve")
    if quant is not None and "lung" not in quant:
        # mixed precision split: bf16 lung stage, int8 seg (+cls) — the
        # quality-gated combination for low-res lung stages, where box
        # refinement is sensitive to probability quantization
        # (serve_int8.chained_infer_mixed)
        from onestop_tpu.serve_int8 import (chained_infer_mixed,
                                            one_stop_infer_mixed)

        if with_cls:
            infer = lambda x: one_stop_infer_mixed(
                lung_model, lung_variables,
                seg_model, quant["seg"], seg_variables,
                cls_model, quant["cls"], cls_variables, x,
                model_hw=model_hw, lung_threshold=lung_threshold,
                threshold=threshold, interpret=interpret,
                ccl_stride=ccl_stride, lung_hw=lung_hw,
                refine_boxes=refine_boxes, cls_hw=cls_hw)
        else:
            infer = lambda x: chained_infer_mixed(
                lung_model, lung_variables,
                seg_model, quant["seg"], seg_variables, x,
                model_hw=model_hw, lung_threshold=lung_threshold,
                threshold=threshold, interpret=interpret,
                ccl_stride=ccl_stride, lung_hw=lung_hw,
                refine_boxes=refine_boxes)
    elif quant is not None:
        from onestop_tpu.serve_int8 import chained_infer_int8, one_stop_infer_int8

        if with_cls:
            infer = lambda x: one_stop_infer_int8(
                lung_model, quant["lung"], lung_variables,
                seg_model, quant["seg"], seg_variables,
                cls_model, quant["cls"], cls_variables, x,
                model_hw=model_hw, lung_threshold=lung_threshold,
                threshold=threshold, interpret=interpret,
                ccl_stride=ccl_stride, lung_hw=lung_hw,
                refine_boxes=refine_boxes, cls_hw=cls_hw)
        else:
            infer = lambda x: chained_infer_int8(
                lung_model, quant["lung"], lung_variables,
                seg_model, quant["seg"], seg_variables, x,
                model_hw=model_hw, lung_threshold=lung_threshold,
                threshold=threshold, interpret=interpret,
                ccl_stride=ccl_stride, lung_hw=lung_hw,
                refine_boxes=refine_boxes)
    else:
        from onestop_tpu.production import chained_infer, one_stop_infer

        if with_cls:
            infer = lambda x: one_stop_infer(
                lung_model, lung_variables, seg_model, seg_variables,
                cls_model, cls_variables, x,
                model_hw=model_hw, lung_threshold=lung_threshold,
                threshold=threshold, interpret=interpret,
                ccl_stride=ccl_stride, lung_hw=lung_hw,
                refine_boxes=refine_boxes, cls_hw=cls_hw)
        else:
            infer = lambda x: chained_infer(
                lung_model, lung_variables, seg_model, seg_variables, x,
                model_hw=model_hw, lung_threshold=lung_threshold,
                threshold=threshold, interpret=interpret,
                ccl_stride=ccl_stride, lung_hw=lung_hw,
                refine_boxes=refine_boxes)

    paths = [str(p) for p in paths]

    def _gen():
        it = iter(paths)
        pool = ThreadPoolExecutor(max_workers=max(1, prefetch))
        pending: deque = deque()

        def _submit():
            p = next(it, None)
            if p is not None:
                pending.append((p, pool.submit(
                    _prepare_volume, p, img_size, slice_lo, slice_hi)))

        try:
            for _ in range(max(1, prefetch)):
                _submit()
            while pending:
                path, fut = pending.popleft()
                u8, load_s = fut.result()
                _submit()                   # keep the loader pipeline full
                t0 = time.perf_counter()
                n = len(u8)
                n_blocks = max(1, -(-n // block))
                pad = n_blocks * block - n
                if pad:
                    u8 = np.concatenate(
                        [u8, np.zeros((pad,) + u8.shape[1:], np.uint8)])
                # dispatch ALL blocks before the first fetch: the device
                # queue stays full while the loader decodes the next volume
                outs = []
                for i in range(n_blocks):
                    x = jnp.asarray(u8[i * block:(i + 1) * block])
                    res = infer(x)
                    if with_cls:
                        masks, cls_p, b1, b2 = res
                    else:
                        masks, b1, b2 = res
                        cls_p = None
                    # keep_masks=False: drop the block's mask buffer once
                    # its fraction reduction is dispatched — otherwise every
                    # block's full (block, oh, ow, 1) device buffer stays
                    # live until the volume completes, scaling device memory
                    # with volume length
                    outs.append((masks if keep_masks else None,
                                 _frac(masks), cls_p, b1, b2))
                fr = np.concatenate([np.asarray(o[1]) for o in outs])[:n]
                b1 = np.concatenate([np.asarray(o[3]) for o in outs])[:n]
                b2 = np.concatenate([np.asarray(o[4]) for o in outs])[:n]
                cls_p = (np.concatenate([np.asarray(o[2]) for o in outs])[:n]
                         if with_cls else None)
                if cls_p is not None and cls_calibration is not None:
                    # Platt (a, b) from a labeled validation run — see
                    # metrics.classification.fit_platt / the report's
                    # "calibration" block; host-side on O(slices) scalars
                    from onestop_tpu.metrics.classification import apply_platt

                    cls_p = apply_platt(cls_p.ravel(), *cls_calibration
                                        ).astype(np.float32)
                masks = (np.concatenate(
                    [np.asarray(o[0])[..., 0] for o in outs])[:n]
                    if keep_masks else None)
                yield VolumeReport(
                    path=path, n_slices=n, boxes1=b1, boxes2=b2,
                    infection_fraction=fr, cls_probs=cls_p, masks=masks,
                    load_seconds=load_s,
                    compute_seconds=time.perf_counter() - t0,
                    thresholded=threshold is not None)
        finally:
            pool.shutdown(wait=False, cancel_futures=True)

    # serve_volumes is a plain function returning a generator (not a
    # generator function) so the quant/mode validation above runs EAGERLY at
    # call time, not at the first next()
    return _gen()


def serve_directory(data_dir, *models_and_vars, column: str = "ct_scan", **kw):
    """Serve every ``column`` volume listed in a Kaggle-layout
    ``metadata.csv`` (ref ``holdout.py:135-137``) through ``serve_volumes``."""
    return serve_volumes(_list_volumes(data_dir, column), *models_and_vars, **kw)


def calibrate_quant(
    u8_slices,
    lung_model,
    lung_variables,
    seg_model,
    seg_variables,
    cls_model=None,
    cls_variables=None,
    *,
    model_hw: tuple[int, int] = (224, 224),
    lung_hw: tuple[int, int] | None = None,
    ccl_stride: int = 2,
    refine_boxes: bool = True,
    cls_hw: tuple[int, int] | None = None,
    interpret: bool = False,
    n_cal: int = 8,
    quantize_lung: bool = True,
):
    """Build the int8 ``quant`` dict for ``serve_volumes``, calibrated on
    REAL stage inputs derived from a sample of actual slices: the bf16 chain
    supplies the crop boxes, so the seg/cls calibration batch has the exact
    serving distribution (CLAHE'd two-lung crops), and the lung calibration
    batch the full-frame resize. Random-uniform calibration also passes the
    quality gate (bench.py), but real activations tighten the scales."""
    from onestop_tpu.ops.clahe_pallas import clahe_fused
    from onestop_tpu.ops.pipeline import serving_preproc
    from onestop_tpu.ops.resize import resize2d
    from onestop_tpu.production import chained_infer
    from onestop_tpu.serve_int8 import quantize_model

    arr = np.asarray(u8_slices)
    # spread the calibration sample across the volume (edge slices are
    # near-empty; middle slices carry the activation range that matters)
    u8 = jnp.asarray(arr[np.linspace(0, len(arr) - 1, min(n_cal, len(arr))).astype(int)])
    lh = model_hw if lung_hw is None else lung_hw
    enhanced = clahe_fused(u8, interpret=interpret)
    x_lung = (resize2d(enhanced.astype(jnp.float32), lh, "area") / 255.0)[..., None]
    _, b1, b2 = chained_infer(
        lung_model, lung_variables, seg_model, seg_variables, u8,
        model_hw=model_hw, threshold=0.5, interpret=interpret,
        ccl_stride=ccl_stride, lung_hw=lung_hw, refine_boxes=refine_boxes)
    x_seg = serving_preproc(enhanced, b1, b2, model_hw, interpret=interpret,
                            pre_enhanced=True)
    quant = {"seg": quantize_model(seg_model, seg_variables, x_seg)}
    if quantize_lung:
        quant["lung"] = quantize_model(lung_model, lung_variables, x_lung)
    if cls_model is not None:
        x_cls = x_seg
        if cls_hw is not None and tuple(cls_hw) != tuple(model_hw):
            # linear, matching _chain_stages' serving resize (which matches
            # the classifier's linear-resized training data)
            x_cls = resize2d(x_seg[..., 0], cls_hw, "linear")[..., None]
        quant["cls"] = quantize_model(cls_model, cls_variables, x_cls)
    return quant


def checkpoint_is_qat(ckpt_path) -> bool:
    """True iff the checkpoint's sidecar JSON records ``qat: true`` — i.e.
    it was trained with fake-quantized convs and is int8-robust by
    construction (train/qat.py). Plain checkpoints served int8 carry the
    per-checkpoint quality lottery (round4_qat*.json: the identically
    trained plain twin loses 0.025 chained dice under int8, the QAT twin
    none); the CLI warns on them before quantized serving."""
    import json as _json
    from pathlib import Path

    side = Path(str(ckpt_path) + ".json")
    if not side.exists():
        return False
    try:
        return bool(_json.loads(side.read_text()).get("qat"))
    except (ValueError, OSError):
        return False


def checkpoint_cls_head(ckpt_path) -> str | None:
    """The ``cls_head`` recorded in a classifier checkpoint's sidecar JSON
    ('flatten' | 'gap'), or None for pre-round-5 sidecars. The head is the
    checkpoint's physical topology (a GAP checkpoint has a 64-wide fc0, a
    flatten one ~1.6 M params there), so the sidecar — not the CLI flag —
    is authoritative at serving time."""
    import json as _json
    from pathlib import Path

    side = Path(str(ckpt_path) + ".json")
    if not side.exists():
        return None
    try:
        head = _json.loads(side.read_text()).get("cls_head")
    except (ValueError, OSError):
        return None
    return head if head in ("flatten", "gap") else None


def _load_vars(model, path, in_hw):
    # canonical implementation lives with the checkpoint format; kept as an
    # alias because the study scripts import it from here
    from onestop_tpu.train.checkpoint import load_model_variables

    return load_model_variables(model, path, in_hw)


def _list_volumes(data_dir, column: str = "ct_scan"):
    """Kaggle-layout ``metadata.csv`` → ordered volume paths (shared by
    ``serve_directory`` and the CLI)."""
    from onestop_tpu.data.acquire import load_metadata

    return [row[column] for row in load_metadata(data_dir)]


def main(argv=None):
    """``python -m onestop_tpu.serve`` — deploy trained checkpoints as a
    volume-serving pipeline. Prints one JSON summary line per volume (and
    optionally appends them to ``--out`` as JSONL)."""
    import argparse
    import sys

    from onestop_tpu import config as C
    from onestop_tpu.models import ClassifierCNN, UNet

    p = argparse.ArgumentParser(
        description="onestop_tpu volume server: NIfTI CT volumes -> "
                    "lung+infection masks (+classification), no ground truth")
    p.add_argument("volumes", nargs="*", help=".nii/.nii.gz CT volume paths")
    p.add_argument("--data-dir", default=None,
                   help="Kaggle-layout dir: serve every metadata.csv ct_scan")
    p.add_argument("--lung", required=True, help="lung U-Net checkpoint (.msgpack)")
    p.add_argument("--seg", required=True, help="infection U-Net checkpoint")
    p.add_argument("--cls", default=None, help="classifier checkpoint (optional)")
    p.add_argument("--cls-dim", type=int, default=None,
                   help="classifier input resolution (checkpoint must be "
                        "trained at it; e.g. 112 quarters the classifier's "
                        "chain overhead — profile_cls_overhead)")
    p.add_argument("--lung-dim", type=int, default=None,
                   help="stage-1 lung resolution (checkpoint must be trained at it)")
    p.add_argument("--cls-head", choices=("flatten", "gap"), default="flatten",
                   help="classifier head matching the checkpoint: 'flatten' "
                        "(reference topology) or 'gap' (global-avg-pool "
                        "transfer variant, runner --cls-head gap)")
    p.add_argument("--int8", action="store_true",
                   help="serve all models int8 (calibrated on the first volume)")
    p.add_argument("--block", type=int, default=64)
    p.add_argument("--prefetch", type=int, default=2)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--cls-calibration", nargs=2, type=float, default=None,
                   metavar=("A", "B"),
                   help="Platt (a, b) for the classifier probabilities — the "
                        "'calibration' block of a labeled run's "
                        "classification_report.json")
    p.add_argument("--no-refine-boxes", action="store_true")
    p.add_argument("--interpret", action="store_true",
                   help="run Pallas kernels in interpret mode (CPU smoke "
                        "runs — no TPU required)")
    p.add_argument("--out", default=None, help="append JSONL summaries here")
    args = p.parse_args(argv)

    task1 = C.task1_holdout()
    d = task1.preprocess.new_dim
    lung_dim = args.lung_dim or d
    m = task1.model  # task3's ModelConfig shares these U-Net fields
    # serving builds stem-off (inference-fastest; param tree identical to
    # the stem-on training builds, see runners._build_unet); BN constants
    # must match the training config or inference normalization shifts
    lung_model = UNet(widths=tuple(m.unet_widths), bridge=m.unet_bridge,
                      bn_momentum=m.bn_momentum, bn_epsilon=m.bn_epsilon,
                      dtype=jnp.bfloat16)
    seg_model = UNet(widths=tuple(m.unet_widths), bridge=m.unet_bridge,
                     bn_momentum=m.bn_momentum, bn_epsilon=m.bn_epsilon,
                     dtype=jnp.bfloat16)
    lung_vars = _load_vars(lung_model, args.lung, (lung_dim, lung_dim))
    seg_vars = _load_vars(seg_model, args.seg, (d, d))
    cls_model = cls_vars = None
    if args.cls:
        mc = C.task2_classification().model
        head = checkpoint_cls_head(args.cls) or args.cls_head
        if head != args.cls_head:
            print(f"note: {args.cls} sidecar records cls_head={head!r}; "
                  f"using it (overrides --cls-head {args.cls_head})",
                  file=sys.stderr)
        cls_model = ClassifierCNN(widths=tuple(mc.cls_widths),
                                  dense=mc.cls_dense,
                                  bn_momentum=mc.bn_momentum,
                                  bn_epsilon=mc.bn_epsilon,
                                  dtype=jnp.bfloat16,
                                  head=head)
        cd = args.cls_dim or d
        cls_vars = _load_vars(cls_model, args.cls, (cd, cd))

    paths = _list_volumes(args.data_dir) if args.data_dir else args.volumes
    if not paths:
        p.error("no volumes: pass paths or --data-dir")

    kw = dict(model_hw=(d, d), block=args.block, prefetch=args.prefetch,
              threshold=args.threshold,
              lung_hw=None if lung_dim == d else (lung_dim, lung_dim),
              cls_hw=(None if not args.cls or (args.cls_dim or d) == d
                      else (args.cls_dim, args.cls_dim)),
              refine_boxes=not args.no_refine_boxes,
              cls_calibration=(tuple(args.cls_calibration)
                               if args.cls_calibration else None),
              img_size=task1.preprocess.img_size,
              # the config's slice window, NOT serve_volumes' defaults —
              # int8 calibration below reads the same window, and the two
              # must see the same slice distribution
              slice_lo=task1.preprocess.slice_lo,
              slice_hi=task1.preprocess.slice_hi,
              interpret=args.interpret)
    quant = None
    if args.int8:
        # per-checkpoint int8 gate reminder (VERDICT r4 item 7): checkpoints
        # record whether they trained QAT in their sidecar JSON; a plain
        # checkpoint served int8 is a quality lottery (round4_qat*.json:
        # plain twin −0.025 chained dice, QAT twin ±0.001)
        import sys as _sys

        for _name, _ckpt in (("--seg", args.seg), ("--cls", args.cls)):
            if _ckpt and not checkpoint_is_qat(_ckpt):
                print(f"WARNING: {_name} checkpoint {_ckpt} was not "
                      "QAT-trained (or predates the 'qat' sidecar field) — "
                      "int8 quality is per-checkpoint; gate it with "
                      "scripts/quality_int8.py or retrain with --qat",
                      file=_sys.stderr)
        first, _ = _prepare_volume(paths[0], task1.preprocess.img_size,
                                   task1.preprocess.slice_lo,
                                   task1.preprocess.slice_hi)
        quant = calibrate_quant(first, lung_model, lung_vars, seg_model,
                                seg_vars, cls_model, cls_vars,
                                model_hw=(d, d), lung_hw=kw["lung_hw"],
                                cls_hw=kw["cls_hw"],
                                refine_boxes=kw["refine_boxes"],
                                interpret=args.interpret,
                                # low-res lung stages keep stage 1 bf16
                                # (serve_int8.chained_infer_mixed rationale)
                                quantize_lung=kw["lung_hw"] is None)

    import json as _json
    sink = open(args.out, "a") if args.out else None
    try:
        for report in serve_volumes(paths, lung_model, lung_vars, seg_model,
                                    seg_vars, cls_model, cls_vars,
                                    quant=quant, **kw):
            line = _json.dumps(report.summary(), sort_keys=True)
            print(line, flush=True)
            if sink:
                sink.write(line + "\n")
    finally:
        if sink:
            sink.close()


if __name__ == "__main__":
    main()
