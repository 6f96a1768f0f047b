"""Volume-level serving runtime (onestop_tpu.serve): NIfTI files in,
per-volume one-stop reports out, host IO pipelined against device compute.
The reference has no serving/deployment path at all (SURVEY.md §8 Q2)."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onestop_tpu.data.ingest import _to_u8, load_slices
from onestop_tpu.data.nifti import save_nifti
from onestop_tpu.data.synthetic import synthetic_case
from onestop_tpu.models import ClassifierCNN, UNet
from onestop_tpu.production import chained_infer
from onestop_tpu.serve import VolumeReport, serve_volumes

_INTERPRET = True  # tests run on CPU
HW = 64


@pytest.fixture(scope="module")
def volumes(tmp_path_factory):
    d = tmp_path_factory.mktemp("vols")
    paths = []
    for i in range(3):
        case = synthetic_case(seed=10 + i, hw=HW, n_slices=12)
        p = d / f"case_{i}.nii.gz"
        save_nifti(p, case.ct)
        paths.append(str(p))
    return paths


@pytest.fixture(scope="module")
def models():
    lung = UNet(widths=(4, 8), bridge=16)
    seg = UNet(widths=(4, 8), bridge=16)
    cls = ClassifierCNN(widths=(4, 8, 8), dense=8)
    vl = lung.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, HW, HW, 1)), train=False)
    vs = seg.init({"params": jax.random.PRNGKey(1)},
                  jnp.zeros((1, HW, HW, 1)), train=False)
    vc = cls.init({"params": jax.random.PRNGKey(2)},
                  jnp.zeros((1, HW, HW, 1)), train=False)
    return lung, vl, seg, vs, cls, vc


def test_serve_volumes_reports_and_block_padding(volumes, models):
    """Reports come back in input order with padding stripped, and the
    blocked pipeline's masks equal a direct full-batch chained_infer —
    block size and zero-padding must not change any slice's output."""
    lung, vl, seg, vs, _, _ = models
    reports = list(serve_volumes(
        volumes, lung, vl, seg, vs, img_size=HW, block=5, prefetch=2,
        model_hw=(HW, HW), keep_masks=True, interpret=_INTERPRET))
    assert [r.path for r in reports] == volumes
    for i, r in enumerate(reports):
        case = synthetic_case(seed=10 + i, hw=HW, n_slices=12)
        sl = load_slices(case.ct, img_size=HW)
        assert r.n_slices == len(sl)                # 20–80% window
        assert r.boxes1.shape == (r.n_slices, 4)
        assert r.infection_fraction.shape == (r.n_slices,)
        assert (0 <= r.infection_fraction).all()
        assert (r.infection_fraction <= 1).all()
        assert r.cls_probs is None
        assert r.masks.shape == (r.n_slices, HW, HW)
        direct, db1, db2 = chained_infer(
            lung, vl, seg, vs, jnp.asarray(_to_u8(sl)), model_hw=(HW, HW),
            threshold=0.5, interpret=_INTERPRET)
        np.testing.assert_array_equal(r.masks, np.asarray(direct)[..., 0])
        np.testing.assert_allclose(r.boxes1, np.asarray(db1), atol=1e-5)


def test_serve_volumes_one_stop_classifier(volumes, models):
    lung, vl, seg, vs, cls, vc = models
    r = next(iter(serve_volumes(
        volumes[:1], lung, vl, seg, vs, cls, vc, img_size=HW, block=8,
        model_hw=(HW, HW), interpret=_INTERPRET)))
    assert r.cls_probs is not None and r.cls_probs.shape == (r.n_slices,)
    assert (0 <= r.cls_probs).all() and (r.cls_probs <= 1).all()
    s = r.summary()
    json.dumps(s)                                   # JSON-serializable
    assert s["n_slices"] == r.n_slices and "infected_slices" in s


def test_volume_report_mask_slice_classification():
    """infected_slices_by_mask: the zero-cost mask-derived slice classifier
    (per-slice predicted-infected fraction vs a speckle floor) is reported
    with or without a task2 classifier — it is the signal that transfers to
    unseen volumes (artifacts_tpu/round4_cls_mask_auc.json)."""
    from onestop_tpu.serve import MASK_SLICE_THRESHOLD

    fr = np.array([0.0, 1 / (224 * 224), 0.01, 0.2], np.float32)
    r = VolumeReport(path="x", n_slices=4, boxes1=np.zeros((4, 4)),
                     boxes2=np.zeros((4, 4)), infection_fraction=fr,
                     cls_probs=None, masks=None, load_seconds=0.0,
                     compute_seconds=0.0)
    s = r.summary()
    json.dumps(s)
    assert s["infected_slices_by_mask"] == 2      # one-pixel slice rejected
    assert s["mask_slice_threshold"] == MASK_SLICE_THRESHOLD
    assert r.summary(mask_slice_threshold=0.05)["infected_slices_by_mask"] == 1
    # threshold=None serving: infection_fraction is a mean PROBABILITY, so
    # the mask-derived count would be garbage — suppressed, not emitted
    soft = dataclasses.replace(r, thresholded=False).summary()
    assert "infected_slices_by_mask" not in soft
    assert "mask_slice_threshold" not in soft


def test_serve_volumes_int8(volumes, models):
    lung, vl, seg, vs, _, _ = models
    from onestop_tpu.serve_int8 import quantize_model

    cal = jnp.asarray(np.random.default_rng(0).random((4, HW, HW, 1)),
                      jnp.float32)
    quant = {"lung": quantize_model(lung, vl, cal),
             "seg": quantize_model(seg, vs, cal)}
    r = next(iter(serve_volumes(
        volumes[:1], lung, vl, seg, vs, quant=quant, img_size=HW, block=8,
        model_hw=(HW, HW), interpret=_INTERPRET)))
    assert isinstance(r, VolumeReport) and r.n_slices > 0


def test_serve_volumes_cls_calibration(volumes, models):
    """cls_calibration=(a, b) Platt-maps the classifier probabilities
    host-side: probs must equal apply_platt(uncalibrated) exactly, and
    segmentation outputs must be untouched."""
    from onestop_tpu.metrics.classification import apply_platt

    lung, vl, seg, vs, cls, vc = models
    kw = dict(img_size=HW, block=8, model_hw=(HW, HW), interpret=_INTERPRET)
    raw = next(iter(serve_volumes(volumes[:1], lung, vl, seg, vs, cls, vc,
                                  **kw)))
    a, b = 0.7, -2.0
    cal = next(iter(serve_volumes(volumes[:1], lung, vl, seg, vs, cls, vc,
                                  cls_calibration=(a, b), **kw)))
    np.testing.assert_allclose(
        cal.cls_probs, apply_platt(raw.cls_probs, a, b).astype(np.float32),
        rtol=1e-5)
    np.testing.assert_array_equal(cal.infection_fraction,
                                  raw.infection_fraction)


def test_serve_volumes_validates_quant_eagerly(models):
    """A quant dict missing the keys this serving mode needs must raise at
    CALL time with an actionable message — not a KeyError from inside the
    first block's jit dispatch after a full volume decode."""
    import pytest

    lung, vl, seg, vs, cls, vc = models
    with pytest.raises(ValueError, match="missing \\['seg'\\]"):
        serve_volumes(["nonexistent.nii"], lung, vl, seg, vs,
                      quant={"lung": {}}, img_size=HW, model_hw=(HW, HW))
    with pytest.raises(ValueError, match="missing \\['cls'\\]"):
        serve_volumes(["nonexistent.nii"], lung, vl, seg, vs, cls, vc,
                      quant={"seg": {}}, img_size=HW, model_hw=(HW, HW))


def test_checkpoint_is_qat_sidecar(tmp_path):
    """The int8 gate reminder's predicate (VERDICT r4 item 7): True only for
    a sidecar recording qat=true; missing/absent/corrupt sidecars are
    conservatively non-QAT (the CLI then warns before quantized serving)."""
    from onestop_tpu.serve import checkpoint_is_qat

    ck = tmp_path / "m.msgpack"
    ck.write_bytes(b"")
    assert not checkpoint_is_qat(ck)                   # no sidecar
    (tmp_path / "m.msgpack.json").write_text(json.dumps({"val_dice": 0.9}))
    assert not checkpoint_is_qat(ck)                   # predates 'qat' field
    (tmp_path / "m.msgpack.json").write_text(
        json.dumps({"val_dice": 0.9, "qat": False}))
    assert not checkpoint_is_qat(ck)
    (tmp_path / "m.msgpack.json").write_text(
        json.dumps({"val_dice": 0.9, "qat": True}))
    assert checkpoint_is_qat(ck)
    (tmp_path / "m.msgpack.json").write_text("not json {")
    assert not checkpoint_is_qat(ck)                   # corrupt -> warn


def test_checkpoint_cls_head_sidecar(tmp_path):
    """The classifier head is the checkpoint's physical topology, so the
    sidecar's ``cls_head`` must win over --cls-head at serving time; sidecars
    predating the field (or corrupt) return None so the CLI flag applies."""
    from onestop_tpu.serve import checkpoint_cls_head

    ck = tmp_path / "c.msgpack"
    ck.write_bytes(b"")
    assert checkpoint_cls_head(ck) is None             # no sidecar
    (tmp_path / "c.msgpack.json").write_text(json.dumps({"auc": 0.9}))
    assert checkpoint_cls_head(ck) is None             # predates the field
    (tmp_path / "c.msgpack.json").write_text(
        json.dumps({"auc": 0.9, "cls_head": "gap"}))
    assert checkpoint_cls_head(ck) == "gap"
    (tmp_path / "c.msgpack.json").write_text(
        json.dumps({"auc": 0.9, "cls_head": "flatten"}))
    assert checkpoint_cls_head(ck) == "flatten"
    (tmp_path / "c.msgpack.json").write_text(
        json.dumps({"auc": 0.9, "cls_head": "bogus"}))
    assert checkpoint_cls_head(ck) is None             # unknown value
    (tmp_path / "c.msgpack.json").write_text("not json {")
    assert checkpoint_cls_head(ck) is None             # corrupt


def test_serve_cli_main_end_to_end(volumes, models, tmp_path, monkeypatch):
    """`python -m onestop_tpu.serve` wiring: checkpoint loading (BN constants
    threaded from ModelConfig), config slice window, --interpret CPU path,
    JSONL output. Model geometry is scaled down via a patched task config."""
    import dataclasses

    from onestop_tpu import config as C
    from onestop_tpu import serve
    from onestop_tpu.train.checkpoint import save_checkpoint

    lung, vl, seg, vs, _, _ = models
    lung_p, seg_p = tmp_path / "lung.msgpack", tmp_path / "seg.msgpack"
    save_checkpoint(lung_p, vl["params"], vl["batch_stats"])
    save_checkpoint(seg_p, vs["params"], vs["batch_stats"])

    small = C.task1_holdout()
    small = dataclasses.replace(
        small,
        preprocess=dataclasses.replace(small.preprocess, img_size=HW,
                                       new_dim=HW),
        model=dataclasses.replace(small.model, unet_widths=(4, 8),
                                  unet_bridge=16, in_size=HW))
    monkeypatch.setattr(C, "task1_holdout", lambda: small)

    out = tmp_path / "reports.jsonl"
    serve.main(["--lung", str(lung_p), "--seg", str(seg_p),
                "--interpret", "--block", "8", "--out", str(out),
                volumes[0]])
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines) == 1
    assert lines[0]["path"] == volumes[0]
    assert lines[0]["n_slices"] > 0
    assert 0.0 <= lines[0]["mean_infection_fraction"] <= 1.0
