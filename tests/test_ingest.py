"""Ingest pipeline: synthetic volumes through the full L1-L3 chain, with an
end-to-end cv2 golden check of one slice."""

import cv2
import numpy as np
import pytest

from onestop_tpu.config import PreprocessConfig
from onestop_tpu.data.ingest import (
    build_classification_dataset,
    build_lung_dataset,
    build_segmentation_dataset,
    ingest_case,
    load_slices,
)
from onestop_tpu.data.synthetic import synthetic_case

CFG = PreprocessConfig(img_size=128)  # small for CPU test speed


@pytest.fixture(scope="module")
def case():
    return synthetic_case(seed=1, hw=128, n_slices=12)


@pytest.fixture(scope="module")
def slices(case):
    ct = load_slices(case.ct, img_size=128)
    lung = load_slices(case.lung_mask, img_size=128)
    inf = load_slices(case.infection_mask, img_size=128)
    return ct, lung, inf


def test_load_slices_window_and_norm(case):
    s = case.ct.shape[2]
    ct = load_slices(case.ct, img_size=128)
    assert ct.shape == (round(s * 0.8) - round(s * 0.2), 128, 128)
    assert ct.min() >= 0.0 and ct.max() <= 1.0
    # each slice individually spans [0, 1] (min-max per slice)
    assert np.allclose(ct.max(axis=(1, 2)), 1.0)


def test_ingest_alignment_and_shapes(slices):
    ct, lung, inf = slices
    out = ingest_case(ct, lung, inf, CFG)
    n = len(out["kept"])
    assert out["cts"].shape == (n, 250, 250)
    assert out["masks"].shape == (n, 250, 250)
    assert out["boxes1"].shape == (n, 4)
    # every kept slice has a nonempty lung mask
    assert all((lung[k] > 0).any() for k in out["kept"])


def test_ingest_one_slice_matches_cv2_chain(slices):
    """End-to-end golden: our device chain == cv2 reference chain."""
    ct, lung, inf = slices
    out = ingest_case(ct, lung, inf, CFG)
    k = out["kept"][len(out["kept"]) // 2]

    mask_u8 = np.uint8((lung[k] > 0) * 255)
    contours, _ = cv2.findContours(mask_u8, cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE)
    areas = [cv2.contourArea(c) for c in contours]
    order = np.argsort(areas)
    rects = [cv2.boundingRect(contours[order[-1]]), cv2.boundingRect(contours[order[-2]])]
    ours = [tuple(out["boxes1"][list(out["kept"]).index(k)]),
            tuple(out["boxes2"][list(out["kept"]).index(k)])]
    assert set(map(tuple, rects)) == set(ours)

    enh = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8)).apply(np.uint8(ct[k] * 255))
    (x, y, w, h) = ours[0]
    t1 = cv2.resize(enh[y:y + h, x:x + w].astype(np.float32), (125, 250), interpolation=cv2.INTER_AREA)
    got = out["cts"][list(out["kept"]).index(k)][:, :125]
    assert np.abs(got - t1).max() < 0.05  # fp32 dynamic-weight floor at 0..255 scale


def test_build_segmentation_dataset(slices):
    cts, masks = build_segmentation_dataset([slices], CFG)
    assert cts.shape[1:] == (224, 224, 1) and masks.shape == cts.shape
    assert cts.dtype == np.float32
    assert 0.0 <= cts.min() and cts.max() <= 1.0
    # black-mask filter removed every constant mask
    flat = masks.reshape(len(masks), -1)
    assert (flat.max(axis=1) > flat.min(axis=1)).all()


def test_build_classification_dataset(slices):
    cts, y = build_classification_dataset([slices], CFG)
    assert cts.shape[1:] == (224, 224, 1)
    assert set(np.unique(y)) <= {0, 1}
    assert y.sum() > 0  # synthetic case is infected


def test_build_lung_dataset(slices):
    ct, lung, _ = slices
    cts, lungs = build_lung_dataset([(ct, lung)], CFG)
    assert cts.shape == lungs.shape and cts.shape[1:] == (224, 224, 1)
    assert lungs.max() <= 1.0 and lungs.min() >= 0.0


def test_synthetic_infection_z_band():
    """infection_z_band bounds the infection's z-extent (the knob that gives
    all-infected phantom sets the reference's negative composition — clean
    windowed slices of infected volumes, ref task2:413-418), and band=None
    stays bit-identical to the historical generator (saved checkpoints'
    training datasets must rebuild exactly)."""
    a = synthetic_case(seed=5, hw=96, n_slices=20)
    b = synthetic_case(seed=5, hw=96, n_slices=20, infection_z_band=None)
    assert (a.ct == b.ct).all()
    assert (a.infection_mask == b.infection_mask).all()

    band = (0.3, 0.7)
    c = synthetic_case(seed=5, hw=96, n_slices=20, infected=True,
                       infection_z_band=band)
    per_slice = c.infection_mask.sum(axis=(0, 1))
    assert per_slice.sum() > 0
    infected_z = np.nonzero(per_slice)[0]
    # blob centers in-band with z-radii capped to the band => the infected
    # z-range stays within the band (ellipsoid extent is strictly < radius
    # at the boundary, allow the half-voxel discretization)
    assert infected_z.min() >= int(band[0] * 20) - 1
    assert infected_z.max() <= int(np.ceil(band[1] * 20)) + 1
