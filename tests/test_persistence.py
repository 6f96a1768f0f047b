"""Cache / metadata / topology-export components (SURVEY.md §2.1 rows:
'uint8 quantize + joblib cache', 'Metadata loader', 'Weight/format export')."""

import json

import numpy as np

from onestop_tpu.data.acquire import load_metadata
from onestop_tpu.data.cache import cached_dataset, dump_array, load_array
from onestop_tpu.models import UNet
from onestop_tpu.train.checkpoint import export_topology_json, metric_stamped_name


def test_array_cache_roundtrip(tmp_path, rng):
    a = (rng.random((5, 8, 8)) * 255).astype(np.uint8)
    p = dump_array(a, tmp_path / "cts_cropped_lungs_224.pkl")
    np.testing.assert_array_equal(load_array(p), a)


def test_cached_dataset_builds_once(tmp_path, rng):
    calls = []

    def build():
        calls.append(1)
        return (np.ones((3, 4)), np.zeros((3,)))

    a1, b1 = cached_dataset(build, tmp_path, ("cts", "infections"))
    a2, b2 = cached_dataset(build, tmp_path, ("cts", "infections"))
    assert len(calls) == 1
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(b1, b2)


def test_load_metadata_path_fixup(tmp_path):
    (tmp_path / "ct_scan").mkdir()
    (tmp_path / "ct_scan" / "case0.nii").write_bytes(b"x")
    (tmp_path / "lung_mask").mkdir()
    (tmp_path / "lung_mask" / "case0_lung.nii").write_bytes(b"x")
    (tmp_path / "infection_mask").mkdir()
    (tmp_path / "infection_mask" / "case0_inf.nii").write_bytes(b"x")
    (tmp_path / "metadata.csv").write_text(
        "ct_scan,lung_mask,infection_mask\n"
        "../input/covid/ct_scan/case0.nii,../input/covid/lung_mask/case0_lung.nii,"
        "../input/covid/infection_mask/case0_inf.nii\n"
    )
    rows = load_metadata(tmp_path)
    assert len(rows) == 1
    for col in ("ct_scan", "lung_mask", "infection_mask"):
        assert rows[0][col].startswith(str(tmp_path))


def test_topology_export(tmp_path):
    doc = export_topology_json(UNet(widths=(8, 16), bridge=32), tmp_path / "unet.json")
    parsed = json.loads(doc)
    assert parsed["class_name"] == "UNet"
    assert parsed["config"]["widths"] == [8, 16]
    assert parsed["config"]["bridge"] == 32


def test_metric_stamped_name():
    assert metric_stamped_name("unet", 0.89544, "cosine_annealer") == \
        "unet_0.8954_cosine_annealer.msgpack"
