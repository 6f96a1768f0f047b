"""Native C++ NIfTI loader vs the pure-Python golden reader."""

import numpy as np
import pytest

from onestop_tpu.data.native import (
    load_fdata,
    load_fdata_any,
    load_fdata_batch,
    native_available,
)
from onestop_tpu.data.nifti import load_nifti, save_nifti

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="native loader not built")


@needs_native
@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.int16, np.float32, np.uint8])
def test_native_matches_python(tmp_path, rng, suffix, dtype):
    arr = (rng.random((9, 7, 5)) * 200 - 50).astype(dtype)
    p = tmp_path / f"v{suffix}"
    save_nifti(p, arr)
    ref = load_nifti(p).get_fdata()
    got = load_fdata(p)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


@needs_native
def test_native_scl_scaling(tmp_path, rng):
    import struct
    arr = (rng.random((4, 4, 3)) * 50).astype(np.int16)
    p = tmp_path / "v.nii"
    save_nifti(p, arr)
    raw = bytearray(p.read_bytes())
    struct.pack_into("<f", raw, 112, 2.0)
    struct.pack_into("<f", raw, 116, -5.0)
    p.write_bytes(bytes(raw))
    np.testing.assert_allclose(load_fdata(p), load_nifti(p).get_fdata())


@needs_native
def test_batch_load_threaded(tmp_path, rng):
    paths = []
    refs = []
    for i in range(6):
        arr = (rng.random((8, 6, 4)) * 100).astype(np.float32)
        p = tmp_path / f"v{i}.nii.gz"
        save_nifti(p, arr)
        paths.append(p)
        refs.append(load_nifti(p).get_fdata())
    outs = load_fdata_batch(paths, n_threads=3)
    for got, ref in zip(outs, refs):
        np.testing.assert_array_equal(got, ref)


def test_any_falls_back(tmp_path, rng):
    arr = (rng.random((3, 3, 2)) * 10).astype(np.float32)
    p = tmp_path / "v.nii"
    save_nifti(p, arr)
    np.testing.assert_array_equal(load_fdata_any(p), load_nifti(p).get_fdata())


@needs_native
def test_native_rejects_garbage(tmp_path):
    p = tmp_path / "bad.nii"
    p.write_bytes(b"\x00" * 400)
    with pytest.raises(ValueError):
        load_fdata(p)
