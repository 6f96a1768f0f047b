"""data.nifti round-trips and nibabel get_fdata semantics."""

import numpy as np
import pytest

from onestop_tpu.data.nifti import load_nifti, save_nifti


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.int16, np.float32, np.uint8])
def test_roundtrip(tmp_path, rng, suffix, dtype):
    arr = (rng.random((7, 9, 5)) * 100).astype(dtype)
    p = tmp_path / f"vol{suffix}"
    save_nifti(p, arr)
    vol = load_nifti(p)
    np.testing.assert_array_equal(vol.data, arr)
    np.testing.assert_allclose(vol.get_fdata(), arr.astype(np.float64))


def test_scl_scaling(tmp_path, rng):
    import struct
    arr = (rng.random((4, 4, 3)) * 50).astype(np.int16)
    p = tmp_path / "v.nii"
    save_nifti(p, arr)
    raw = bytearray(p.read_bytes())
    struct.pack_into("<f", raw, 112, 2.0)   # scl_slope
    struct.pack_into("<f", raw, 116, -5.0)  # scl_inter
    p.write_bytes(bytes(raw))
    vol = load_nifti(p)
    np.testing.assert_allclose(vol.get_fdata(), arr * 2.0 - 5.0)


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.nii"
    p.write_bytes(b"\x00" * 400)
    with pytest.raises(ValueError):
        load_nifti(p)
