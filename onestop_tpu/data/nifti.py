"""Minimal NIfTI-1 reader/writer (no nibabel dependency).

The reference loads the 20 Kaggle CT volumes with ``nib.load(...).get_fdata()``
(``holdout.py:285-286, 317-318``). This module implements the NIfTI-1 format
directly: 348-byte header, optional gzip container, scl_slope/scl_inter
scaling, Fortran voxel order — everything ``get_fdata`` does for these files.
"""

from __future__ import annotations

import dataclasses
import gzip
import struct
from pathlib import Path

import numpy as np

_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
    1024: np.int64,
    1280: np.uint64,
}
_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


@dataclasses.dataclass
class NiftiVolume:
    data: np.ndarray          # raw stored dtype, Fortran voxel order resolved
    scl_slope: float
    scl_inter: float
    affine_pixdim: tuple

    def get_fdata(self) -> np.ndarray:
        """float64 data with scl scaling applied (nibabel get_fdata parity)."""
        out = self.data.astype(np.float64)
        slope, inter = self.scl_slope, self.scl_inter
        if slope not in (0.0, 1.0) or inter != 0.0:
            if slope == 0.0:
                slope = 1.0
            out = out * slope + inter
        return out


def _open_maybe_gz(path: Path):
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, "rb")
    return open(path, "rb")


def load_nifti(path) -> NiftiVolume:
    path = Path(path)
    with _open_maybe_gz(path) as f:
        hdr = f.read(348)
        if len(hdr) < 348:
            raise ValueError(f"{path}: truncated NIfTI header")
        (sizeof_hdr,) = struct.unpack("<i", hdr[0:4])
        bo = "<"
        if sizeof_hdr != 348:
            (sizeof_hdr,) = struct.unpack(">i", hdr[0:4])
            if sizeof_hdr != 348:
                raise ValueError(f"{path}: not a NIfTI-1 file")
            bo = ">"
        magic = hdr[344:348]
        if magic[:3] not in (b"n+1", b"ni1"):
            raise ValueError(f"{path}: bad NIfTI magic {magic!r}")
        dim = struct.unpack(bo + "8h", hdr[40:56])
        ndim = dim[0]
        shape = tuple(int(d) for d in dim[1 : 1 + ndim])
        (datatype,) = struct.unpack(bo + "h", hdr[70:72])
        pixdim = struct.unpack(bo + "8f", hdr[76:108])
        (vox_offset,) = struct.unpack(bo + "f", hdr[108:112])
        (scl_slope,) = struct.unpack(bo + "f", hdr[112:116])
        (scl_inter,) = struct.unpack(bo + "f", hdr[116:120])
        if datatype not in _DTYPES:
            raise ValueError(f"{path}: unsupported datatype code {datatype}")
        dtype = np.dtype(_DTYPES[datatype]).newbyteorder(bo)
        offset = int(vox_offset) if magic[:3] == b"n+1" else 0
        f.seek(offset)
        n = int(np.prod(shape))
        raw = f.read(n * dtype.itemsize)
        if len(raw) < n * dtype.itemsize:
            raise ValueError(f"{path}: truncated voxel data")
        data = np.frombuffer(raw, dtype=dtype, count=n).reshape(shape, order="F")
    if np.isnan(scl_slope):
        scl_slope = 0.0
    if np.isnan(scl_inter):
        scl_inter = 0.0
    return NiftiVolume(
        data=data,
        scl_slope=float(scl_slope),
        scl_inter=float(scl_inter),
        affine_pixdim=tuple(float(p) for p in pixdim[1 : 1 + max(ndim, 3)]),
    )


def save_nifti(path, array: np.ndarray) -> None:
    """Write a minimal single-file (.nii / .nii.gz) NIfTI-1 volume."""
    path = Path(path)
    array = np.asarray(array)
    code = _CODES.get(array.dtype)
    if code is None:
        raise ValueError(f"unsupported dtype {array.dtype}")
    ndim = array.ndim
    dim = [ndim] + list(array.shape) + [1] * (7 - ndim)
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, *dim)
    struct.pack_into("<h", hdr, 70, code)
    struct.pack_into("<h", hdr, 72, array.dtype.itemsize * 8)
    struct.pack_into("<8f", hdr, 76, 1.0, *([1.0] * 7))
    struct.pack_into("<f", hdr, 108, 352.0)   # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)     # scl_slope
    struct.pack_into("<f", hdr, 116, 0.0)     # scl_inter
    hdr[344:348] = b"n+1\x00"
    payload = bytes(hdr) + b"\x00" * 4 + array.tobytes(order="F")
    if str(path).endswith(".gz"):
        with gzip.open(path, "wb") as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)
