"""ctypes bindings for the native C++ NIfTI loader (``native/nifti_loader.cpp``).

The loader parses NIfTI-1 (plain or gzip), applies scl scaling, resolves
Fortran voxel order, and decodes batches of volumes on a thread pool —
the native data-IO runtime the reference delegated to nibabel. Builds on
demand with ``make -C native`` when g++ is available; every entry point
falls back to the pure-Python reader (``data.nifti``), which doubles as the
golden reference in tests."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_NATIVE_DIR = _REPO_ROOT / "native"
_LIB_PATH = _NATIVE_DIR / "libonestop_nifti.so"
_lib = None
_tried = False


def _ensure_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists() and (_NATIVE_DIR / "Makefile").exists():
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, text=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.onestop_nifti_dims.argtypes = [ctypes.c_char_p,
                                           ctypes.POINTER(ctypes.c_int64)]
        lib.onestop_nifti_dims.restype = ctypes.c_int
        lib.onestop_nifti_load.argtypes = [ctypes.c_char_p,
                                           ctypes.POINTER(ctypes.c_double),
                                           ctypes.c_int64]
        lib.onestop_nifti_load.restype = ctypes.c_int
        lib.onestop_nifti_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.onestop_nifti_load_batch.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _ensure_lib() is not None


def load_fdata(path) -> np.ndarray:
    """Native equivalent of ``load_nifti(path).get_fdata()``; raises on
    failure (callers fall back to the Python reader)."""
    lib = _ensure_lib()
    if lib is None:
        raise RuntimeError("native nifti loader unavailable")
    dims = (ctypes.c_int64 * 8)()
    rc = lib.onestop_nifti_dims(str(path).encode(), dims)
    if rc != 0:
        raise ValueError(f"nifti header parse failed ({rc}): {path}")
    ndim = dims[0]
    shape = tuple(int(dims[i + 1]) for i in range(ndim))
    out = np.empty(shape, np.float64)  # C order; loader resolves Fortran
    rc = lib.onestop_nifti_load(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.size)
    if rc != 0:
        raise ValueError(f"nifti load failed ({rc}): {path}")
    return out


def load_fdata_batch(paths, n_threads: int = 0) -> list[np.ndarray]:
    """Decode many volumes concurrently on the native thread pool."""
    lib = _ensure_lib()
    if lib is None:
        raise RuntimeError("native nifti loader unavailable")
    outs = []
    c_paths = (ctypes.c_char_p * len(paths))()
    c_dsts = (ctypes.POINTER(ctypes.c_double) * len(paths))()
    c_elems = (ctypes.c_int64 * len(paths))()
    for i, p in enumerate(paths):
        dims = (ctypes.c_int64 * 8)()
        rc = lib.onestop_nifti_dims(str(p).encode(), dims)
        if rc != 0:
            raise ValueError(f"nifti header parse failed ({rc}): {p}")
        shape = tuple(int(dims[j + 1]) for j in range(dims[0]))
        arr = np.empty(shape, np.float64)
        outs.append(arr)
        c_paths[i] = str(p).encode()
        c_dsts[i] = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        c_elems[i] = arr.size
    status = (ctypes.c_int * len(paths))()
    rc = lib.onestop_nifti_load_batch(c_paths, len(paths), c_dsts, c_elems,
                                      status, n_threads)
    if rc != 0:
        bad = [(str(paths[i]), status[i]) for i in range(len(paths)) if status[i]]
        raise ValueError(f"nifti batch load failures: {bad}")
    return outs


def load_fdata_any(path) -> np.ndarray:
    """Native if available, else the pure-Python reader."""
    if native_available():
        try:
            return load_fdata(path)
        except Exception:
            pass
    from onestop_tpu.data.nifti import load_nifti
    return load_nifti(path).get_fdata()
