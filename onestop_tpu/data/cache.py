"""Preprocessed-array caching — the reference's joblib pickle layer
(``holdout.py:648-666``: ``cts_cropped_lungs_224.pkl`` etc., reloaded by the
CV scripts at ``task1_crossval_3folds_unet.py:690-692``). joblib when
available (same on-disk artifacts as the reference), ``np.savez`` fallback."""

from __future__ import annotations

from pathlib import Path

import numpy as np

try:
    import joblib

    _HAVE_JOBLIB = True
except Exception:  # pragma: no cover
    _HAVE_JOBLIB = False


def dump_array(arr, path: str | Path) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if _HAVE_JOBLIB and path.suffix == ".pkl":
        joblib.dump(np.asarray(arr), path)
    else:
        np.savez_compressed(path.with_suffix(".npz"), arr=np.asarray(arr))
        path = path.with_suffix(".npz")
    return path


def load_array(path: str | Path) -> np.ndarray:
    path = Path(path)
    if path.suffix == ".pkl":
        return np.asarray(joblib.load(path))
    with np.load(path) as z:
        return z["arr"]


def cached_dataset(build_fn, cache_dir: str | Path, names: tuple[str, ...]):
    """Build-or-load: if every ``{name}.pkl``/``.npz`` exists in cache_dir,
    load; else call build_fn() -> tuple of arrays and dump them."""
    cache_dir = Path(cache_dir)
    paths = {}
    for n in names:
        pkl, npz = cache_dir / f"{n}.pkl", cache_dir / f"{n}.npz"
        paths[n] = pkl if pkl.exists() else (npz if npz.exists() else None)
    if all(p is not None for p in paths.values()):
        return tuple(load_array(p) for p in paths.values())
    arrays = build_fn()
    for n, a in zip(names, arrays):
        dump_array(a, cache_dir / f"{n}.pkl")
    return tuple(np.asarray(a) for a in arrays)
