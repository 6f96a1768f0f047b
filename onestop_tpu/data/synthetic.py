"""Synthetic CT cases shaped like the Kaggle ``covid19-ct-scans`` dataset
(20 volumes with paired lung + infection masks — SURVEY.md §0). The real
dataset is unavailable in this environment (no network), so runners, tests
and benchmarks exercise the full pipeline on these: two 3D lung ellipsoids,
infection blobs inside the lungs on a subset of slices, HU-like intensities.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SyntheticCase:
    ct: np.ndarray          # (H, W, S) float64, HU-like
    lung_mask: np.ndarray   # (H, W, S) float64 in {0, 1, 2} (left/right labels)
    infection_mask: np.ndarray  # (H, W, S) float64 in {0, 1}


def _ellipsoid(h, w, s, cy, cx, cz, ry, rx, rz):
    # open (broadcast) grids: same values as a full meshgrid at 1/3 the
    # memory traffic — at 512x512x40 this dominates phantom-gen time
    yy = np.arange(h)[:, None, None]
    xx = np.arange(w)[None, :, None]
    zz = np.arange(s)[None, None, :]
    return (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 + ((zz - cz) / rz) ** 2) <= 1.0


def synthetic_case(
    seed: int = 0,
    hw: int = 512,
    n_slices: int = 40,
    infected: bool = True,
    infection_z_band: tuple | None = None,
) -> SyntheticCase:
    """One phantom volume.

    infection_z_band: optional (lo_frac, hi_frac) of the slice axis that
    bounds the infection's z-extent (blob centers restricted to the band,
    z-radii capped to stay inside it). The Kaggle dataset's 20 volumes are
    ALL infected and task2's 497 negatives are exactly their clean windowed
    slices (ref task2:413-418); with the default full-span blobs an
    all-infected phantom set yields only ~8% clean windowed slices, so
    classification studies that want the reference's negative composition
    (~24% clean slices of infected volumes) set a band like (0.30, 0.76).
    ``None`` (default) is bit-identical to the historical generator for any
    seed — REQUIRED so saved checkpoints' training datasets rebuild exactly
    (CLAUDE.md round-3 note).
    """
    rng = np.random.default_rng(seed)
    h = w = hw
    s = n_slices
    cz, rz = s / 2.0, s * 0.45

    body = _ellipsoid(h, w, s, h * 0.52, w * 0.5, cz, h * 0.46, w * 0.44, rz * 1.3)
    left = _ellipsoid(
        h, w, s,
        h * (0.5 + rng.uniform(-0.03, 0.03)), w * (0.31 + rng.uniform(-0.02, 0.02)), cz,
        h * rng.uniform(0.26, 0.32), w * rng.uniform(0.12, 0.16), rz,
    )
    right = _ellipsoid(
        h, w, s,
        h * (0.51 + rng.uniform(-0.03, 0.03)), w * (0.69 + rng.uniform(-0.02, 0.02)), cz,
        h * rng.uniform(0.25, 0.31), w * rng.uniform(0.11, 0.15), rz,
    )

    ct = np.full((h, w, s), -1000.0)           # air
    ct[body] = 40.0 + 30.0 * rng.standard_normal(int(body.sum()))   # soft tissue
    lung_tex = -850.0 + 80.0 * rng.standard_normal((h, w, s))
    ct[left] = lung_tex[left]
    ct[right] = lung_tex[right]

    infection = np.zeros((h, w, s), bool)
    if infected:
        n_blobs = rng.integers(2, 6)
        for _ in range(n_blobs):
            lung = left if rng.random() < 0.5 else right
            ys, xs, zs = np.nonzero(lung)
            if infection_z_band is not None:
                z_lo, z_hi = (infection_z_band[0] * s, infection_z_band[1] * s)
                in_band = (zs >= z_lo) & (zs <= z_hi)
                ys, xs, zs = ys[in_band], xs[in_band], zs[in_band]
            if len(ys) == 0:
                continue
            k = rng.integers(0, len(ys))
            # rng draw order matches the band-None historical stream exactly
            ry_ = max(h * rng.uniform(0.04, 0.11), 3)
            rx_ = max(w * rng.uniform(0.04, 0.10), 3)
            rz_ = max(s * rng.uniform(0.15, 0.35), 2)
            if infection_z_band is not None:
                rz_ = max(min(rz_, zs[k] - z_lo, z_hi - zs[k]), 1.0)
            blob = _ellipsoid(h, w, s, ys[k], xs[k], zs[k], ry_, rx_, rz_)
            infection |= blob & (left | right)
    # ground-glass-like consolidations: distinctly denser than lung tissue
    ct[infection] = -150.0 + 60.0 * rng.standard_normal(int(infection.sum()))

    lung_mask = np.zeros((h, w, s))
    lung_mask[left] = 1.0
    lung_mask[right] = 2.0   # the Kaggle masks label left/right separately
    return SyntheticCase(
        ct=ct,
        lung_mask=lung_mask,
        infection_mask=infection.astype(np.float64),
    )


def synthetic_dataset(
    n_cases: int = 4,
    hw: int = 512,
    n_slices: int = 40,
    seed: int = 0,
    infected_fraction: float = 0.9,
    infection_z_band: tuple | None = None,
) -> list[SyntheticCase]:
    rng = np.random.default_rng(seed)
    return [
        synthetic_case(
            seed=int(rng.integers(0, 2**31)),
            hw=hw,
            n_slices=n_slices,
            infected=rng.random() < infected_fraction,
            infection_z_band=infection_z_band,
        )
        for _ in range(n_cases)
    ]
