"""Dataset acquisition — the reference's L0 layer (``holdout.py:87-137``):
Kaggle download of ``andrewmvd/covid19-ct-scans``, zip extraction and
metadata path fixup. Differences from the reference: credentials come from
the environment or ``~/.kaggle/kaggle.json`` (the reference hardcodes an API
key into every script — SURVEY.md §8 Q12 — which we deliberately do not
reproduce), and everything degrades gracefully to an explicit error when
offline."""

from __future__ import annotations

import csv
import os
import subprocess
import zipfile
from pathlib import Path

DATASET = "andrewmvd/covid19-ct-scans"


def download_dataset(dest: str | Path, dataset: str = DATASET) -> Path:
    """Download + extract the Kaggle dataset into ``dest``.

    Requires the ``kaggle`` CLI and credentials via KAGGLE_USERNAME/KAGGLE_KEY
    or ~/.kaggle/kaggle.json. Raises RuntimeError with a clear message when
    unavailable (this build environment has no network)."""
    dest = Path(dest)
    dest.mkdir(parents=True, exist_ok=True)
    have_creds = (
        ("KAGGLE_USERNAME" in os.environ and "KAGGLE_KEY" in os.environ)
        or (Path.home() / ".kaggle" / "kaggle.json").exists()
    )
    if not have_creds:
        raise RuntimeError(
            "Kaggle credentials not found (set KAGGLE_USERNAME/KAGGLE_KEY or "
            "~/.kaggle/kaggle.json). Alternatively pass data_dir= pointing at "
            "an existing extraction, or use onestop_tpu.data.synthetic."
        )
    try:
        subprocess.run(
            ["kaggle", "datasets", "download", "-d", dataset, "-p", str(dest)],
            check=True, capture_output=True, text=True,
        )
    except (FileNotFoundError, subprocess.CalledProcessError) as e:
        raise RuntimeError(f"kaggle download failed: {e}") from e
    for z in dest.glob("*.zip"):
        with zipfile.ZipFile(z) as zf:
            zf.extractall(dest)
    return dest


def load_metadata(data_dir: str | Path) -> list[dict]:
    """Parse metadata.csv (columns ct_scan / lung_mask / infection_mask,
    20 rows — ref ``holdout.py:135-137``) rewriting the Kaggle path prefixes
    to ``data_dir``-relative paths."""
    data_dir = Path(data_dir)
    rows = []
    with open(data_dir / "metadata.csv") as f:
        for row in csv.DictReader(f):
            fixed = {}
            for col in ("ct_scan", "lung_mask", "infection_mask"):
                raw = row[col]
                p = data_dir / raw
                if not p.exists():
                    cands = []
                    # the real Kaggle CSV rows look like
                    # ../input/covid19-ct-scans/ct_scans/coronacases_org_001.nii
                    # — the reference strips that prefix by regex (ref
                    # holdout.py:136); keep the dataset-relative tail (the
                    # subdir is ct_scans, NOT the column name ct_scan)
                    parts = Path(raw).parts
                    if "input" in parts:
                        i = parts.index("input")
                        if len(parts) > i + 2:
                            cands.append(data_dir / Path(*parts[i + 2:]))
                    # fallbacks: basename under per-modality subdirs, then flat
                    name = Path(raw).name
                    cands += [data_dir / col / name, data_dir / (col + "s") / name,
                              data_dir / name]
                    for cand in cands:
                        if cand.exists():
                            p = cand
                            break
                fixed[col] = str(p)
            rows.append(fixed)
    return rows
