"""Host-side data layer: NIfTI ingestion, seed-compatible splits, synthetic
fixtures, dataset assembly. Everything after ingestion runs on-device through
``onestop_tpu.ops``."""

from onestop_tpu.data.nifti import NiftiVolume, load_nifti, save_nifti
from onestop_tpu.data.splits import train_test_split_indices, kfold_indices, stratified_shuffle_split_indices
from onestop_tpu.data.synthetic import synthetic_case, synthetic_dataset
from onestop_tpu.data.ingest import (
    load_slices,
    ingest_case,
    build_segmentation_dataset,
    build_classification_dataset,
    build_lung_dataset,
)

__all__ = [
    "NiftiVolume",
    "load_nifti",
    "save_nifti",
    "train_test_split_indices",
    "kfold_indices",
    "stratified_shuffle_split_indices",
    "synthetic_case",
    "synthetic_dataset",
    "load_slices",
    "ingest_case",
    "build_segmentation_dataset",
    "build_classification_dataset",
    "build_lung_dataset",
]
