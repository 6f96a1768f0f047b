"""Device-mesh parallelism. The reference trains single-device and runs CV
folds sequentially (``task1_crossval_3folds_unet.py:1005-1046``); here the
fold axis is a first-class mesh axis — all folds train simultaneously, one
per device group, with XLA inserting any collectives from sharding
annotations (SURVEY.md §2.4)."""

from onestop_tpu.parallel.mesh import make_mesh, fold_pspec, replicated_pspec
from onestop_tpu.parallel.cv import FoldParallelTrainer, cross_validate

__all__ = [
    "make_mesh",
    "fold_pspec",
    "replicated_pspec",
    "FoldParallelTrainer",
    "cross_validate",
]
