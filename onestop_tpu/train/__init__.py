"""Training: optax-based jitted train loop with Keras-parity epoch semantics,
LR schedules (cosine annealing T_max=7 — ref holdout.py:970-996), best-metric
checkpointing (ref ModelCheckpoint usage, holdout.py:1044-1047)."""

from onestop_tpu.train.schedules import cosine_annealing_lr, step_decay_lr, constant_lr
from onestop_tpu.train.trainer import Trainer, TrainState
from onestop_tpu.train.checkpoint import save_checkpoint, load_checkpoint
from onestop_tpu.train.keras_import import (export_keras_weights,
                                            import_keras_weights)

__all__ = [
    "cosine_annealing_lr",
    "step_decay_lr",
    "constant_lr",
    "Trainer",
    "TrainState",
    "save_checkpoint",
    "load_checkpoint",
    "export_keras_weights",
    "import_keras_weights",
]
