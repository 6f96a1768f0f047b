"""Typed configuration for every task, replacing the reference's scattered
module-level constants (inventory: SURVEY.md §2.2; canonical values cited from
``/root/reference/Scripts/task1_preprocessing_plus_unet_with_comments.py``
unless noted).

The reference has no config system at all — constants are copy-pasted and
diverge per script. Here each task gets one frozen dataclass with those exact
defaults, so the six runners are parameterized instances of shared code.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    """Per-slice preprocessing chain (ref holdout.py:151-488)."""

    img_size: int = 512                # resize target for raw slices (ref :151)
    slice_lo: float = 0.2              # axial slice window start (ref :289,321)
    slice_hi: float = 0.8              # axial slice window end
    clahe_clip_limit: float = 3.0      # ref :169
    clahe_grid: Tuple[int, int] = (8, 8)
    crop_tile: Tuple[int, int] = (250, 125)   # (H, W) of each lung crop (ref :236-240, dsize=(125,250))
    new_dim: int = 224                 # final model resolution (ref :479)
    # Task3 hardcoded corrupt-slice excision (ref task3:334-337)
    corrupt_slices: Tuple[Tuple[int, int], ...] = ()


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """imgaug pipeline equivalent (ref holdout.py:547-584)."""

    p_fliplr: float = 0.5
    p_flipud: float = 0.2
    p_affine: float = 0.5
    scale: Tuple[float, float] = (0.8, 1.2)       # per-axis
    translate: Tuple[float, float] = (-0.2, 0.2)  # fraction, per-axis
    rotate_deg: Tuple[float, float] = (-40.0, 40.0)   # task2 uses (-45, 45)
    shear_deg: Tuple[float, float] = (-16.0, 16.0)
    # iaa.Sequential(random_order=True) — op order [Fliplr, Flipud, Affine]
    # permuted uniformly (per sample here; imgaug permutes per batch — same
    # per-sample law, see ops/augment.py)
    random_order: bool = True
    n_samples: int = 200               # 200 task1 / 100 task2 / 50 task3


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Shared model hyperparameters."""

    in_size: int = 224
    in_channels: int = 1
    # U-Net (ref holdout.py:853-916)
    unet_widths: Tuple[int, ...] = (32, 64, 128, 256)
    unet_bridge: int = 512
    unet_dropout: float = 0.25
    # U-Net++ (ref task1_unet_plus_plus.py:860-950)
    unetpp_widths: Tuple[int, ...] = (32, 64, 128, 256)
    unetpp_backbone_dropout: float = 0.2
    unetpp_block_dropout: float = 0.4
    # classifier CNN (ref task2:747-780)
    cls_widths: Tuple[int, ...] = (16, 32, 64)
    cls_dense: int = 32
    cls_dropout: float = 0.4
    cls_head: str = "flatten"          # 'gap' = global-avg-pool head (opt-in
                                       # transfer probe, VERDICT r4 item 4;
                                       # 'flatten' is the reference topology)
    # numerics
    compute_dtype: str = "float32"     # "bfloat16" for TPU hot path
    bn_momentum: float = 0.99          # Keras BatchNormalization default
    bn_epsilon: float = 1e-3           # Keras BatchNormalization default


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training loop (ref holdout.py:1041-1061; task2:810-836)."""

    batch_size: int = 32
    epochs: int = 80                   # task2: 25
    learning_rate: float = 5e-4        # Adam lr (ref :1053)
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-7             # Keras Adam epsilon
    loss: str = "bce_dice"             # task2: "bce"
    # LR schedule selector — the reference's callback zoo (holdout.py:924-1035):
    # "cosine"   — CosineAnnealingScheduler (ref :970-996); constructed in the
    #              reference but left out of the committed fit() call; default
    #              on per README.md:252-260 (SURVEY.md §8 Q10),
    # "step"     — exponential step decay (ref :924-933, plotting-only there),
    # "constant" — fixed Adam lr (the committed fit() behavior).
    schedule: str = "cosine"
    cosine_t_max: int = 7
    cosine_eta_max: float = 5e-4
    cosine_eta_min: float = 1e-4
    # step decay parameters (ref :924-933), consumed when schedule="step"
    step_decay_init: float = 8e-4
    step_decay_drop: float = 0.8
    step_decay_epochs: int = 10
    shuffle_seed: int = 0
    init_seed: int = 0
    use_class_weight: bool = False     # task2: True ('balanced')
    monitor: Tuple[str, ...] = ("val_dice_coeff", "val_loss")
    # Quantization-aware training (train/qat.py): fake-quantize every 3×3
    # conv in the forward (straight-through gradients) so the checkpoint is
    # robust to int8 serving — int8 sensitivity is per-checkpoint
    # (artifacts_tpu/round3_fast112_int8_diag.json). Eval/predict also run
    # fake-quantized so monitors select the best QUANTIZED model. No
    # reference counterpart (deployment-path capability).
    qat: bool = False


@dataclasses.dataclass(frozen=True)
class SweepConfig:
    """Sigmoid-threshold sweep grids (ref holdout.py:1196-1343)."""

    coarse: Tuple[float, float, float] = (0.10, 0.80, 0.05)
    fine: Tuple[float, float, float] = (0.52, 0.60, 0.001)      # U-Net holdout
    # U-Net++ fine window (ref task1_unet_plus_plus.py:1274)
    # task3 fine window   (ref task3:1206)
    pr_grid: Tuple[float, float, float] = (0.0, 1.0, 0.05)
    cv_grid: Tuple[float, float, float] = (0.30, 0.80, 0.05)
    batchwise: bool = True             # mirror Keras evaluate() batch-mean semantics
    eval_batch_size: int = 32


@dataclasses.dataclass(frozen=True)
class SplitConfig:
    """Data splits, all seed-42 (SURVEY.md §2.1 'Split' rows)."""

    test_size: float = 0.3
    seed: int = 42
    n_folds: int = 0                   # 0 = holdout; 3 or 4 for CV
    stratified: bool = False           # task2
    # 3-fold epochs are unequal in the reference (80/20/20, SURVEY.md §8 Q9)
    fold_epochs: Tuple[int, ...] = ()


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    name: str
    preprocess: PreprocessConfig = PreprocessConfig()
    augment: AugmentConfig = AugmentConfig()
    model: ModelConfig = ModelConfig()
    train: TrainConfig = TrainConfig()
    sweep: SweepConfig = SweepConfig()
    split: SplitConfig = SplitConfig()


def task1_holdout() -> TaskConfig:
    return TaskConfig(name="task1_holdout_unet")


def task1_3fold() -> TaskConfig:
    return TaskConfig(
        name="task1_3fold_unet",
        split=SplitConfig(n_folds=3, fold_epochs=(80, 20, 20)),
        sweep=SweepConfig(fine=(0.52, 0.60, 0.001)),
    )


def task1_4fold() -> TaskConfig:
    return TaskConfig(
        name="task1_4fold_unet",
        split=SplitConfig(n_folds=4, fold_epochs=(80, 80, 80, 80)),
    )


def task1_unetpp() -> TaskConfig:
    return TaskConfig(
        name="task1_holdout_unetpp",
        sweep=SweepConfig(fine=(0.40, 0.50, 0.001)),
    )


def task2_classification() -> TaskConfig:
    return TaskConfig(
        name="task2_classification",
        augment=AugmentConfig(rotate_deg=(-45.0, 45.0), n_samples=100),
        train=TrainConfig(
            epochs=25, loss="bce", schedule="constant",
            use_class_weight=True, monitor=("val_loss", "val_auc"),
        ),
        split=SplitConfig(stratified=True),
    )


def task3_lung() -> TaskConfig:
    return TaskConfig(
        name="task3_lung_segmentation",
        preprocess=PreprocessConfig(corrupt_slices=((1368, 1372), (1924, 1926))),
        augment=AugmentConfig(n_samples=50),
        sweep=SweepConfig(fine=(0.43, 0.53, 0.001)),
    )
