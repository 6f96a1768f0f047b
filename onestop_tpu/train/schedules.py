"""Epoch-level learning-rate schedules (the reference's callback zoo,
``holdout.py:924-1035``). All return a float lr for an integer epoch, applied
at epoch begin like Keras's CosineAnnealingScheduler."""

from __future__ import annotations

import math


def cosine_annealing_lr(epoch: int, t_max: int = 7, eta_max: float = 5e-4, eta_min: float = 1e-4) -> float:
    """lr = eta_min + (eta_max-eta_min)(1+cos(pi·epoch/T_max))/2
    (ref ``holdout.py:981-985``; note no modulo — past T_max the cosine keeps
    oscillating with period 2·T_max, which is the reference behavior)."""
    return eta_min + (eta_max - eta_min) * (1 + math.cos(math.pi * epoch / t_max)) / 2


def step_decay_lr(epoch: int, initial: float = 8e-4, drop: float = 0.8, epochs_drop: int = 10) -> float:
    """Exponential step decay (ref ``holdout.py:924-933``; plotting-only there)."""
    return initial * math.pow(drop, math.floor((1 + epoch) / epochs_drop))


def continuous_decay_lr(epoch: int, initial: float = 8e-4, drop: float = 0.8, epochs_drop: int = 10) -> float:
    """The un-floored exponential (the reference's red 'Continuous decay'
    curve next to step decay, ref ``holdout.py:927,946``)."""
    return initial * math.pow(drop, (1 + epoch) / epochs_drop)


def cosine_exponential_blend_lr(epoch: int, t_max: int = 7, eta_max: float = 2e-3,
                                eta_min: float = 1e-4, drop: float = 0.8,
                                epochs_drop: int = 10) -> float:
    """Cosine annealing whose eta_max itself decays exponentially — the
    reference's 'Cosine Annealing Learning rate + Exponential decaying max
    lr' demo (ref ``holdout.py:1003-1018``). There, epoch e's cosine uses the
    eta_max assigned at the END of iteration e−1, i.e. initial·drop^(e/N)
    (drop^0 = 1 covers epoch 0's undecayed initial)."""
    decayed = eta_max * math.pow(drop, epoch / epochs_drop)
    return eta_min + (decayed - eta_min) * (1 + math.cos(math.pi * epoch / t_max)) / 2


def constant_lr(epoch: int, lr: float = 5e-4) -> float:
    return lr


def schedule_from_config(cfg):
    """TrainConfig -> epoch->lr callable, selected by ``cfg.schedule``:
    "cosine" (cosine_t_max/eta_max/eta_min), "step" (step_decay_init/drop/
    epochs), or "constant" (learning_rate)."""
    if cfg.schedule == "cosine":
        return lambda e: cosine_annealing_lr(e, cfg.cosine_t_max, cfg.cosine_eta_max, cfg.cosine_eta_min)
    if cfg.schedule == "step":
        return lambda e: step_decay_lr(e, cfg.step_decay_init, cfg.step_decay_drop, cfg.step_decay_epochs)
    if cfg.schedule == "cosine_blend":
        return lambda e: cosine_exponential_blend_lr(
            e, cfg.cosine_t_max, cfg.cosine_eta_max, cfg.cosine_eta_min,
            cfg.step_decay_drop, cfg.step_decay_epochs)
    if cfg.schedule == "constant":
        return lambda e: constant_lr(e, cfg.learning_rate)
    raise ValueError(f"unknown TrainConfig.schedule {cfg.schedule!r}; "
                     "expected 'cosine', 'cosine_blend', 'step', or 'constant'")
