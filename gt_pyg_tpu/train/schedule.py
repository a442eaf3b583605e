"""LR schedules.

``warmup_cosine_factor`` reproduces the production recipe's LambdaLR
exactly (train_logd.ipynb cell 11): linear warmup over ``warmup_epochs``,
then a cosine whose argument keeps growing past T_max — for EPOCHS >
T_max this yields cosine *restarts* (the reference's actual behavior,
noted in SURVEY.md §3.3).
"""

from __future__ import annotations

import math


def warmup_cosine_factor(epoch: int, base_lr: float = 1e-3,
                         min_lr: float = 1e-5, warmup_epochs: int = 25,
                         t_max: int = 500) -> float:
    """Multiplicative LR factor for epoch (0-based, like LambdaLR)."""
    if warmup_epochs > 0 and epoch < warmup_epochs:
        return (epoch + 1) / warmup_epochs
    progress = (epoch - warmup_epochs) / max(1, t_max - warmup_epochs)
    cosine = 0.5 * (1 + math.cos(math.pi * progress))
    ratio = min_lr / base_lr
    return ratio + (1 - ratio) * cosine


def make_epoch_lr(base_lr: float = 1e-3, min_lr: float | None = None,
                  warmup_epochs: int = 25, t_max: int = 500):
    """epoch -> absolute LR (host-side; fed to the optimizer per epoch)."""
    if min_lr is None:
        min_lr = base_lr / 100.0

    def lr(epoch: int) -> float:
        return base_lr * warmup_cosine_factor(
            epoch, base_lr=base_lr, min_lr=min_lr,
            warmup_epochs=warmup_epochs, t_max=t_max)

    return lr
