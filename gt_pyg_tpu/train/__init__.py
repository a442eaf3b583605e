"""Training & evaluation: losses, metrics, schedules, trainer, freezing."""

from .losses import (  # noqa: F401
    custom_loss,
    mae_loss,
    masked_weighted_rae_loss,
    masked_weighted_huber_loss,
    masked_weighted_corr_loss,
    masked_weighted_kendall_rank_loss,
    masked_r2_style_loss,
    compute_task_scales,
)
from .metrics import (  # noqa: F401
    safe_metrics,
    official_metrics,
    per_task_metrics,
    macro_official_avg,
    evaluate_predictions,
    bootstrap_metrics,
    bootstrap_significance,
    OFFICIAL_KEYS,
)
from .schedule import warmup_cosine_factor, make_epoch_lr  # noqa: F401
from .trainer import Trainer, TrainConfig  # noqa: F401
from .ensemble import VmapEnsembleTrainer  # noqa: F401
from .freeze import (  # noqa: F401
    freeze_mask,
    frozen_status,
    COMPONENT_PREFIXES,
)
