from adell_mri_tpu.train.ema import ema_decay_at, ema_update
from adell_mri_tpu.train.optim import get_optimizer, lr_scale_by_regex, wd_mask
from adell_mri_tpu.train.schedules import (
    constant_lr,
    cosine_annealing_with_warmup,
    onecycle_lr,
    polynomial_lr_decay,
)
from adell_mri_tpu.train.state import TrainState
from adell_mri_tpu.train.steps import (
    make_classification_step,
    make_eval_step,
    make_segmentation_step,
    make_train_step,
    unet_from_config,
)

__all__ = [
    "TrainState",
    "get_optimizer",
    "lr_scale_by_regex",
    "wd_mask",
    "cosine_annealing_with_warmup",
    "polynomial_lr_decay",
    "constant_lr",
    "onecycle_lr",
    "ema_update",
    "ema_decay_at",
    "make_segmentation_step",
    "make_classification_step",
    "make_train_step",
    "make_eval_step",
    "unet_from_config",
]
