from adell_mri_tpu.models.semi_supervised.losses import (
    AnatomicalContrastiveLoss,
    local_contrastive_loss,
    nearest_neighbour_loss,
    pseudo_label_cross_entropy,
)

__all__ = [
    "AnatomicalContrastiveLoss",
    "nearest_neighbour_loss",
    "pseudo_label_cross_entropy",
    "local_contrastive_loss",
]
