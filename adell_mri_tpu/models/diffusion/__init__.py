from adell_mri_tpu.models.diffusion.process import (
    DiffusionProcess,
    make_beta_schedule,
)
from adell_mri_tpu.models.diffusion.unet import DiffusionUNet
from adell_mri_tpu.models.diffusion.embedder import Embedder

__all__ = [
    "DiffusionProcess",
    "make_beta_schedule",
    "DiffusionUNet",
    "Embedder",
]
