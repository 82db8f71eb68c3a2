from adell_mri_tpu.models.segmentation.unet import UNet, BrUNet
from adell_mri_tpu.models.segmentation import losses

__all__ = ["UNet", "BrUNet", "losses"]
