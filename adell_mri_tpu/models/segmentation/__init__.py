from adell_mri_tpu.models.segmentation.unet import UNet, BrUNet
from adell_mri_tpu.models.segmentation.unetpp import UNetPlusPlus
from adell_mri_tpu.models.segmentation.unetr import UNETR, SWINUNet
from adell_mri_tpu.models.segmentation import losses

# the reference also exposes MONAI-wrapped variants (unetr.py:435,:1036);
# here they are the same implementation
MonaiUNETR = UNETR
MonaiSWINUNet = SWINUNet

__all__ = [
    "UNet",
    "BrUNet",
    "UNetPlusPlus",
    "UNETR",
    "SWINUNet",
    "MonaiUNETR",
    "MonaiSWINUNet",
    "losses",
]
