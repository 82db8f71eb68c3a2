from adell_mri_tpu.models.ssl import losses
from adell_mri_tpu.models.ssl.masking import (
    random_masking,
    block_masking,
    get_masker,
)
from adell_mri_tpu.models.ssl.nets import (
    DINO,
    IBOT,
    ViTMaskedAutoEncoder,
    ConvNeXtAutoEncoder,
    IJEPA,
    DINOHead,
    NonContrastiveWrapper,
)

__all__ = [
    "losses",
    "random_masking",
    "block_masking",
    "get_masker",
    "DINO",
    "IBOT",
    "ViTMaskedAutoEncoder",
    "ConvNeXtAutoEncoder",
    "IJEPA",
    "DINOHead",
    "NonContrastiveWrapper",
]
