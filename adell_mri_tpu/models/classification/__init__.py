from adell_mri_tpu.models.classification.nets import (
    VGG,
    CatNet,
    OrdNet,
    SegCatNet,
    UNetEncoderClassifier,
    ViTClassifier,
    FactorizedViTClassifier,
    TabularClassifier,
    HybridClassifier,
    GenericEnsemble,
    AveragingEnsemble,
)
from adell_mri_tpu.models.classification.deconfounded import DeconfoundedNet
from adell_mri_tpu.models.classification.mil import (
    MILAttention,
    MultipleInstanceClassifier,
    TransformableTransformer,
)
from adell_mri_tpu.models.classification import losses

__all__ = [
    "VGG",
    "CatNet",
    "OrdNet",
    "SegCatNet",
    "UNetEncoderClassifier",
    "ViTClassifier",
    "FactorizedViTClassifier",
    "TabularClassifier",
    "HybridClassifier",
    "GenericEnsemble",
    "AveragingEnsemble",
    "DeconfoundedNet",
    "MILAttention",
    "MultipleInstanceClassifier",
    "TransformableTransformer",
    "losses",
]
