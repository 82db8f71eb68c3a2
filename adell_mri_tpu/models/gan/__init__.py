from adell_mri_tpu.models.gan.nets import (
    Generator,
    Discriminator,
    AutoEncoder,
    VariationalAutoEncoder,
)
from adell_mri_tpu.models.gan import losses
from adell_mri_tpu.models.gan.conditional import (
    ConditionalGenerator,
    CrossAttention,
    SpatialTransformer,
)
from adell_mri_tpu.models.gan.style import (
    EqualizedDense,
    EqualizedConv,
    MappingNetwork,
    ProGANGenerator,
    ProGANDiscriminator,
    grow_params,
)

__all__ = [
    "Generator",
    "Discriminator",
    "AutoEncoder",
    "VariationalAutoEncoder",
    "losses",
    "ConditionalGenerator",
    "CrossAttention",
    "SpatialTransformer",
    "EqualizedDense",
    "EqualizedConv",
    "MappingNetwork",
    "ProGANGenerator",
    "ProGANDiscriminator",
    "grow_params",
]
