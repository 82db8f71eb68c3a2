from adell_mri_tpu.models.gan.nets import (
    Generator,
    Discriminator,
    AutoEncoder,
    VariationalAutoEncoder,
)
from adell_mri_tpu.models.gan import losses
from adell_mri_tpu.models.gan.style import (
    EqualizedDense,
    EqualizedConv,
    MappingNetwork,
    ProGANGenerator,
    ProGANDiscriminator,
)

__all__ = [
    "Generator",
    "Discriminator",
    "AutoEncoder",
    "VariationalAutoEncoder",
    "losses",
    "EqualizedDense",
    "EqualizedConv",
    "MappingNetwork",
    "ProGANGenerator",
    "ProGANDiscriminator",
]
