from adell_mri_tpu.models.layers.adn import ActDropNorm, get_adn_fn
from adell_mri_tpu.models.layers.activations import activation_factory

__all__ = ["ActDropNorm", "get_adn_fn", "activation_factory"]
