from adell_mri_tpu.models.layers.adn import ActDropNorm, get_adn_fn
from adell_mri_tpu.models.layers.activations import activation_factory

__all__ = ["ActDropNorm", "get_adn_fn", "activation_factory"]
from adell_mri_tpu.models.layers.moe import MoEFFN, shard_params_moe  # noqa: E402,F401
from adell_mri_tpu.models.layers.conv_next import ConvNeXt, ConvNeXtBackbone  # noqa: E402,F401
