from adell_mri_tpu.config.parsing import (
    parse_config_unet,
    parse_config_cat,
    parse_config_ssl,
    parse_config_gan,
    parse_config_2d_classifier_3d,
)

__all__ = [
    "parse_config_unet",
    "parse_config_cat",
    "parse_config_ssl",
    "parse_config_gan",
    "parse_config_2d_classifier_3d",
]
