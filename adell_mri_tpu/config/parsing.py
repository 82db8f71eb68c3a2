"""
YAML network-config parsing.

Parity target: adell_mri/modules/config_parsing.py:30-208
(parse_config_unet, parse_config_ssl, parse_config_cat, parse_config_gan,
parse_config_ensemble, parse_config_2d_classifier_3d). Reads the same
sample_configs/*.yaml surface: hyperparameters plus a ``loss_fn`` mapping of
loss-name -> params that materializes a CompoundLoss.
"""

import copy
from typing import Any, Dict, Tuple

import yaml

from adell_mri_tpu.models.segmentation.losses import (
    CompoundLoss,
    loss_factory,
)

# keys consumed by the training loop rather than the network constructor
_TRAINING_KEYS = (
    "learning_rate",
    "batch_size",
    "weight_decay",
    "loss_fn",
    "momentum",
    "optimizer",
)


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def build_compound_loss(
    loss_spec: Dict[str, Dict[str, Any]],
    n_classes: int = 2,
    param_overrides: Dict[str, Any] = None,
) -> CompoundLoss:
    """
    ``{"dice": {"eps": ...}, "focal": {...}}`` -> CompoundLoss, binary or
    categorical chosen by n_classes (parity: config_parsing.py loss
    materialization + utils.get_loss_param_dict). ``param_overrides``
    (e.g. {"gamma": 3.0} from --loss_gamma) route into every member loss
    whose signature accepts the key — the reference's get_loss_param_dict
    per-loss param routing (utils/utils.py:160).
    """
    import inspect

    kind = "categorical" if n_classes > 2 else "binary"
    losses = {}
    for name, params in (loss_spec or {"dice": {}}).items():
        fn = loss_factory[kind][name]
        params = dict(params or {})
        for k, v in (param_overrides or {}).items():
            if v is None:
                continue
            if k in inspect.signature(fn).parameters:
                params[k] = v
        losses[name] = {"fn": fn, "params": params}
    return CompoundLoss(losses)


def parse_config_unet(
    config_file: str,
    n_keys: int = 1,
    n_classes: int = 2,
    loss_param_overrides: Dict[str, Any] = None,
) -> Tuple[Dict[str, Any], CompoundLoss]:
    """
    Loads a U-Net YAML (e.g. sample_configs/u-net-3d-resnet.yaml), splits
    training keys from network keys, injects channel counts and builds the
    loss (parity: config_parsing.py:30). ``loss_param_overrides`` routes
    CLI loss knobs (--loss_gamma etc.) into compatible member losses.
    """
    config = load_yaml(config_file)
    config["n_channels"] = int(config.get("n_channels", 1)) * n_keys
    loss_spec = config.get("loss_fn", {"dice": {}})
    loss = build_compound_loss(
        loss_spec, n_classes, param_overrides=loss_param_overrides
    )
    network_config = {
        k: v for k, v in config.items() if k not in _TRAINING_KEYS
    }
    training_config = {
        k: v for k, v in config.items() if k in _TRAINING_KEYS
    }
    return {
        "network": network_config,
        "training": training_config,
        "n_classes": n_classes,
    }, loss


def parse_config_cat(config_file: str) -> Dict[str, Any]:
    """Classification config (parity: config_parsing.py parse_config_cat)."""
    config = load_yaml(config_file)
    network_config = {
        k: v for k, v in config.items() if k not in _TRAINING_KEYS
    }
    training_config = {k: v for k, v in config.items() if k in _TRAINING_KEYS}
    return {"network": network_config, "training": training_config}


def parse_config_ssl(
    config_file: str, dropout_param: float = 0.0, n_keys: int = 1,
    is_ijepa: bool = False,
) -> Dict[str, Any]:
    """SSL config (parity: config_parsing.py parse_config_ssl)."""
    config = load_yaml(config_file)
    config = copy.deepcopy(config)
    config["dropout_param"] = dropout_param
    if not is_ijepa:
        config["n_channels"] = int(config.get("n_channels", 1)) * n_keys
    network_config = {
        k: v for k, v in config.items() if k not in _TRAINING_KEYS
    }
    training_config = {k: v for k, v in config.items() if k in _TRAINING_KEYS}
    return {"network": network_config, "training": training_config}


def parse_config_gan(config_file: str, **overrides) -> Dict[str, Any]:
    config = load_yaml(config_file)
    config.update(overrides)
    network_config = {
        k: v for k, v in config.items() if k not in _TRAINING_KEYS
    }
    training_config = {k: v for k, v in config.items() if k in _TRAINING_KEYS}
    return {"network": network_config, "training": training_config}


def parse_config_2d_classifier_3d(
    config_file: str, mil_method: str = "standard", module_path: str = None
) -> Dict[str, Any]:
    config = load_yaml(config_file)
    config["mil_method"] = config.get("mil_method", mil_method)
    if module_path is not None:
        config["module_path"] = module_path
    network_config = {
        k: v for k, v in config.items() if k not in _TRAINING_KEYS
    }
    training_config = {k: v for k, v in config.items() if k in _TRAINING_KEYS}
    return {"network": network_config, "training": training_config}
