"""
Every shipped sample config must parse and build a network that
shape-checks under jax.eval_shape — the user-facing config surface
(parity: upstream sample_configs/, SURVEY.md §5 config system).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adell_mri_tpu.config.factories import (
    get_classification_network,
    get_segmentation_network,
    get_ssl_network,
)
from adell_mri_tpu.config.parsing import (
    parse_config_cat,
    parse_config_ssl,
    parse_config_unet,
)

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "sample_configs")


def _init_shape(model, x, **kw):
    return jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x, **kw)
    )


@pytest.mark.parametrize(
    "name,net_type",
    [
        ("u-net-3d-resnet.yaml", "unet"),
        ("unetr.yaml", "unetr"),
        ("unet-swin.yaml", "swin"),
    ],
)
def test_segmentation_configs(name, net_type):
    config, loss = parse_config_unet(
        os.path.join(CFG_DIR, name), n_keys=1, n_classes=2
    )
    model = get_segmentation_network(
        net_type, config["network"], n_classes=2
    )
    # large enough that 4 SWIN stages of patch merging keep every axis >= 1
    x = jnp.zeros((1, 64, 64, 32, 1), jnp.float32)
    shapes = _init_shape(model, x)
    assert "params" in shapes
    assert loss is not None
    assert config["training"].get("learning_rate") is not None


@pytest.mark.parametrize(
    "name,net_type",
    [
        ("classification-cat-resnet.yaml", "cat"),
        ("classification-cat-convnext.yaml", "cat"),
        ("classification-vit.yaml", "vit"),
        ("vggnet-net.yaml", "vgg"),
    ],
)
def test_classification_configs(name, net_type):
    config = parse_config_cat(os.path.join(CFG_DIR, name))
    model = get_classification_network(
        net_type, config["network"], n_classes=2
    )
    x = jnp.zeros((1, 32, 32, 16, 1), jnp.float32)
    shapes = _init_shape(model, x)
    assert "params" in shapes


@pytest.mark.parametrize(
    "name", ["ssl-resnet.yaml", "ssl-2d-convnext.yaml"]
)
def test_ssl_configs(name):
    config = parse_config_ssl(os.path.join(CFG_DIR, name))
    net_cfg = config["network"]
    model = get_ssl_network("vicreg", net_cfg)
    dim = net_cfg.get("backbone_args", {}).get("spatial_dim", 3)
    shape = (1, 32, 32, 16, 1) if dim == 3 else (1, 32, 32, 1)
    x = jnp.zeros(shape, jnp.float32)
    shapes = _init_shape(model, x)
    assert "params" in shapes


def test_mil_config_parses():
    from adell_mri_tpu.config.parsing import parse_config_2d_classifier_3d

    config = parse_config_2d_classifier_3d(
        os.path.join(CFG_DIR, "transformable-transformer.yaml"),
        mil_method="transformer",
    )
    assert config["network"]["mil_method"] == "transformer"
    assert config["network"]["n_heads"] == 16


def test_ssl_resnet_nested_schema_reaches_backbone():
    """The reference ssl-resnet.yaml nests the model under backbone_args /
    projection_head_args — the factory must build THAT backbone, not the
    tiny default (the silent-wrong-model finding)."""
    config = parse_config_ssl(os.path.join(CFG_DIR, "ssl-resnet.yaml"))
    model = get_ssl_network("vicreg", config["network"])
    bb = model.backbone
    assert tuple(bb.resnet_structure[0]) == (64, 64, 5, 2)
    assert len(bb.resnet_structure) == 4
    assert bb.maxpool_structure is not None
    assert tuple(model.projection_dims) == (1024, 512, 256)
    assert tuple(model.prediction_dims) == (512, 256)
