"""
U-Net shape/feature-matrix tests (parity model: testing/test_unet.py:46-73,
kept narrow because this box has one CPU core — the full conv/link matrix is
covered in tests/test_layers.py at smaller depth).
"""

import jax
import jax.numpy as jnp
import pytest

from adell_mri_tpu.models.segmentation import BrUNet, UNet

KEY = jax.random.PRNGKey(0)


def build(sd=3, **kw):
    defaults = dict(
        spatial_dimensions=sd,
        norm_type="instance",
        activation_fn="swish",
        dropout_param=0.0,
        depth=(4, 8, 16),
        kernel_sizes=(3, 3, 3),
        strides=(2, 2, 2),
    )
    defaults.update(kw)
    return UNet(**defaults)


def x_for(sd):
    return jnp.ones((1,) + ((16, 16, 8) if sd == 3 else (16, 16)) + (1,))


@pytest.mark.parametrize("sd", [2, 3])
def test_unet_basic(sd):
    m = build(sd)
    x = x_for(sd)
    v = m.init({"params": KEY}, x)
    pred, bn = m.apply(v, x)
    assert pred.shape == x.shape[:-1] + (1,)
    assert bn is None
    assert float(jnp.min(pred)) >= 0 and float(jnp.max(pred)) <= 1


def test_unet_multiclass_softmax():
    m = build(3, n_classes=4)
    x = x_for(3)
    v = m.init({"params": KEY}, x)
    pred, _ = m.apply(v, x)
    assert pred.shape == x.shape[:-1] + (4,)
    sums = jnp.sum(pred, axis=-1)
    assert jnp.allclose(sums, 1.0, atol=1e-5)


def test_unet_logits_and_features():
    m = build(3)
    x = x_for(3)
    v = m.init({"params": KEY}, x)
    logits = m.apply(v, x, return_logits=True)[0]
    assert float(jnp.min(logits)) < 0  # not sigmoided
    pred, feats, bottleneck = m.apply(v, x, return_features=True)
    assert feats.shape[-1] == 4
    assert bottleneck.shape[-1] == 16


def test_unet_deep_supervision_and_bottleneck():
    m = build(3, deep_supervision=True, bottleneck_classification=True)
    x = x_for(3)
    v = m.init({"params": KEY}, x)
    pred, bn, ds = m.apply(v, x)
    assert bn.shape == (1, 1)
    assert len(ds) == 2
    assert ds[-1].shape == pred.shape


def test_unet_conditioning():
    m = build(
        3,
        skip_conditioning=1,
        feature_conditioning=3,
        feature_conditioning_params={
            "mean": [0.0, 0.0, 0.0],
            "std": [1.0, 1.0, 1.0],
        },
    )
    x = x_for(3)
    skip = jnp.ones(x.shape)
    feats = jnp.ones((1, 3))
    v = m.init({"params": KEY}, x, skip, feats)
    pred, _ = m.apply(v, x, skip, feats)
    assert pred.shape == x.shape[:-1] + (1,)


def test_unet_anisotropic_strides():
    m = build(
        3,
        depth=(4, 8),
        kernel_sizes=(3, 3),
        strides=((2, 2, 1), (2, 2, 2)),
    )
    x = x_for(3)
    v = m.init({"params": KEY}, x)
    pred, _ = m.apply(v, x)
    assert pred.shape == x.shape[:-1] + (1,)


def test_brunet_missing_branch():
    m = BrUNet(
        spatial_dimensions=3,
        n_input_branches=2,
        norm_type="instance",
        dropout_param=0.0,
        depth=(4, 8),
        kernel_sizes=(3, 3),
        strides=(2, 2),
    )
    x = x_for(3)
    w = jnp.asarray([[1.0, 0.0]])
    v = m.init({"params": KEY}, [x, x], w)
    pred, _ = m.apply(v, [x, x], w)
    assert pred.shape == x.shape[:-1] + (1,)


@pytest.mark.parametrize("cls_name", ["unetr", "swin"])
def test_transformer_seg_conditioning_surface(cls_name):
    """UNETR/SWINUNet carry the full UNet conditioning surface the
    reference inherits (unetr.py:60-64): skip/feature conditioning,
    bottleneck head, deep supervision."""
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.models.segmentation.unetr import SWINUNet, UNETR

    x = jnp.ones((1, 16, 16, 16, 1))
    sk = jnp.ones((1, 16, 16, 16, 1))
    fc = jnp.ones((1, 3))
    if cls_name == "unetr":
        m = UNETR(
            patch_size=(4, 4, 4), embed_dim=32, n_blocks=4, n_heads=2,
            feature_size=4, skip_conditioning=1, feature_conditioning=3,
            bottleneck_classification=True, deep_supervision=True,
        )
    else:
        m = SWINUNet(
            embed_dim=8, depths=(2, 2), n_heads=(2, 2),
            window_size=(2, 2, 2), patch_size=(2, 2, 2),
            skip_conditioning=1, feature_conditioning=3,
            bottleneck_classification=True, deep_supervision=True,
        )
    v = m.init(
        jax.random.PRNGKey(0), x, x_skip_layer=sk, x_feature_conditioning=fc
    )
    pred, bn, ds = m.apply(
        v, x, x_skip_layer=sk, x_feature_conditioning=fc
    )
    assert pred.shape == (1, 16, 16, 16, 1)
    assert bn.shape == (1, 1)
    assert all(d.shape[0] == 1 and d.shape[-1] == 1 for d in ds)


def test_brunet_stacked_adapter_feature_cond_and_ds():
    """BrUNetStacked feeds the single-array pipeline into BrUNet (one
    channel per branch + availability weights); feature conditioning has a
    real effect and deep supervision returns the 3-tuple the step unpacks."""
    from adell_mri_tpu.models.segmentation.unet import BrUNetStacked

    m = BrUNetStacked(
        brunet=BrUNet(
            spatial_dimensions=3,
            n_input_branches=2,
            norm_type="instance",
            dropout_param=0.0,
            depth=(4, 8),
            kernel_sizes=(3, 3),
            strides=(2, 2),
            feature_conditioning=2,
            feature_conditioning_params={
                "mean": [0.0, 0.0], "std": [1.0, 1.0]
            },
            deep_supervision=True,
        )
    )
    x = jnp.concatenate([x_for(3), x_for(3)], axis=-1)  # [1,*S,2]
    f = jnp.asarray([[1.0, -2.0]])
    w = jnp.asarray([[1.0, 0.0]])
    v = m.init({"params": KEY}, x, x_weights=w, x_feature_conditioning=f)
    pred, bn, ds = m.apply(
        v, x, x_weights=w, x_feature_conditioning=f
    )
    assert pred.shape == x.shape[:-1] + (1,)
    assert len(ds) == 1 and float(ds[0].min()) >= 0.0
    # the FiLM gate must change the output
    pred2, *_ = m.apply(
        v, x, x_weights=w, x_feature_conditioning=f * 10.0
    )
    assert float(jnp.abs(pred - pred2).max()) > 0.0


def test_brunet_cli_factory_roundtrip():
    """get_segmentation_network('brunet') builds the stacked adapter the
    single-array entrypoints can init and run."""
    from adell_mri_tpu.config.factories import get_segmentation_network

    model = get_segmentation_network(
        "brunet",
        {
            "spatial_dimensions": 3,
            "depth": [4, 8],
            "kernel_sizes": [3, 3],
            "strides": [2, 2],
            "norm_type": "instance",
            "dropout_param": 0.0,
        },
        n_classes=2,
        n_input_branches=2,
    )
    x = jnp.concatenate([x_for(3), x_for(3)], axis=-1)
    v = model.init({"params": KEY}, x)
    pred, _ = model.apply(v, x)
    assert pred.shape == x.shape[:-1] + (1,)


def test_conv3d_xla_output_dtype_matches_input():
    """conv3d_xla casts w to x.dtype so the OUTPUT dtype is the same for
    every lowering — an f32 weight against bf16 activations must not
    silently promote everything downstream only on the xla route."""
    import jax.numpy as jnp

    from adell_mri_tpu.ops.conv import conv3d

    x = jnp.ones((1, 4, 4, 4, 2), jnp.bfloat16)
    w = jnp.ones((3, 3, 3, 2, 3), jnp.float32)
    assert conv3d(x, w, lowering="xla").dtype == jnp.bfloat16
    assert conv3d(x, w, lowering="z2d").dtype == jnp.bfloat16


def test_brunet_link_type_builds_link_ops():
    """Regression: BrUNet declared link_type but never built link ops."""
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.models.segmentation.unet import BrUNet

    m = BrUNet(
        n_input_branches=2,
        link_type="conv",
        depth=(4, 8),
        kernel_sizes=(3, 3),
        strides=(2, 2),
        norm_type="instance",
    )
    x = [jnp.ones((1, 8, 8, 4, 1)) for _ in range(2)]
    params = m.init(jax.random.PRNGKey(0), x)
    names = set(params["params"].keys())
    assert any(k.startswith("link_") for k in names), names
    pred, _ = m.apply(params, x)
    assert pred.shape == (1, 8, 8, 4, 1)


def test_factory_threads_semi_supervised_and_dropout_type():
    """Regression: --semi_supervised was dropped by _unet_kwargs, training
    semi-SL runs without the linear_transformation head."""
    from adell_mri_tpu.config.factories import get_segmentation_network

    net = get_segmentation_network(
        "unet", {"semi_supervised": True, "dropout_type": "uout"}, n_classes=2
    )
    assert net.semi_supervised is True
    assert net.dropout_type == "uout"


def test_unet_from_config_matches_factory_surface():
    """Regression: the exported unet_from_config had silently diverged from
    factories._unet_kwargs (dropping encoder_structure etc.)."""
    from adell_mri_tpu.train.steps import unet_from_config

    net = unet_from_config(
        {
            "depth": [4, 8],
            "kernel_sizes": [3, 3],
            "strides": [2, 2],
            "encoder_structure": [[4, 4, 3, 1], [8, 8, 3, 1]],
            "semi_supervised": True,
        },
        n_classes=2,
    )
    assert net.encoder_structure is not None
    assert net.semi_supervised is True


def test_segmentation_step_multiclass_channel_label():
    """Regression: the multiclass dice metric crashed at trace time on the
    documented [B,*S,1] label layout."""
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.models.segmentation.unet import UNet
    from adell_mri_tpu.train.steps import make_segmentation_step
    from adell_mri_tpu.models.segmentation.losses import CompoundLoss, mc_focal_loss

    model = UNet(
        spatial_dimensions=3, n_classes=3, depth=(4, 8),
        kernel_sizes=(3, 3), strides=(2, 2), norm_type="instance",
    )
    x = jnp.ones((2, 8, 8, 4, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    loss = CompoundLoss({"focal": {"fn": mc_focal_loss, "params": {}}})
    lm = make_segmentation_step(model, loss, n_classes=3, train=False)
    y = jnp.zeros((2, 8, 8, 4, 1))
    _, metrics = lm(
        params["params"], {"image": x, "label": y}, jax.random.PRNGKey(1)
    )
    import math

    assert math.isfinite(float(metrics["dice"]))
