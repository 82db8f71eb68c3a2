"""Layer zoo shape tests (parity model: testing/test_res_net.py etc.)."""

import jax
import jax.numpy as jnp
import pytest

from adell_mri_tpu.models.layers.adn import ActDropNorm, get_adn_fn
from adell_mri_tpu.models.layers.blocks import (
    ConvBlock,
    DenseBlock,
    DepthwiseSeparableConv,
    GlobalPooling,
    MLP,
    VGGConvolution,
    VGGDeconvolution,
)
from adell_mri_tpu.models.layers.multi_resolution import (
    AtrousSpatialPyramidPooling,
    PyramidSpatialPooling,
    ReceptiveFieldBlock,
)
from adell_mri_tpu.models.layers.res_blocks import (
    ConvNeXtBlock,
    ResidualBlock,
    ResNeXtBlock,
)
from adell_mri_tpu.models.layers.res_net import ResNet, ResNetBackbone
from adell_mri_tpu.models.layers.self_attention import (
    ChannelSqueezeAndExcite,
    ConcurrentSqueezeAndExcite,
    SelfAttentionBlock,
    SpatialSqueezeAndExcite,
)

KEY = jax.random.PRNGKey(0)
X2 = jnp.ones((2, 16, 16, 4))
X3 = jnp.ones((2, 8, 8, 8, 4))


def run(module, *args, rngs=None, **kwargs):
    v = module.init(rngs or {"params": KEY}, *args, **kwargs)
    return module.apply(v, *args, **kwargs)


@pytest.mark.parametrize("ordering", ["ADN", "NDA", "AN"])
def test_adn_orderings(ordering):
    m = ActDropNorm(
        norm_fn="instance", act_fn="relu", dropout_param=0.0, ordering=ordering
    )
    assert run(m, X3).shape == X3.shape


def test_adn_uout_train():
    m = ActDropNorm(
        norm_fn="instance", act_fn="relu", dropout_param=0.2,
        dropout_type="uout",
    )
    v = m.init({"params": KEY, "dropout": KEY}, X3, train=True)
    y = m.apply(v, X3, train=True, rngs={"dropout": KEY})
    assert y.shape == X3.shape
    # eval must be deterministic/no-noise
    y_eval = m.apply(v, X3)
    assert jnp.allclose(y_eval, m.apply(v, X3))


@pytest.mark.parametrize("x", [X2, X3])
def test_conv_block(x):
    adn = get_adn_fn(x.ndim - 2, "instance", "relu")
    m = ConvBlock(out_channels=[8, 6], kernel_size=[3, 3], adn_fn=adn)
    assert run(m, x).shape == x.shape[:-1] + (6,)


@pytest.mark.parametrize("x", [X2, X3])
def test_depthwise_separable(x):
    m = DepthwiseSeparableConv(out_channels=8)
    assert run(m, x).shape == x.shape[:-1] + (8,)


def test_dense_block():
    m = DenseBlock(out_channels=[8, 8, 6], kernel_size=[3, 3, 3])
    assert run(m, X2).shape == X2.shape[:-1] + (6,)


def test_vgg_blocks():
    m = VGGConvolution(first_depth=8, norm_fn="instance")
    y = run(m, X2)
    assert y.shape == (2, 8, 8, 16)
    m2 = VGGDeconvolution(depth=16, norm_fn="instance")
    y2 = run(m2, y)
    assert y2.shape == (2, 16, 16, 8)


def test_global_pooling_and_mlp():
    assert run(GlobalPooling(), X3).shape == (2, 4)
    assert run(MLP(hidden_dims=[8], out_dim=3), jnp.ones((2, 4))).shape == (2, 3)


@pytest.mark.parametrize(
    "block", [ResidualBlock, ResNeXtBlock, ConvNeXtBlock]
)
@pytest.mark.parametrize("x", [X2, X3])
def test_res_blocks(block, x):
    m = block(kernel_size=3, inter_channels=4, out_channels=8)
    assert run(m, x).shape == x.shape[:-1] + (8,)


def test_se_blocks():
    for m in [
        ChannelSqueezeAndExcite(),
        SpatialSqueezeAndExcite(),
        ConcurrentSqueezeAndExcite(),
    ]:
        assert run(m, X3).shape == X3.shape


def test_attention_gate():
    m = SelfAttentionBlock(inter_channels=4)
    v = m.init({"params": KEY}, X3, X3)
    assert m.apply(v, X3, X3).shape == X3.shape


def test_aspp_rfb_psp():
    adn = get_adn_fn(2, "instance", "relu")
    assert run(
        AtrousSpatialPyramidPooling(out_channels=8, adn_fn=adn), X2
    ).shape == X2.shape[:-1] + (8,)
    assert run(ReceptiveFieldBlock(out_channels=8, adn_fn=adn), X2).shape == X2.shape[:-1] + (8,)
    assert run(PyramidSpatialPooling(out_channels=8), X2).shape == X2.shape[:-1] + (8,)


def test_resnet_backbone_intermediates():
    adn = get_adn_fn(2, "instance", "relu")
    bb = ResNetBackbone(
        structure=[(8, 8, 3, 1), (16, 16, 3, 1)],
        maxpool_structure=[(2, 2), (2, 2)],
        adn_fn=adn,
    )
    v = bb.init({"params": KEY}, X2)
    y, inter = bb.apply(v, X2, return_intermediate=True)
    assert y.shape[-1] == 16
    assert [i.shape[-1] for i in inter] == [8, 16]


def test_resnet_ret_levels():
    m = ResNet(
        backbone_structure=[(8, 8, 3, 1)],
        adn_fn=get_adn_fn(2, "instance", "relu"),
        projection_head_structure=[16, 8],
        prediction_head_structure=[8, 2],
    )
    v = m.init({"params": KEY}, X2)
    assert m.apply(v, X2, ret="representation").shape == (2, 8)
    assert m.apply(v, X2, ret="projection").shape == (2, 8)
    assert m.apply(v, X2, ret="prediction").shape == (2, 2)


def test_global_batch_norm_stateless_and_threaded():
    """GlobalBatchNorm: stateless apply (no batch_stats threaded) uses
    batch statistics in BOTH modes without crashing; threaded+mutable
    apply maintains running averages (the SSL path)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adell_mri_tpu.models.layers.adn import GlobalBatchNorm

    m = GlobalBatchNorm(momentum=0.5)
    x = jnp.asarray(
        np.random.default_rng(0).normal(2.0, 3.0, (8, 4)), jnp.float32
    )
    variables = m.init({"params": jax.random.PRNGKey(0)}, x)
    assert "batch_stats" in variables
    # stateless eval: batch stats, normalized output, no crash
    y = m.apply(
        {"params": variables["params"]}, x, use_running_average=True
    )
    assert abs(float(y.mean())) < 1e-4
    # threaded + mutable: running stats move toward batch stats
    y2, new_vars = m.apply(
        variables, x, use_running_average=False, mutable=["batch_stats"]
    )
    ra = np.asarray(new_vars["batch_stats"]["mean"])
    assert np.all(np.abs(ra - 0.5 * np.asarray(x.mean(0))) < 1e-4)
    # threaded running stats are USED at eval
    y3 = m.apply(
        {"params": variables["params"], "batch_stats": new_vars["batch_stats"]},
        x,
        use_running_average=True,
    )
    assert not np.allclose(np.asarray(y3), np.asarray(y))


def test_transformer_block_moe_option():
    """moe_experts swaps the MLP for a routed MoE FFN; aux loss is sown
    into the moe_aux collection."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adell_mri_tpu.models.layers.vit import TransformerBlockStack

    m = TransformerBlockStack(n_blocks=2, n_heads=2, moe_experts=4)
    x = jnp.ones((1, 16, 8))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    out, aux_vars = m.apply({"params": v["params"]}, x, mutable=["moe_aux"])
    assert out.shape == x.shape
    leaves = jax.tree.leaves(aux_vars["moe_aux"])
    assert len(leaves) == 2  # one aux loss per block
    assert all(np.isfinite(float(a)) for a in leaves)
    # plain apply (no mutable collection) also works
    out2 = m.apply({"params": v["params"]}, x)
    assert out2.shape == x.shape


def test_batchnorm_head_not_degenerate_at_batch_one():
    """Stateless eval of a 1-d batch-norm ADN at batch size 1 (the
    test/predict path) must stay input-dependent: normalizing a single
    element by its own statistics would return the bias for EVERY input
    (code-review r3 finding; GlobalBatchNorm falls back to (0,1) when the
    reduction set is a single element)."""
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.models.classification.nets import CatNet

    m = CatNet(
        spatial_dimensions=3,
        resnet_structure=((4, 4, 3, 1),),
        maxpool_structure=[2],
        norm_type="instance",
        dropout_param=0.0,
    )
    x1 = jnp.ones((1, 8, 8, 8, 1))
    x2 = -2.0 * jnp.ones((1, 8, 8, 8, 1))
    v = m.init(jax.random.PRNGKey(0), x1)
    y1 = m.apply(v, x1, train=False)
    y2 = m.apply(v, x2, train=False)
    assert abs(float(y1[0, 0]) - float(y2[0, 0])) > 1e-6


def test_transformer_block_exact_mlp_structure():
    """mlp_structure passes hidden widths EXACTLY (a ratio round-trip
    truncates: int(88*(49/88)) == 48) and multi-entry structures build
    one hidden Dense per entry plus the out projection."""
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.models.layers.vit import TransformerBlockStack

    m = TransformerBlockStack(
        n_blocks=1, n_heads=2, mlp_structure=(49,)
    )
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.ones((1, 4, 88)))
    blk = v["params"]["block_0"]
    assert blk["Dense_0"]["kernel"].shape == (88, 49)
    assert blk["Dense_1"]["kernel"].shape == (49, 88)

    m2 = TransformerBlockStack(
        n_blocks=1, n_heads=2, mlp_structure=(64, 32)
    )
    v2 = m2.init({"params": jax.random.PRNGKey(0)}, jnp.ones((1, 4, 16)))
    blk2 = v2["params"]["block_0"]
    assert blk2["Dense_0"]["kernel"].shape == (16, 64)
    assert blk2["Dense_1"]["kernel"].shape == (64, 32)
    assert blk2["Dense_2"]["kernel"].shape == (32, 16)
    out = m2.apply({"params": v2["params"]}, jnp.ones((1, 4, 16)))
    assert out.shape == (1, 4, 16)


def test_vit_factory_exact_mlp_structure():
    """The classification factory passes the YAML's mlp_structure through
    exactly instead of a truncating ratio round-trip."""
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.config.factories import get_classification_network

    net = get_classification_network(
        "vit",
        {
            "embed_dim": 88,
            "mlp_structure": [49],
            "patch_size": [4, 4, 4],
            "n_blocks": 1,
            "n_heads": 2,
        },
        n_classes=2,
    )
    v = net.init(
        {"params": jax.random.PRNGKey(0)}, jnp.ones((1, 8, 8, 8, 1))
    )
    blk = v["params"]["ViT_0"]["TransformerBlockStack_0"]["block_0"]
    assert blk["Dense_0"]["kernel"].shape == (88, 49)


def test_group_norm_adapts_to_channel_count():
    """Regression: norm_type='group' crashed at init for widths not
    divisible by 8."""
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.models.layers.adn import get_adn_fn

    adn = get_adn_fn(3, "group", "relu", 0.0)(12)
    x = jnp.ones((1, 4, 4, 2, 12))
    params = adn.init(jax.random.PRNGKey(0), x)
    out = adn.apply(params, x)
    assert out.shape == x.shape


def test_group_norm_matches_flax_group_size_8():
    """At widths divisible by 8 the adaptive GroupNorm keeps the original
    group_size=8 semantics AND the original param path
    (GroupNorm_0/{scale,bias}) so fixed-group_size-era checkpoints load."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.models.layers.adn import GroupNorm, make_norm

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3, 32))
    ours = GroupNorm()
    ref = nn.GroupNorm(num_groups=None, group_size=8)
    vo = ours.init(jax.random.PRNGKey(1), x)
    vr = ref.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(vo) == jax.tree_util.tree_structure(
        vr
    )
    err = jnp.max(jnp.abs(ours.apply(vo, x) - ref.apply(vr, x)))
    assert float(err) < 1e-5

    class Parent(nn.Module):
        @nn.compact
        def __call__(self, x):
            return make_norm("group")()(x)

    vp = Parent().init(jax.random.PRNGKey(0), x)
    assert "GroupNorm_0" in vp["params"]
    assert set(vp["params"]["GroupNorm_0"]) == {"scale", "bias"}


def test_normalized_activation_params_only_apply():
    """Regression: train=True without a mutable activation_stats
    collection raised instead of freezing the stats (GlobalBatchNorm's
    guard pattern)."""
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.models.layers.activations import NormalizedActivation

    import numpy as np

    m = NormalizedActivation(act_str="relu")
    x = jnp.ones((2, 8))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x, train=True)  # no mutable= passed
    assert np.isfinite(np.asarray(out)).all()


def test_eca_kernel_matches_reference_formula():
    """Regression: k = int(log2(C)/gamma + b) oversized the 1-D conv vs
    the reference's odd((log2(C)+b)/gamma) (class_attention.py:70)."""
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.models.layers.self_attention import (
        EfficientConditioningAttentionBlock,
    )

    m = EfficientConditioningAttentionBlock(class_dimension=3, op_type="conv")
    x = jnp.ones((1, 4, 4, 2, 64))
    cls = jnp.ones((1, 3))
    params = m.init(jax.random.PRNGKey(0), x, cls)
    k_shape = params["params"]["channel_conv"]["kernel"].shape
    # C=64, gamma=2, b=1 -> odd((6+1)/2) = 3
    assert k_shape[0] == 3, k_shape


def test_backbone_rejects_short_maxpool_structure():
    import jax
    import jax.numpy as jnp
    import pytest

    from adell_mri_tpu.models.layers.adn import get_adn_fn
    from adell_mri_tpu.models.layers.res_net import ResNetBackbone

    bb = ResNetBackbone(
        structure=[(8, 8, 3, 1), (16, 16, 3, 1)],
        maxpool_structure=[2],
        adn_fn=get_adn_fn(3, "instance", "relu", 0.0),
    )
    with pytest.raises(ValueError, match="maxpool_structure"):
        bb.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 4, 1)))
