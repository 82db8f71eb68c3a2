"""
Residual blocks.

Parity targets: adell_mri/modules/layers/res_blocks.py —
ResidualBlock2d/3d (:13,108), ResNeXtBlock2d/3d (:251,340),
ConvNeXtBlock2d/3d + V2 (:429-686), ParallelOperationsAndSum (:203).
Rank-agnostic (channels-last); 2D/3D pairs collapse into one module.
"""

from typing import Callable, Optional, Sequence

import flax.linen as nn

from adell_mri_tpu.models.layers.blocks import (
    AdnFactory,
    _tuple,
    apply_adn,
    identity_adn,
)
from adell_mri_tpu.models.layers.regularization import GRN, LayerScale
from adell_mri_tpu.ops.conv import TpuConv, TpuDwConv


class ResidualBlock(nn.Module):
    """
    Bottleneck residual: 1x1 -> ADN -> kxk -> ADN -> 1x1, skip-added, then an
    optional 1x1 projection to out_channels and a final ADN
    (parity: res_blocks.py:108 ResidualBlock3d).
    """

    kernel_size: int = 3
    inter_channels: Optional[int] = None
    out_channels: Optional[int] = None
    adn_fn: AdnFactory = identity_adn
    skip_activation: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, skip_activation: bool = None):
        # the k x k convs route through TpuConv (z2d lowering): XLA's 3D
        # conv is erratically pathological at the narrow-channel/large-
        # spatial shapes the UNet link blocks run at (BASELINE.md round 3:
        # 0.19-0.39 TFLOP/s at the stem on a HEALTHY chip vs 26.4 for
        # z2d). Names pin the pre-existing auto-assigned tree paths
        # (Conv_0..Conv_3) so checkpoints/interop are unaffected.
        ndim = x.ndim - 2
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        if self.inter_channels is not None:
            y = nn.Conv(self.inter_channels, _tuple(1, ndim), name="Conv_0")(x)
            y = apply_adn(self.adn_fn(self.inter_channels), y, train)
            y = TpuConv(
                self.inter_channels,
                _tuple(self.kernel_size, ndim),
                padding="SAME",
                name="Conv_1",
            )(y)
            y = apply_adn(self.adn_fn(self.inter_channels), y, train)
            y = nn.Conv(in_ch, _tuple(1, ndim), name="Conv_2")(y)
            proj_name = "Conv_3"
        else:
            y = TpuConv(
                in_ch,
                _tuple(self.kernel_size, ndim),
                padding="SAME",
                name="Conv_0",
            )(x)
            y = apply_adn(self.adn_fn(in_ch), y, train)
            y = TpuConv(
                in_ch,
                _tuple(self.kernel_size, ndim),
                padding="SAME",
                name="Conv_1",
            )(y)
            proj_name = "Conv_2"
        out = y + x
        if in_ch != out_ch:
            out = nn.Conv(out_ch, _tuple(1, ndim), name=proj_name)(out)
        skip = (
            skip_activation
            if skip_activation is not None
            else self.skip_activation
        )
        if not skip:
            out = apply_adn(self.adn_fn(out_ch), out, train)
        return out


class ResNeXtBlock(nn.Module):
    """
    Grouped-conv bottleneck residual (parity: res_blocks.py:251,340);
    cardinality via feature_group_count.
    """

    kernel_size: int = 3
    inter_channels: Optional[int] = None
    out_channels: Optional[int] = None
    adn_fn: AdnFactory = identity_adn
    n_splits: int = 16
    skip_activation: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, skip_activation: bool = None):
        ndim = x.ndim - 2
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        inter = self.inter_channels or in_ch
        groups = min(self.n_splits, inter)
        inter = (inter // groups) * groups or groups
        y = nn.Conv(inter, _tuple(1, ndim))(x)
        y = apply_adn(self.adn_fn(inter), y, train)
        y = nn.Conv(
            inter,
            _tuple(self.kernel_size, ndim),
            feature_group_count=groups,
            padding="SAME",
        )(y)
        y = apply_adn(self.adn_fn(inter), y, train)
        y = nn.Conv(in_ch, _tuple(1, ndim))(y)
        out = y + x
        if in_ch != out_ch:
            out = nn.Conv(out_ch, _tuple(1, ndim))(out)
        skip = (
            skip_activation
            if skip_activation is not None
            else self.skip_activation
        )
        if not skip:
            out = apply_adn(self.adn_fn(out_ch), out, train)
        return out


class ConvNeXtBlock(nn.Module):
    """
    ConvNeXt block: depthwise 7^d conv -> LayerNorm -> pointwise expand to
    ``inter_channels`` (the reference's pwconv1 width, res_blocks.py:476 —
    NOT a hardcoded 4x; the sample configs encode 4x in their structure
    tuples) -> GELU -> pointwise project, with LayerScale (v1) or GRN
    (v2); channel changes project through a 1x1 conv + GELU (the
    reference's ``out_layer`` Sequential, res_blocks.py:488-494).
    """

    kernel_size: int = 7
    inter_channels: Optional[int] = None
    out_channels: Optional[int] = None
    adn_fn: AdnFactory = identity_adn  # accepted for API parity; unused
    v2: bool = False
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False, skip_activation: bool = None):
        ndim = x.ndim - 2
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        inter = self.inter_channels or 4 * in_ch
        # TpuDwConv: param tree matches nn.Conv(feature_group_count=C);
        # opt-in z2d depthwise lowering (ops/conv.py, ADELL_DW_LOWERING)
        y = TpuDwConv(
            in_ch,
            _tuple(self.kernel_size, ndim),
            padding="SAME",
            name="Conv_0",
        )(x)
        y = nn.LayerNorm(epsilon=1e-6)(y)
        y = nn.Dense(inter)(y)
        y = nn.gelu(y)
        if self.v2:
            y = GRN()(y)
        y = nn.Dense(in_ch)(y)
        if not self.v2:
            y = LayerScale(init_value=self.layer_scale_init)(y)
        out = y + x
        if in_ch != out_ch:
            out = nn.Conv(out_ch, _tuple(1, ndim), name="Conv_1")(out)
            out = nn.gelu(out)
        return out


class ParallelOperationsAndSum(nn.Module):
    """Applies each op to the input and sums outputs (parity :203)."""

    operations: Sequence[Callable]

    @nn.compact
    def __call__(self, x, train: bool = False):
        outputs = [op(x) for op in self.operations]
        total = outputs[0]
        for o in outputs[1:]:
            total = total + o
        return total


RES_BLOCK_REGISTRY = {
    "resnet": ResidualBlock,
    "resnext": ResNeXtBlock,
    "convnext": ConvNeXtBlock,
    "convnextv2": lambda **kw: ConvNeXtBlock(v2=True, **kw),
}
