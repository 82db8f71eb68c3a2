"""
Multi-resolution blocks.

Parity targets: adell_mri/modules/layers/multi_resolution.py —
AtrousSpatialPyramidPooling2d/3d (:299,359), FeaturePyramidNetworkBackbone
(:18), ReceptiveFieldBlock, PyramidSpatialPooling3d. Rank-agnostic,
channels-last.
"""

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from adell_mri_tpu.models.layers.blocks import (
    AdnFactory,
    _tuple,
    apply_adn,
    identity_adn,
)


def resize_like(x, target_shape_spatial, method: str = "linear"):
    """Resizes spatial axes of channels-last x to target spatial shape."""
    new_shape = (x.shape[0],) + tuple(target_shape_spatial) + (x.shape[-1],)
    return jax.image.resize(x, new_shape, method=method)


def split_int_into_n(i: int, n: int):
    """Distributes i over n slots, earlier slots take the remainder
    (parity: layers/utils.py:8-27 — the reference ASPP's per-rate
    channel split)."""
    r = i % n
    out = [i // n] * n
    for idx in range(r):
        out[idx] += 1
    return out


class AtrousSpatialPyramidPoolingRef(nn.Module):
    """The REFERENCE's ASPP, exactly (multi_resolution.py:359-417, the
    UNet asp conv type): out_channels split across rates
    (split_int_into_n), each branch = dilated 3^nd conv -> adn ->
    depthwise-separable conv (depthwise 3^nd + pointwise 1x1, identity
    activation) -> adn, branches CONCATENATED (no global-pool branch,
    no output projection — both exist only in our TPU-first redesign
    above). ``adn_fn`` should be the instance-norm ADN the reference
    hard-codes (unet.py:407-413). Exists for reference-checkpoint
    import (interop/torch_unet.py)."""

    out_channels: int
    rates: Sequence[int] = (1, 2)
    adn_fn: AdnFactory = identity_adn

    @nn.compact
    def __call__(self, x, train: bool = False):
        from adell_mri_tpu.ops.conv import TpuDwConv

        ndim = x.ndim - 2
        branches = []
        chans = split_int_into_n(self.out_channels, len(self.rates))
        for i, (rate, c) in enumerate(zip(self.rates, chans)):
            y = nn.Conv(
                c,
                _tuple(3, ndim),
                kernel_dilation=_tuple(rate, ndim),
                padding="SAME",
                name=f"branch{i}_conv",
            )(x)
            y = apply_adn(
                self.adn_fn(c, name=f"branch{i}_adn_0"), y, train
            )
            y = TpuDwConv(
                c, _tuple(3, ndim), padding="SAME", name=f"branch{i}_dw"
            )(y)
            y = nn.Conv(c, _tuple(1, ndim), name=f"branch{i}_pw")(y)
            y = apply_adn(
                self.adn_fn(c, name=f"branch{i}_adn_1"), y, train
            )
            branches.append(y)
        return jnp.concatenate(branches, axis=-1)


class AtrousSpatialPyramidPooling(nn.Module):
    """
    Parallel dilated convs + a global-pooling branch, concatenated and
    projected (parity: multi_resolution.py:299,359).
    """

    out_channels: int
    rates: Sequence[int] = (1, 2, 4)
    adn_fn: AdnFactory = identity_adn

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        branches = []
        for rate in self.rates:
            y = nn.Conv(
                self.out_channels,
                _tuple(3, ndim),
                kernel_dilation=_tuple(rate, ndim),
                padding="SAME",
            )(x)
            y = apply_adn(self.adn_fn(self.out_channels), y, train)
            branches.append(y)
        # global context branch
        axes = tuple(range(1, x.ndim - 1))
        g = jnp.mean(x, axis=axes, keepdims=True)
        g = nn.Conv(self.out_channels, _tuple(1, ndim))(g)
        g = jnp.broadcast_to(
            g, x.shape[:-1] + (self.out_channels,)
        )
        branches.append(g)
        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(self.out_channels, _tuple(1, ndim))(y)
        return apply_adn(self.adn_fn(self.out_channels), y, train)


class ReceptiveFieldBlock(nn.Module):
    """RFB: multi-branch 1x1/kxk + dilated convs, concat, project, residual."""

    out_channels: int
    adn_fn: AdnFactory = identity_adn

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        c = self.out_channels
        branches = []
        for k, rate in [(1, 1), (3, 1), (3, 2), (3, 4)]:
            y = nn.Conv(max(1, c // 4), _tuple(1, ndim))(x)
            y = nn.Conv(
                max(1, c // 4),
                _tuple(k, ndim),
                kernel_dilation=_tuple(rate, ndim),
                padding="SAME",
            )(y)
            branches.append(y)
        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(c, _tuple(1, ndim))(y)
        shortcut = nn.Conv(c, _tuple(1, ndim))(x) if x.shape[-1] != c else x
        return apply_adn(self.adn_fn(c), y + shortcut, train)


class PyramidSpatialPooling(nn.Module):
    """Pools at several scales, projects, upsamples back and concatenates."""

    out_channels: int
    levels: Sequence[int] = (2, 4, 8)

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        spatial = x.shape[1:-1]
        outs = [x]
        for level in self.levels:
            window = tuple(max(1, s // level) for s in spatial)
            p = nn.avg_pool(x, window_shape=window, strides=window)
            p = nn.Conv(self.out_channels, _tuple(1, ndim))(p)
            outs.append(resize_like(p, spatial))
        y = jnp.concatenate(outs, axis=-1)
        return nn.Conv(self.out_channels, _tuple(1, ndim))(y)


class FeaturePyramidNetworkBackbone(nn.Module):
    """
    FPN over a backbone emitting per-stage features: top-down pathway with
    lateral 1x1s (parity: multi_resolution.py:18). ``backbone`` must accept
    ``return_intermediate=True``.
    """

    backbone: Callable
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        _, feats = self.backbone(x, train=train, return_intermediate=True)
        laterals = [
            nn.Conv(self.out_channels, _tuple(1, ndim))(f) for f in feats
        ]
        outs = [laterals[-1]]
        for f in reversed(laterals[:-1]):
            up = resize_like(outs[0], f.shape[1:-1])
            outs.insert(0, f + up)
        outs = [
            nn.Conv(self.out_channels, _tuple(3, ndim), padding="SAME")(o)
            for o in outs
        ]
        return outs


class GCN(nn.Module):
    """
    Global convolution network block (parity: GCN2d,
    layers/multi_resolution.py:103 after arxiv 1703.02719): a large k x k
    conv decomposed into two separable branches (1xk -> kx1 and kx1 -> 1xk)
    whose sum covers the full receptive field at 2/k the cost. 2D input
    [B, H, W, C].
    """

    out_channels: int
    kernel_size: int = 7
    norm_type: Optional[str] = None
    activation_fn: Optional[str] = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        a = nn.Conv(self.out_channels, (1, k), padding="SAME")(x)
        a = nn.Conv(self.out_channels, (k, 1), padding="SAME")(a)
        b = nn.Conv(self.out_channels, (k, 1), padding="SAME")(x)
        b = nn.Conv(self.out_channels, (1, k), padding="SAME")(b)
        out = a + b
        if self.norm_type or self.activation_fn:
            from adell_mri_tpu.models.layers.adn import get_adn_fn

            adn = get_adn_fn(2, self.norm_type, self.activation_fn, 0.0)
            out = apply_adn(adn(self.out_channels), out, train)
        return out
