"""
Standard convolutional building blocks.

Parity targets: adell_mri/modules/layers/standard_blocks.py —
GlobalPooling (:10), depthwise-separable convs (:40,93),
ConvolutionalBlock2d/3d (:146,215), DenseBlock (:284), VGGConvolution3d
(:379), VGGDeconvolution3d (:435). One rank-agnostic implementation each:
spatial rank is inferred from the input (channels-last), so 2D/3D pairs
collapse into a single module.
"""

from typing import Callable, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from adell_mri_tpu.models.layers.adn import get_adn_fn
from adell_mri_tpu.ops.conv import TpuConv, TpuConvTranspose, TpuDwConv

AdnFactory = Callable[..., Optional[nn.Module]]


def _tuple(v, n: int):
    if isinstance(v, (list, tuple)):
        if len(v) != n:
            raise ValueError(f"expected length-{n} spec, got {v}")
        return tuple(int(x) for x in v)
    return (int(v),) * n


def _gn(c: int) -> int:
    """Largest group count <= 8 dividing c (norm_num_groups analogue).
    ``min(8, c)`` is INVALID whenever 8 does not divide c (flax GroupNorm
    requires num_groups | channels)."""
    for g in (8, 4, 2, 1):
        if c % g == 0:
            return g
    return 1


def identity_adn(_features=None):
    return None


def apply_adn(adn, x, train: bool):
    return x if adn is None else adn(x, train=train)


class GlobalPooling(nn.Module):
    """Global spatial pooling (parity: standard_blocks.py:10-35 — the
    reference DEFAULTS TO MAX, and every classifier head uses that
    default; "average"/"mean" is the opt-in)."""

    mode: str = "max"

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(1, x.ndim - 1))
        if self.mode == "max":
            return jnp.max(x, axis=axes)
        if self.mode in ("mean", "average"):
            return jnp.mean(x, axis=axes)
        raise NotImplementedError(f"pooling mode {self.mode!r}")


class ConvBlock(nn.Module):
    """
    Conv -> ADN, repeated over channel/kernel lists
    (parity: ConvolutionalBlock2d/3d, standard_blocks.py:146,215).
    """

    out_channels: Sequence[int]
    kernel_size: Sequence[Union[int, Sequence[int]]]
    adn_fn: AdnFactory = identity_adn
    strides: Optional[Sequence[Union[int, Sequence[int]]]] = None
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        strides = self.strides or [1] * len(self.out_channels)
        for i, (c, k, s) in enumerate(
            zip(self.out_channels, self.kernel_size, strides)
        ):
            # TpuConv == nn.Conv (same param tree, named Conv_{i} for path
            # compatibility) with an opt-in im2col lowering for the 3D-conv
            # wall (ADELL_CONV_LOWERING=im2col, ops/conv.py)
            x = TpuConv(
                features=c,
                kernel_size=_tuple(k, ndim),
                strides=_tuple(s, ndim),
                padding=self.padding,
                name=f"Conv_{i}",
            )(x)
            x = apply_adn(self.adn_fn(c), x, train)
        return x


class DepthwiseSeparableConv(nn.Module):
    """Depthwise conv + pointwise conv (parity: standard_blocks.py:40,93)."""

    out_channels: int
    kernel_size: int = 3
    adn_fn: AdnFactory = identity_adn
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        in_ch = x.shape[-1]
        x = TpuDwConv(
            in_ch,
            _tuple(self.kernel_size, ndim),
            padding=self.padding,
            name="Conv_0",
        )(x)
        x = apply_adn(self.adn_fn(in_ch), x, train)
        x = nn.Conv(
            features=self.out_channels, kernel_size=_tuple(1, ndim),
            name="Conv_1",
        )(x)
        x = apply_adn(self.adn_fn(self.out_channels), x, train)
        return x


class DenseBlock(nn.Module):
    """
    Dense connectivity: each conv sees the concat of all previous outputs
    (parity: standard_blocks.py:284).
    """

    out_channels: Sequence[int]
    kernel_size: Sequence[int]
    adn_fn: AdnFactory = identity_adn

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        features = [x]
        for c, k in zip(self.out_channels, self.kernel_size):
            inp = jnp.concatenate(features, axis=-1) if len(features) > 1 else features[0]
            y = TpuConv(
                c, _tuple(k, ndim), padding="SAME",
                name=f"Conv_{len(features) - 1}",
            )(inp)
            y = apply_adn(self.adn_fn(c), y, train)
            features.append(y)
        return features[-1]


class VGGConvolution(nn.Module):
    """
    Two same-width convs then channel doubling, with maxpool
    (parity: VGGConvolution3d, standard_blocks.py:379).
    """

    first_depth: int
    norm_fn: str = "batch"
    act_fn: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        d = self.first_depth
        adn = get_adn_fn(ndim, self.norm_fn, self.act_fn)
        # TpuConv = z2d lowering in 3D for the full-resolution stem-cliff
        # shapes (BASELINE.md round 3); names pin the previous auto paths
        x = TpuConv(d, _tuple(3, ndim), padding="SAME", name="Conv_0")(x)
        x = apply_adn(adn(d), x, train)
        x = TpuConv(2 * d, _tuple(3, ndim), padding="SAME", name="Conv_1")(x)
        x = apply_adn(adn(2 * d), x, train)
        # SAME pooling: a spatial dim of 1 stays 1 instead of collapsing to
        # an EMPTY axis (VALID (1-2)//2+1 == 0 -> NaN means downstream)
        x = nn.max_pool(
            x, window_shape=_tuple(2, ndim), strides=_tuple(2, ndim),
            padding="SAME",
        )
        return x


class VGGDeconvolution(nn.Module):
    """Transposed-conv upsampling mirror of VGGConvolution (:435)."""

    depth: int
    last: bool = False
    norm_fn: str = "batch"
    act_fn: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        adn = get_adn_fn(ndim, self.norm_fn, self.act_fn)
        # block-matmul lowering (kernel == strides); name pins the
        # previous auto-assigned nn.ConvTranspose path for checkpoints
        x = TpuConvTranspose(
            self.depth, _tuple(2, ndim), name="ConvTranspose_0"
        )(x)
        x = apply_adn(adn(self.depth), x, train)
        if not self.last:
            x = TpuConv(
                self.depth // 2, _tuple(3, ndim), padding="SAME",
                name="Conv_0",
            )(x)
            x = apply_adn(adn(self.depth // 2), x, train)
        return x


def max_pool(x, window: Union[int, Sequence[int]], stride=None):
    ndim = x.ndim - 2
    w = _tuple(window, ndim)
    s = _tuple(stride, ndim) if stride is not None else w
    return nn.max_pool(x, window_shape=w, strides=s)


class MLP(nn.Module):
    """Plain MLP (parity: linear_blocks.py:53)."""

    hidden_dims: Sequence[int]
    out_dim: int
    adn_fn: AdnFactory = identity_adn

    @nn.compact
    def __call__(self, x, train: bool = False):
        for h in self.hidden_dims:
            x = nn.Dense(h)(x)
            x = apply_adn(self.adn_fn(h), x, train)
        return nn.Dense(self.out_dim)(x)
