"""
Squeeze-and-excite family and attention-gated skips.

Parity targets: adell_mri/modules/layers/self_attention.py —
spatial/channel/concurrent SE 2d+3d (:12-151), SelfAttentionBlock (:152,
attention-gated U-Net skip links). Rank-agnostic, channels-last.
"""

import flax.linen as nn
import jax.numpy as jnp

from adell_mri_tpu.models.layers.blocks import _tuple


class ChannelSqueezeAndExcite(nn.Module):
    """Global-pool -> bottleneck MLP -> sigmoid channel gate."""

    reduction: int = 2

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        axes = tuple(range(1, x.ndim - 1))
        s = jnp.mean(x, axis=axes)
        s = nn.Dense(max(1, c // self.reduction))(s)
        s = nn.relu(s)
        s = nn.Dense(c)(s)
        s = nn.sigmoid(s)
        s = s.reshape((x.shape[0],) + (1,) * (x.ndim - 2) + (c,))
        return x * s


class SpatialSqueezeAndExcite(nn.Module):
    """1x1 conv -> sigmoid spatial gate."""

    @nn.compact
    def __call__(self, x):
        ndim = x.ndim - 2
        gate = nn.Conv(1, _tuple(1, ndim))(x)
        return x * nn.sigmoid(gate)


class ConcurrentSqueezeAndExcite(nn.Module):
    """Max of channel and spatial SE (scSE)."""

    reduction: int = 2

    @nn.compact
    def __call__(self, x):
        a = ChannelSqueezeAndExcite(self.reduction)(x)
        b = SpatialSqueezeAndExcite()(x)
        return jnp.maximum(a, b)


class SelfAttentionBlock(nn.Module):
    """
    Attention gate for U-Net skip connections (parity: self_attention.py:152):
    the decoder gating signal and the encoder skip are projected to an
    intermediate width, summed, ReLU'd, squeezed to one channel and
    sigmoided; the skip is multiplied by the resulting attention map.
    """

    inter_channels: int

    @nn.compact
    def __call__(self, gate, skip):
        ndim = skip.ndim - 2
        g = nn.Conv(self.inter_channels, _tuple(1, ndim))(gate)
        s = nn.Conv(self.inter_channels, _tuple(1, ndim))(skip)
        psi = nn.relu(g + s)
        psi = nn.Conv(1, _tuple(1, ndim))(psi)
        return skip * nn.sigmoid(psi)
