"""
Squeeze-and-excite family and attention-gated skips.

Parity targets: adell_mri/modules/layers/self_attention.py —
spatial/channel/concurrent SE 2d+3d (:12-151), SelfAttentionBlock (:152,
attention-gated U-Net skip links). Rank-agnostic, channels-last.
"""

import flax.linen as nn
import jax
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


class ConcurrentSqueezeAndExciteRef(nn.Module):
    """The REFERENCE's scSE, exactly (self_attention.py:40-149, used by
    the UNet sae/asp conv types): spatial gate = 1x1 conv -> sigmoid;
    channel gate = spatial mean -> Linear(c, c) -> ReLU -> Linear(c, c)
    -> sigmoid (no bottleneck); the two gated copies of X are SUMMED
    (ours takes the elementwise max and bottlenecks the channel MLP).
    Exists for reference-checkpoint import (interop/torch_unet.py)."""

    @nn.compact
    def __call__(self, x):
        ndim = x.ndim - 2
        c = x.shape[-1]
        gate = nn.Conv(1, _tuple(1, ndim), name="spatial_conv")(x)
        spatial = x * nn.sigmoid(gate)
        axes = tuple(range(1, x.ndim - 1))
        m = jnp.mean(x, axis=axes)
        m = nn.Dense(c, name="channel_fc0")(m)
        m = nn.relu(m)
        m = nn.Dense(c, name="channel_fc1")(m)
        cgate = nn.sigmoid(m).reshape((x.shape[0],) + (1,) * ndim + (c,))
        return spatial + x * cgate


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


class EfficientConditioningAttentionBlock(nn.Module):
    """
    Class-conditional channel gating (parity:
    EfficientConditioningAttentionBlock, layers/class_attention.py:12 after
    https://arxiv.org/abs/1910.03151): a class vector is projected to the
    channel dimension and passed through a 1D conv (kernel size derived
    from log2(C)/gamma, forced odd) or a linear layer, then a sigmoid gate
    multiplies the feature map channels.
    """

    class_dimension: int
    gamma: float = 2.0
    b: float = 1.0
    op_type: str = "conv"  # conv | linear

    @nn.compact
    def __call__(self, x, cls):
        import math

        c = x.shape[-1]
        gate = nn.Dense(c, name="class_to_channels")(cls)  # [B, C]
        if self.op_type == "conv":
            # eca-net kernel size: t = (log2(C) + b) / gamma, nearest odd
            # (b is INSIDE the division — the old form over-sized k for
            # every channel count, breaking reference-shape parity)
            k = int((math.log2(max(c, 2)) + self.b) / self.gamma)
            k = k + 1 if k % 2 == 0 else k
            # reference op = SiLU -> Conv1d (class_attention.py:75-80)
            gate = jax.nn.silu(gate)
            gate = nn.Conv(
                1, (max(k, 1),), padding="SAME", name="channel_conv"
            )(gate[..., None])[..., 0]
        else:
            gate = nn.Dense(c, name="channel_linear")(gate)
        gate = jax.nn.sigmoid(gate)
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
        return x * gate.reshape(shape)
