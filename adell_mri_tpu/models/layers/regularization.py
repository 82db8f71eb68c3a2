"""
Regularization layers.

Parity targets: adell_mri/modules/layers/regularization.py — UOut (:11),
L2NormalizationLayer (:124), GRN (:187), ChannelDropout (:230),
LayerScale (:264). Channels-last throughout (LayerNormChannelsFirst has no
analogue: plain LayerNorm over the trailing axis is the TPU-friendly layout).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class UOut(nn.Module):
    """Multiplicative uniform noise x * (1 + U(-beta, beta)) (parity :11)."""

    beta: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.beta == 0:
            return x
        rng = self.make_rng("dropout")
        noise = jax.random.uniform(
            rng, x.shape, x.dtype, -self.beta, self.beta
        )
        return x * (1.0 + noise)


class L2NormalizationLayer(nn.Module):
    """Unit-norm along the trailing axis (parity :124)."""

    eps: float = 1e-8

    def __call__(self, x):
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), self.eps
        )


class GRN(nn.Module):
    """
    Global response normalization (ConvNeXt-V2; parity :187):
    gx = ||x||_2 over spatial, nx = gx / mean(gx over channels),
    out = gamma * x * nx + beta + x.
    """

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.zeros, (c,))
        beta = self.param("bias", nn.initializers.zeros, (c,))
        spatial_axes = tuple(range(1, x.ndim - 1))
        gx = jnp.sqrt(
            jnp.sum(jnp.square(x), axis=spatial_axes, keepdims=True)
        )
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return gamma * (x * nx) + beta + x


class ChannelDropout(nn.Module):
    """Randomly zeroes whole channels during training (parity :230)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.rate == 0:
            return x
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
        keep = jax.random.bernoulli(rng, 1.0 - self.rate, shape)
        return jnp.where(keep, x / (1.0 - self.rate), 0.0)


class LayerScale(nn.Module):
    """Learnable per-channel residual scaling (parity :264)."""

    init_value: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param(
            "layer_scale",
            lambda key, shape: jnp.full(shape, self.init_value),
            (c,),
        )
        return x * scale


class LRN(nn.Module):
    """Local response normalization over channels (parity :154)."""

    size: int = 5
    alpha: float = 1e-4
    beta: float = 0.75
    k: float = 2.0

    def __call__(self, x):
        sq = jnp.square(x)
        half = self.size // 2
        pads = [(0, 0)] * (x.ndim - 1) + [(half, half)]
        padded = jnp.pad(sq, pads)
        # windowed sum over the channel axis
        acc = sum(
            jax.lax.slice_in_dim(
                padded, i, i + x.shape[-1], axis=x.ndim - 1
            )
            for i in range(self.size)
        )
        return x / jnp.power(self.k + self.alpha * acc, self.beta)
