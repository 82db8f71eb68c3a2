"""
ProGAN / StyleGAN components.

Parity target: adell_mri/modules/gan/gan/style.py:20-368 — equalized-LR
dense/conv layers, progressive up/down blocks, style mapping network;
ProGANPL (gan/gan/pl.py:48) becomes stage-wise training with a static graph
per resolution (a recompile per stage, not per step).
"""

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from adell_mri_tpu.models.layers.blocks import _tuple


class EqualizedDense(nn.Module):
    """Dense with runtime He-scaling (equalized learning rate)."""

    features: int
    lr_mul: float = 1.0

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel",
            nn.initializers.normal(1.0 / self.lr_mul),
            (x.shape[-1], self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        scale = self.lr_mul / math.sqrt(x.shape[-1])
        return x @ (w * scale) + b * self.lr_mul


class EqualizedConv(nn.Module):
    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        ndim = x.ndim - 2
        k = _tuple(self.kernel_size, ndim)
        fan_in = x.shape[-1] * math.prod(k)
        w = self.param(
            "kernel",
            nn.initializers.normal(1.0),
            k + (x.shape[-1], self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x,
            w * (1.0 / math.sqrt(fan_in)),
            window_strides=(1,) * ndim,
            padding="SAME",
            dimension_numbers=(
                ("NHWC", "HWIO", "NHWC")
                if ndim == 2
                else ("NDHWC", "DHWIO", "NDHWC")
            ),
        )
        return y + b


def pixel_norm(x, eps=1e-8):
    return x * jax.lax.rsqrt(jnp.mean(x**2, axis=-1, keepdims=True) + eps)


class MappingNetwork(nn.Module):
    """z -> w style mapping (StyleGAN; parity: style.py mapping)."""

    w_dim: int = 128
    n_layers: int = 4

    @nn.compact
    def __call__(self, z):
        w = pixel_norm(z)
        for _ in range(self.n_layers):
            w = EqualizedDense(self.w_dim, lr_mul=0.01)(w)
            w = nn.leaky_relu(w, 0.2)
        return w


class _StyleBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, w):
        ndim = x.ndim - 2
        x = EqualizedConv(self.features)(x)
        # AdaIN-style modulation
        style = EqualizedDense(2 * self.features)(w)
        scale, bias = jnp.split(style, 2, axis=-1)
        sh = (x.shape[0],) + (1,) * ndim + (self.features,)
        mean = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)), keepdims=True)
        std = jnp.std(x, axis=tuple(range(1, x.ndim - 1)), keepdims=True)
        x = (x - mean) / jnp.maximum(std, 1e-6)
        x = x * (1 + scale.reshape(sh)) + bias.reshape(sh)
        return nn.leaky_relu(x, 0.2)


class ProGANGenerator(nn.Module):
    """
    Progressive generator at a fixed ``stage`` (resolution = base * 2^stage).
    ``alpha`` fades in the newest block (parity: ProGAN fade-in).
    """

    spatial_dimensions: int = 2
    base_grid: Sequence[int] = (4, 4)
    depths: Sequence[int] = (128, 64, 32)
    stage: int = 2  # number of upsampling blocks active
    out_channels: int = 1
    w_dim: int = 128
    use_style: bool = True

    @nn.compact
    def __call__(self, z, alpha: float = 1.0, train: bool = False):
        ndim = self.spatial_dimensions
        w = MappingNetwork(self.w_dim)(z) if self.use_style else z
        const = self.param(
            "const",
            nn.initializers.ones,
            (1,) + tuple(self.base_grid) + (self.depths[0],),
        )
        x = jnp.tile(const, (z.shape[0],) + (1,) * (ndim + 1))
        x = _StyleBlock(self.depths[0], name="block_base")(x, w)
        prev_rgb = None
        for s in range(self.stage):
            d = self.depths[min(s + 1, len(self.depths) - 1)]
            up_shape = tuple(dim * 2 for dim in x.shape[1:-1])
            x = jax.image.resize(
                x, (x.shape[0],) + up_shape + (x.shape[-1],), "nearest"
            )
            if s == self.stage - 1:
                prev_rgb = EqualizedConv(self.out_channels, 1, name=f"torgb_{s-1}")(
                    x
                ) if s > 0 else None
            x = _StyleBlock(d, name=f"block_{s}")(x, w)
        rgb = EqualizedConv(self.out_channels, 1, name="torgb_final")(x)
        if prev_rgb is not None and alpha < 1.0:
            rgb = alpha * rgb + (1 - alpha) * prev_rgb
        return jnp.tanh(rgb)


class ProGANDiscriminator(nn.Module):
    spatial_dimensions: int = 2
    depths: Sequence[int] = (32, 64, 128)
    stage: int = 2

    @nn.compact
    def __call__(self, x, alpha: float = 1.0, train: bool = False):
        ndim = self.spatial_dimensions
        h = EqualizedConv(self.depths[0], 1, name="fromrgb")(x)
        for s in range(self.stage):
            d = self.depths[min(s + 1, len(self.depths) - 1)]
            h = EqualizedConv(d, 3, name=f"block_{s}")(h)
            h = nn.leaky_relu(h, 0.2)
            h = nn.avg_pool(
                h, window_shape=_tuple(2, ndim), strides=_tuple(2, ndim)
            )
        # minibatch stddev feature
        std = jnp.std(h, axis=0, keepdims=True).mean()
        std_map = jnp.full(h.shape[:-1] + (1,), std)
        h = jnp.concatenate([h, std_map], axis=-1)
        h = EqualizedConv(self.depths[-1], 3, name="final_conv")(h)
        h = nn.leaky_relu(h, 0.2)
        h = jnp.mean(h, axis=tuple(range(1, h.ndim - 1)))
        return EqualizedDense(1)(h)
