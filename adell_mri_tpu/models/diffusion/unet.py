"""
Diffusion U-Net with timestep (and optional condition) embedding.

Parity target: adell_mri/modules/diffusion/unet.py:30 (in-house
DiffusionUNet: a U-Net whose residual blocks receive a sinusoidal timestep
embedding; MONAI's DiffusionModelUNet wrapper collapses into this). FiLM
injection: t-embedding -> per-block scale/shift on channels-last maps.
"""

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from adell_mri_tpu.models.layers.blocks import _gn, _tuple
from adell_mri_tpu.ops.conv import TpuConv, TpuConvTranspose
from adell_mri_tpu.models.layers.multi_resolution import resize_like


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class _ResBlockT(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, temb):
        ndim = x.ndim - 2
        h = nn.GroupNorm(num_groups=_gn(x.shape[-1]))(x)
        h = nn.silu(h)
        # TpuConv = z2d lowering for 3D (BASELINE.md round-3 stem cliff);
        # explicit names pin the previous nn.Conv auto paths
        h = TpuConv(
            self.out_channels, _tuple(3, ndim), padding="SAME", name="Conv_0"
        )(h)
        # FiLM from the timestep embedding
        scale_shift = nn.Dense(2 * self.out_channels)(nn.silu(temb))
        scale, shift = jnp.split(scale_shift, 2, axis=-1)
        sh = (x.shape[0],) + (1,) * ndim + (self.out_channels,)
        h = h * (1 + scale.reshape(sh)) + shift.reshape(sh)
        h = nn.GroupNorm(num_groups=_gn(self.out_channels))(h)
        h = nn.silu(h)
        h = TpuConv(
            self.out_channels, _tuple(3, ndim), padding="SAME", name="Conv_1"
        )(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, _tuple(1, ndim), name="Conv_2")(x)
        return x + h


class _SelfAttnBlock(nn.Module):
    n_heads: int = 4

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        c = x.shape[-1]
        spatial = x.shape[1:-1]
        tokens = x.reshape(b, -1, c)
        y = nn.LayerNorm()(tokens)
        y = nn.MultiHeadDotProductAttention(num_heads=self.n_heads)(y, y)
        tokens = tokens + y
        return tokens.reshape((b,) + spatial + (c,))


class DiffusionUNet(nn.Module):
    spatial_dimensions: int = 3
    depth: Sequence[int] = (32, 64, 128)
    attention_levels: Sequence[bool] = (False, False, True)
    in_channels: int = 1
    temb_dim: int = 128
    cond_dim: Optional[int] = None
    n_heads: int = 4

    @nn.compact
    def __call__(self, x, t, cond_embedding=None, train: bool = False):
        ndim = x.ndim - 2
        temb = timestep_embedding(t, self.temb_dim)
        temb = nn.Dense(self.temb_dim)(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(self.temb_dim)(temb)
        if cond_embedding is not None:
            temb = temb + nn.Dense(self.temb_dim, name="cond_proj")(
                cond_embedding
            )

        h = TpuConv(
            self.depth[0], _tuple(3, ndim), padding="SAME", name="Conv_0"
        )(x)
        skips = []
        for i, d in enumerate(self.depth):
            h = _ResBlockT(d, name=f"down_{i}")(h, temb)
            if self.attention_levels[i]:
                h = _SelfAttnBlock(self.n_heads, name=f"down_attn_{i}")(h)
            skips.append(h)
            if i < len(self.depth) - 1:
                h = TpuConv(
                    d, _tuple(3, ndim), strides=_tuple(2, ndim),
                    padding="SAME", name=f"down_samp_{i}",
                )(h)
        h = _ResBlockT(self.depth[-1], name="mid_1")(h, temb)
        h = _SelfAttnBlock(self.n_heads, name="mid_attn")(h)
        h = _ResBlockT(self.depth[-1], name="mid_2")(h, temb)
        for i in range(len(self.depth) - 1, -1, -1):
            if i < len(self.depth) - 1:
                # kernel == strides: block-matmul lowering, 2-6x over
                # XLA's transposed conv at decoder shapes (BASELINE.md);
                # multiplied by the ~1000-forward sampling loop here.
                # Param tree identical to nn.ConvTranspose.
                h = TpuConvTranspose(
                    self.depth[i], _tuple(2, ndim), name=f"up_samp_{i}"
                )(h)
                if h.shape[1:-1] != skips[i].shape[1:-1]:
                    h = resize_like(h, skips[i].shape[1:-1])
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = _ResBlockT(self.depth[i], name=f"up_{i}")(h, temb)
            if self.attention_levels[i]:
                h = _SelfAttnBlock(self.n_heads, name=f"up_attn_{i}")(h)
        h = nn.GroupNorm(num_groups=_gn(h.shape[-1]))(h)
        h = nn.silu(h)
        return TpuConv(
            self.in_channels, _tuple(3, ndim), padding="SAME", name="Conv_1"
        )(h)
