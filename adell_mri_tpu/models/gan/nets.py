"""
GAN generator/discriminator/autoencoders.

Parity targets: adell_mri/modules/gan/ — Generator (generator.py:77-2413,
diffusers-style res/attn down-mid-up; collapsed here into a config-driven
encoder-decoder/latent decoder), Discriminator (discriminator.py:11, patchGAN
option), AutoEncoder/VariationalAutoEncoder (ae.py, vae.py). Channels-last.
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from adell_mri_tpu.models.layers.blocks import _gn, _tuple
from adell_mri_tpu.ops.conv import TpuConv


class _ResBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        ndim = x.ndim - 2
        h = nn.GroupNorm(num_groups=_gn(x.shape[-1]))(x)
        h = nn.silu(h)
        # TpuConv = z2d lowering in 3D (BASELINE.md round-3 stem cliff;
        # plain XLA path in 2D); names pin the previous auto paths
        h = TpuConv(
            self.out_channels, _tuple(3, ndim), padding="SAME", name="Conv_0"
        )(h)
        h = nn.GroupNorm(num_groups=_gn(self.out_channels))(h)
        h = nn.silu(h)
        h = TpuConv(
            self.out_channels, _tuple(3, ndim), padding="SAME", name="Conv_1"
        )(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, _tuple(1, ndim), name="Conv_2")(x)
        return x + h


class Generator(nn.Module):
    """
    Latent -> image decoder, or image -> image translator when called with
    an input volume (cycle-GAN style). ``latent_shape`` sets the seed grid
    for latent mode.
    """

    spatial_dimensions: int = 2
    depth: Sequence[int] = (128, 64, 32)
    out_channels: int = 1
    latent_dim: int = 64
    latent_grid: Sequence[int] = (4, 4)
    image_to_image: bool = False
    cond_dim: Optional[int] = None

    @nn.compact
    def __call__(self, z_or_x, cond=None, train: bool = False):
        ndim = self.spatial_dimensions
        if self.image_to_image:
            h = z_or_x
            # encode
            for i, d in enumerate(self.depth):
                h = TpuConv(
                    d, _tuple(3, ndim), strides=_tuple(2, ndim),
                    padding="SAME", name=f"enc_{i}",
                )(h)
                h = _ResBlock(d, name=f"enc_res_{i}")(h)
        else:
            z = z_or_x
            if cond is not None and self.cond_dim:
                z = jnp.concatenate([z, cond], axis=-1)
            import math

            h = nn.Dense(math.prod(self.latent_grid) * self.depth[0])(z)
            h = h.reshape((z.shape[0],) + tuple(self.latent_grid) + (self.depth[0],))
        for i, d in enumerate(self.depth):
            h = _ResBlock(d, name=f"dec_res_{i}")(h)
            h = nn.ConvTranspose(
                d, _tuple(2, ndim), strides=_tuple(2, ndim), name=f"dec_up_{i}"
            )(h)
        h = nn.GroupNorm(num_groups=_gn(h.shape[-1]))(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, _tuple(3, ndim), padding="SAME")(h)
        return jnp.tanh(h)


class Discriminator(nn.Module):
    """Conv discriminator; ``patch_gan`` keeps a spatial logit map.

    ``n_classes``/``n_reg`` grow auxiliary-classifier heads (parity:
    gan/discriminator.py:11 with class/reg heads consumed by
    SemiSLAdversarialLoss, gan/losses.py:383): when either is set the call
    returns ``(adv_logits, class_logits_or_None, reg_pred_or_None)``.
    """

    spatial_dimensions: int = 2
    depth: Sequence[int] = (32, 64, 128)
    patch_gan: bool = False
    cond_dim: Optional[int] = None
    n_classes: Optional[int] = None
    n_reg: Optional[int] = None

    @nn.compact
    def __call__(
        self, x, cond=None, train: bool = False, return_features: bool = False
    ):
        ndim = self.spatial_dimensions
        feats = []
        h = x
        for i, d in enumerate(self.depth):
            h = TpuConv(
                d, _tuple(4, ndim), strides=_tuple(2, ndim),
                padding="SAME", name=f"disc_{i}",
            )(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        if return_features:
            return feats
        pooled = jnp.mean(h, axis=tuple(range(1, h.ndim - 1)))
        if self.patch_gan:
            hp = h
            if cond is not None and self.cond_dim:
                # conditioning broadcast over the patch grid (projection-
                # style) — the cond argument must not be silently dropped
                c = cond.reshape((cond.shape[0],) + (1,) * ndim + (-1,))
                c = jnp.broadcast_to(
                    c, h.shape[:-1] + (cond.shape[-1],)
                )
                hp = jnp.concatenate([h, c], axis=-1)
            adv = nn.Conv(1, _tuple(3, ndim), padding="SAME")(hp)
        else:
            hh = pooled
            if cond is not None and self.cond_dim:
                hh = jnp.concatenate([hh, cond], axis=-1)
            adv = nn.Dense(1)(hh)
        if self.n_classes is None and self.n_reg is None:
            return adv
        class_logits = (
            nn.Dense(self.n_classes, name="class_head")(pooled)
            if self.n_classes
            else None
        )
        reg_pred = (
            nn.Dense(self.n_reg, name="reg_head")(pooled)
            if self.n_reg
            else None
        )
        return adv, class_logits, reg_pred


class AutoEncoder(nn.Module):
    """Conv autoencoder (parity: gan/ae.py)."""

    spatial_dimensions: int = 2
    depth: Sequence[int] = (32, 64)
    latent_dim: int = 64
    out_channels: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False, return_latent: bool = False):
        ndim = self.spatial_dimensions
        h = x
        for i, d in enumerate(self.depth):
            h = nn.Conv(
                d, _tuple(3, ndim), strides=_tuple(2, ndim), padding="SAME"
            )(h)
            h = nn.silu(h)
        grid = h.shape[1:-1]
        z = nn.Dense(self.latent_dim)(h.reshape(h.shape[0], -1))
        if return_latent:
            return z
        h = nn.Dense(
            __import__("math").prod(grid) * self.depth[-1]
        )(z).reshape((x.shape[0],) + grid + (self.depth[-1],))
        for d in reversed(self.depth):
            h = nn.ConvTranspose(
                d, _tuple(2, ndim), strides=_tuple(2, ndim)
            )(h)
            h = nn.silu(h)
        return nn.Conv(self.out_channels, _tuple(3, ndim), padding="SAME")(h)


class VariationalAutoEncoder(nn.Module):
    """VAE (parity: gan/vae.py). Returns (recon, mu, logvar)."""

    spatial_dimensions: int = 2
    depth: Sequence[int] = (32, 64)
    latent_dim: int = 64
    out_channels: int = 1

    @nn.compact
    def __call__(self, x, rng=None, train: bool = False):
        ndim = self.spatial_dimensions
        h = x
        for d in self.depth:
            h = nn.Conv(
                d, _tuple(3, ndim), strides=_tuple(2, ndim), padding="SAME"
            )(h)
            h = nn.silu(h)
        grid = h.shape[1:-1]
        flat = h.reshape(h.shape[0], -1)
        mu = nn.Dense(self.latent_dim, name="mu")(flat)
        logvar = nn.Dense(self.latent_dim, name="logvar")(flat)
        if rng is None:
            rng = self.make_rng("latent")
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)
        h = nn.Dense(
            __import__("math").prod(grid) * self.depth[-1]
        )(z).reshape((x.shape[0],) + grid + (self.depth[-1],))
        for d in reversed(self.depth):
            h = nn.ConvTranspose(
                d, _tuple(2, ndim), strides=_tuple(2, ndim)
            )(h)
            h = nn.silu(h)
        recon = nn.Conv(self.out_channels, _tuple(3, ndim), padding="SAME")(h)
        return recon, mu, logvar
