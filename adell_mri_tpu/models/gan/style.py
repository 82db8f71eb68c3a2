"""
ProGAN / StyleGAN components.

Parity target: adell_mri/modules/gan/gan/style.py:20-368 — equalized-LR
dense/conv layers, progressive up/down blocks, style mapping network;
ProGANPL (gan/gan/pl.py:48) becomes stage-wise training with a static graph
per resolution (a recompile per stage, not per step).

Progressive growing the TPU way: every stage is its own fixed-shape jitted
program. Parameters are carried between stages by name — blocks are named by
RESOLUTION LEVEL (``block_{level}``, ``torgb_{level}``, ``fromrgb_{level}``)
so that growing from stage k to k+1 leaves every previously-trained leaf at
the same tree path; ``grow_params`` copies matching leaves into the fresh
init. ``alpha`` is a traced scalar (fade-in changes per step without
recompiling).
"""

import math
from typing import Sequence

import flax
import jax
import jax.numpy as jnp

from adell_mri_tpu.models.layers.blocks import _tuple


class EqualizedDense(flax.linen.Module):
    """Dense with runtime He-scaling (equalized learning rate)."""

    features: int
    lr_mul: float = 1.0

    @flax.linen.compact
    def __call__(self, x):
        w = self.param(
            "kernel",
            flax.linen.initializers.normal(1.0 / self.lr_mul),
            (x.shape[-1], self.features),
        )
        b = self.param("bias", flax.linen.initializers.zeros, (self.features,))
        scale = self.lr_mul / math.sqrt(x.shape[-1])
        return x @ (w * scale) + b * self.lr_mul


class EqualizedConv(flax.linen.Module):
    features: int
    kernel_size: int = 3

    @flax.linen.compact
    def __call__(self, x):
        ndim = x.ndim - 2
        k = _tuple(self.kernel_size, ndim)
        fan_in = x.shape[-1] * math.prod(k)
        w = self.param(
            "kernel",
            flax.linen.initializers.normal(1.0),
            k + (x.shape[-1], self.features),
        )
        b = self.param("bias", flax.linen.initializers.zeros, (self.features,))
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


class MappingNetwork(flax.linen.Module):
    """z -> w style mapping (StyleGAN; parity: style.py mapping)."""

    w_dim: int = 128
    n_layers: int = 4

    @flax.linen.compact
    def __call__(self, z):
        w = pixel_norm(z)
        for _ in range(self.n_layers):
            w = EqualizedDense(self.w_dim, lr_mul=0.01)(w)
            w = flax.linen.leaky_relu(w, 0.2)
        return w


class _StyleBlock(flax.linen.Module):
    features: int
    noise_injection: bool = False

    @flax.linen.compact
    def __call__(self, x, w):
        ndim = x.ndim - 2
        x = EqualizedConv(self.features)(x)
        if self.noise_injection and self.has_rng("noise"):
            # StyleGAN per-activation noise with a learned per-channel
            # scale (ref style.py StyleGAN: "Noise addition"); sampling
            # without a 'noise' rng runs deterministically
            scale = self.param(
                "noise_scale",
                flax.linen.initializers.zeros,
                (self.features,),
            )
            nse = jax.random.normal(
                self.make_rng("noise"), x.shape[: ndim + 1] + (1,)
            )
            x = x + nse * scale
        # AdaIN-style modulation
        style = EqualizedDense(2 * self.features)(w)
        scale, bias = jnp.split(style, 2, axis=-1)
        sh = (x.shape[0],) + (1,) * ndim + (self.features,)
        mean = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)), keepdims=True)
        std = jnp.std(x, axis=tuple(range(1, x.ndim - 1)), keepdims=True)
        x = (x - mean) / jnp.maximum(std, 1e-6)
        x = x * (1 + scale.reshape(sh)) + bias.reshape(sh)
        return flax.linen.leaky_relu(x, 0.2)


def _up2(x, ndim: int):
    for ax in range(1, 1 + ndim):
        x = jnp.repeat(x, 2, axis=ax)
    return x


def _depth_at(depths: Sequence[int], level: int) -> int:
    return depths[min(level, len(depths) - 1)]


class ProGANGenerator(flax.linen.Module):
    """
    Progressive generator at a fixed ``stage`` (resolution = base * 2^stage).
    ``alpha`` fades in the newest block (parity: ProGAN fade-in,
    gan/gan/pl.py:240-264): the stage output is
    ``alpha * torgb_stage(block_stage(x_up)) + (1-alpha) * torgb_{stage-1}(x_up)``.

    Blocks are named by level so ``grow_params`` can carry every trained
    leaf from stage k into the stage-k+1 module.
    """

    spatial_dimensions: int = 2
    base_grid: Sequence[int] = (4, 4)
    depths: Sequence[int] = (128, 64, 32)  # depths[level]
    stage: int = 2  # number of upsampling levels active
    out_channels: int = 1
    w_dim: int = 128
    use_style: bool = True
    noise_injection: bool = False  # StyleGAN per-block noise

    @flax.linen.compact
    def __call__(
        self,
        z,
        alpha=1.0,
        train: bool = False,
        z2=None,
        mixing_cutoff=None,
    ):
        """``z2``/``mixing_cutoff`` run StyleGAN style-mixing: levels below
        the (traced) cutoff take w(z), levels at/above take w(z2) — both
        through the SHARED mapping network (ref style.py StyleGAN)."""
        ndim = self.spatial_dimensions
        mapping = MappingNetwork(self.w_dim, name="mapping")
        w = mapping(z) if self.use_style else z
        w2 = None
        if z2 is not None and self.use_style:
            w2 = mapping(z2)

        def w_at(lvl):
            if w2 is None or mixing_cutoff is None:
                return w
            return jnp.where(lvl < mixing_cutoff, w, w2)

        const = self.param(
            "const",
            flax.linen.initializers.ones,
            (1,) + tuple(self.base_grid) + (self.depths[0],),
        )
        x = jnp.tile(const, (z.shape[0],) + (1,) * (ndim + 1))
        x = _StyleBlock(
            self.depths[0], noise_injection=self.noise_injection,
            name="block_0",
        )(x, w_at(0))
        prev_rgb = None
        for lvl in range(1, self.stage + 1):
            x = _up2(x, ndim)
            if lvl == self.stage:
                prev_rgb = EqualizedConv(
                    self.out_channels, 1, name=f"torgb_{lvl - 1}"
                )(x)
            x = _StyleBlock(
                _depth_at(self.depths, lvl),
                noise_injection=self.noise_injection,
                name=f"block_{lvl}",
            )(x, w_at(lvl))
        rgb = EqualizedConv(
            self.out_channels, 1, name=f"torgb_{self.stage}"
        )(x)
        if prev_rgb is not None:
            rgb = alpha * rgb + (1.0 - alpha) * prev_rgb
        return jnp.tanh(rgb)


class ProGANDiscriminator(flax.linen.Module):
    """Progressive discriminator mirroring the generator's level naming.

    At stage k the input enters through ``fromrgb_{k}``; during fade-in the
    once-pooled features blend with ``fromrgb_{k-1}`` of the 2x-downsampled
    input (parity: ProGAN discriminator fade-in).
    """

    spatial_dimensions: int = 2
    depths: Sequence[int] = (128, 64, 32)  # depths[level]
    stage: int = 2

    @flax.linen.compact
    def __call__(self, x, alpha=1.0, train: bool = False):
        ndim = self.spatial_dimensions
        pool = lambda t: flax.linen.avg_pool(  # noqa: E731
            t, window_shape=_tuple(2, ndim), strides=_tuple(2, ndim)
        )
        h = EqualizedConv(
            _depth_at(self.depths, self.stage), 1, name=f"fromrgb_{self.stage}"
        )(x)
        for lvl in range(self.stage, 0, -1):
            h = EqualizedConv(
                _depth_at(self.depths, lvl - 1), 3, name=f"block_{lvl}"
            )(h)
            h = flax.linen.leaky_relu(h, 0.2)
            h = pool(h)
            if lvl == self.stage and self.stage > 0:
                skip = EqualizedConv(
                    _depth_at(self.depths, lvl - 1),
                    1,
                    name=f"fromrgb_{lvl - 1}",
                )(pool(x))
                h = alpha * h + (1.0 - alpha) * skip
        # minibatch stddev feature
        std = jnp.std(h, axis=0, keepdims=True).mean()
        std_map = jnp.full(h.shape[:-1] + (1,), std)
        h = jnp.concatenate([h, std_map], axis=-1)
        h = EqualizedConv(self.depths[0], 3, name="final_conv")(h)
        h = flax.linen.leaky_relu(h, 0.2)
        h = jnp.mean(h, axis=tuple(range(1, h.ndim - 1)))
        return EqualizedDense(1, name="final_dense")(h)


def grow_params(old_params, new_params):
    """Copy every leaf of ``old_params`` into ``new_params`` where the tree
    path exists in both and shapes match (progressive-growing carry-over;
    parity: ProGANPL keeps one torch module — here each stage is a fresh
    module and trained levels transfer by name)."""
    flat_old = flax.traverse_util.flatten_dict(old_params)
    flat_new = flax.traverse_util.flatten_dict(new_params)
    out = {}
    for k, v in flat_new.items():
        o = flat_old.get(k)
        out[k] = o if (o is not None and o.shape == v.shape) else v
    return flax.core.freeze(
        flax.traverse_util.unflatten_dict(out)
    ).unfreeze()
