"""
Causal-effects estimation components.

Parity targets: adell_mri/modules/causal_effects/causal_effects/
causal_effects.py — VGGAutoencoder (:11, 3-stage VGG encoder/decoder with
``return_features``); losses.py — pt (:10), binary_cross_entropy (:32),
mean_squared_error (:62), root_mean_squared_error (:81),
decorrelation_loss (:101, CE + beta*AE reconstruction MSE from
https://arxiv.org/abs/2008.09858).
"""

import flax.linen as nn
import jax.numpy as jnp

from adell_mri_tpu.models.layers.blocks import VGGConvolution, VGGDeconvolution

_EPS = 1e-8


class VGGAutoencoder(nn.Module):
    """3-stage VGG-style autoencoder (parity: causal_effects.py:11).
    Channels-last; encoder halves the spatial dims 3x (64->128->256->512
    features), decoder mirrors with transposed convs."""

    in_channels: int = 1
    norm_fn: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        for depth in (64, 128, 256):
            x = VGGConvolution(first_depth=depth, norm_fn=self.norm_fn)(
                x, train=train
            )
        if return_features:
            return x
        x = VGGDeconvolution(256, norm_fn=self.norm_fn)(x, train=train)
        x = VGGDeconvolution(128, norm_fn=self.norm_fn)(x, train=train)
        x = VGGDeconvolution(64, last=True, norm_fn=self.norm_fn)(
            x, train=train
        )
        ndim = x.ndim - 2
        x = nn.Conv(self.in_channels, (1,) * ndim)(x)
        return x


def pt(pred, target, threshold: float = 0.5):
    """Probability assigned to the true class (parity: losses.py:10)."""
    return jnp.where(target > threshold, pred, 1.0 - pred)


def binary_cross_entropy(
    pred, target, weight: float = 1.0, scale: float = 1.0, eps: float = _EPS
):
    """Weighted, scaled BCE over flattened samples (parity: losses.py:32)."""
    pred = pred.reshape(pred.shape[0], -1)
    target = target.reshape(target.shape[0], -1)
    a = weight * target * jnp.log(pred + eps)
    b = (1.0 - target) * jnp.log(1.0 - pred + eps)
    return -jnp.mean((a + b) * scale, axis=-1)


def mean_squared_error(pred, target):
    pred = pred.reshape(pred.shape[0], -1)
    target = target.reshape(target.shape[0], -1)
    return jnp.mean((pred - target) ** 2, axis=-1)


def root_mean_squared_error(pred, target, eps: float = _EPS):
    return jnp.sqrt(mean_squared_error(pred, target) + eps)


def decorrelation_loss(
    pred,
    target_ce,
    target_ae,
    beta: float = 1.0,
    gamma: float = 1.0,
    weight: float = 1.0,
    scale: float = 1.0,
    eps: float = _EPS,
):
    """
    CE against the class target + beta x MSE against the autoencoder
    reconstruction target (parity: losses.py:101). Returns a per-sample
    vector (first dimension of ``pred``).
    """
    del gamma  # reserved (reference's reg term is 0)
    ce = binary_cross_entropy(pred, target_ce, weight, scale, eps)
    ae = mean_squared_error(pred, target_ae)
    return ce + beta * ae
