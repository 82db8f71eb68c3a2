"""
GAN loss zoo.

Parity target: adell_mri/modules/gan/losses.py:65-788 — standard adversarial
(BCE), LSGAN, hinge, WGAN (+gradient penalty), relativistic average, R1/R3
penalties, feature matching, cycle consistency; StyleGANLoss
(gan/gan/loss_functions.py:12) is hinge + R1 here.
"""

from typing import List, Sequence

import jax
import jax.numpy as jnp
import optax


# -- generator losses --------------------------------------------------------


def adversarial_g_loss(fake_logits):
    """Non-saturating BCE generator loss."""
    return jnp.mean(
        optax.sigmoid_binary_cross_entropy(
            fake_logits, jnp.ones_like(fake_logits)
        )
    )


def lsgan_g_loss(fake_logits):
    return jnp.mean((fake_logits - 1.0) ** 2)


def hinge_g_loss(fake_logits):
    return -jnp.mean(fake_logits)


def wgan_g_loss(fake_logits):
    return -jnp.mean(fake_logits)


def relativistic_g_loss(real_logits, fake_logits):
    """RaGAN generator loss (parity: relativistic variants)."""
    ra_real = real_logits - jnp.mean(fake_logits)
    ra_fake = fake_logits - jnp.mean(real_logits)
    return 0.5 * (
        jnp.mean(
            optax.sigmoid_binary_cross_entropy(
                ra_real, jnp.zeros_like(ra_real)
            )
        )
        + jnp.mean(
            optax.sigmoid_binary_cross_entropy(
                ra_fake, jnp.ones_like(ra_fake)
            )
        )
    )


# -- discriminator losses ----------------------------------------------------


def adversarial_d_loss(real_logits, fake_logits):
    return 0.5 * (
        jnp.mean(
            optax.sigmoid_binary_cross_entropy(
                real_logits, jnp.ones_like(real_logits)
            )
        )
        + jnp.mean(
            optax.sigmoid_binary_cross_entropy(
                fake_logits, jnp.zeros_like(fake_logits)
            )
        )
    )


def lsgan_d_loss(real_logits, fake_logits):
    return 0.5 * (
        jnp.mean((real_logits - 1.0) ** 2) + jnp.mean(fake_logits**2)
    )


def hinge_d_loss(real_logits, fake_logits):
    return jnp.mean(jax.nn.relu(1.0 - real_logits)) + jnp.mean(
        jax.nn.relu(1.0 + fake_logits)
    )


def wgan_d_loss(real_logits, fake_logits):
    return jnp.mean(fake_logits) - jnp.mean(real_logits)


def relativistic_d_loss(real_logits, fake_logits):
    ra_real = real_logits - jnp.mean(fake_logits)
    ra_fake = fake_logits - jnp.mean(real_logits)
    return 0.5 * (
        jnp.mean(
            optax.sigmoid_binary_cross_entropy(
                ra_real, jnp.ones_like(ra_real)
            )
        )
        + jnp.mean(
            optax.sigmoid_binary_cross_entropy(
                ra_fake, jnp.zeros_like(ra_fake)
            )
        )
    )


# -- penalties / auxiliaries -------------------------------------------------


def gradient_penalty(d_apply, params, key, real, fake):
    """WGAN-GP: (||∇_x D(x̂)|| - 1)² on interpolates (parity: WGAN-GP)."""
    eps_shape = (real.shape[0],) + (1,) * (real.ndim - 1)
    eps = jax.random.uniform(key, eps_shape)
    x_hat = eps * real + (1 - eps) * fake

    def d_scalar(x):
        return jnp.sum(d_apply(params, x))

    grads = jax.grad(d_scalar)(x_hat)
    norms = jnp.sqrt(
        jnp.sum(grads**2, axis=tuple(range(1, grads.ndim))) + 1e-12
    )
    return jnp.mean((norms - 1.0) ** 2)


def r1_penalty(d_apply, params, real):
    """R1: ||∇_x D(x)||² on real data (parity: R1 penalty)."""

    def d_scalar(x):
        return jnp.sum(d_apply(params, x))

    grads = jax.grad(d_scalar)(real)
    return 0.5 * jnp.mean(
        jnp.sum(grads**2, axis=tuple(range(1, grads.ndim)))
    )


def feature_matching_loss(real_feats: List, fake_feats: List):
    total = 0.0
    for rf, ff in zip(real_feats, fake_feats):
        total = total + jnp.mean(jnp.abs(rf - ff))
    return total / max(len(real_feats), 1)


def cycle_consistency_loss(x, x_reconstructed):
    return jnp.mean(jnp.abs(x - x_reconstructed))


def vae_kl_loss(mu, logvar):
    return -0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar))


GENERATOR_LOSSES = {
    "adversarial": adversarial_g_loss,
    "lsgan": lsgan_g_loss,
    "hinge": hinge_g_loss,
    "wgan": wgan_g_loss,
}
DISCRIMINATOR_LOSSES = {
    "adversarial": adversarial_d_loss,
    "lsgan": lsgan_d_loss,
    "hinge": hinge_d_loss,
    "wgan": wgan_d_loss,
}
