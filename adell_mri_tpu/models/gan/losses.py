"""
GAN loss zoo.

Parity target: adell_mri/modules/gan/losses.py:65-788 — standard adversarial
(BCE), LSGAN, hinge, WGAN (+gradient penalty), relativistic average, R1/R3
penalties, feature matching, cycle consistency; StyleGANLoss
(gan/gan/loss_functions.py:12) is hinge + R1 here.
"""

from typing import List

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


def adversarial_d_loss(real_logits, fake_logits, smoothing: float = 0.0):
    """BCE discriminator loss; ``smoothing`` softens the real label to
    1 - smoothing (parity: gan/losses.py:189-249 AdversarialLoss.ones_like_smooth)."""
    return 0.5 * (
        jnp.mean(
            optax.sigmoid_binary_cross_entropy(
                real_logits, jnp.full_like(real_logits, 1.0 - smoothing)
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


def minibatch_diversity(images):
    """Mean cross-sample std (parity: gan/gan/pl.py:30
    compute_minibatch_diversity); the ProGAN generator maximizes it."""
    return jnp.mean(jnp.std(images, axis=0))


def drift_penalty(logits):
    """E[D(x)^2] drift regularizer (parity: gan/gan/pl.py:44 compute_drift)."""
    return jnp.mean(logits**2)


def semi_sl_class_loss(class_logits, class_target):
    """ACGAN auxiliary classification loss (parity: gan/losses.py:404-446
    SemiSLAdversarialLoss class term)."""
    target = class_target.astype(jnp.int32).reshape(-1)
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(class_logits, target)
    )


def semi_sl_reg_loss(reg_pred, reg_target):
    """ACGAN auxiliary regression loss (parity: SemiSLAdversarialLoss reg
    term, gan/losses.py:441)."""
    return jnp.mean((reg_pred - reg_target.reshape(reg_pred.shape)) ** 2)


def vae_kl_loss(mu, logvar):
    return -0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar))


GENERATOR_LOSSES = {
    "adversarial": adversarial_g_loss,
    "lsgan": lsgan_g_loss,
    "hinge": hinge_g_loss,
    "wgan": wgan_g_loss,
    # relativistic losses take (real_logits, fake_logits); the step
    # factories special-case the extra argument (parity: RelativisticGANPL,
    # gan/pl/gan.py:1329)
    "relativistic": relativistic_g_loss,
}
DISCRIMINATOR_LOSSES = {
    "adversarial": adversarial_d_loss,
    "lsgan": lsgan_d_loss,
    "hinge": hinge_d_loss,
    "wgan": wgan_d_loss,
    "relativistic": relativistic_d_loss,
}
