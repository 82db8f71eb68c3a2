"""
GAN training steps: the manual two-optimizer loop.

Parity target: adell_mri/modules/gan/pl/gan.py:118-1256 — GANPL with manual
optimization, n_critic discriminator steps per generator step, optional
WGAN-GP, feature matching and cycle consistency. In JAX the "manual loop" is
simply two train states and two jitted steps (SURVEY.md §7: easier than
Lightning's manual optimization).
"""

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from adell_mri_tpu.models.gan import losses as L


def make_gan_steps(
    generator,
    discriminator,
    latent_dim: int,
    loss_type: str = "adversarial",
    gp_weight: float = 0.0,
    r1_weight: float = 0.0,
    feature_matching_weight: float = 0.0,
):
    """
    Returns (d_step, g_step):
      d_step(d_state, g_params, batch, rng) -> (d_state, metrics)
      g_step(g_state, d_params, batch, rng) -> (g_state, metrics)
    Batch key: "image" (real samples, in [-1, 1]).
    """
    g_loss_fn = L.GENERATOR_LOSSES[loss_type]
    d_loss_fn = L.DISCRIMINATOR_LOSSES[loss_type]

    def sample_fake(g_params, rng, batch_size):
        z = jax.random.normal(rng, (batch_size, latent_dim))
        return generator.apply({"params": g_params}, z)

    def d_step(d_state, g_params, batch, rng):
        real = batch["image"]
        rng_z, rng_gp = jax.random.split(jax.random.fold_in(rng, d_state.step))
        fake = jax.lax.stop_gradient(
            sample_fake(g_params, rng_z, real.shape[0])
        )

        def loss(params):
            real_logits = discriminator.apply({"params": params}, real)
            fake_logits = discriminator.apply({"params": params}, fake)
            d_loss = d_loss_fn(real_logits, fake_logits)
            total = d_loss
            aux = {"d_loss": d_loss}
            if gp_weight > 0:
                gp = L.gradient_penalty(
                    lambda p, x: discriminator.apply({"params": p}, x),
                    params,
                    rng_gp,
                    real,
                    fake,
                )
                total = total + gp_weight * gp
                aux["gp"] = gp
            if r1_weight > 0:
                r1 = L.r1_penalty(
                    lambda p, x: discriminator.apply({"params": p}, x),
                    params,
                    real,
                )
                total = total + r1_weight * r1
                aux["r1"] = r1
            aux["loss"] = total
            return total, aux

        (_, metrics), grads = jax.value_and_grad(loss, has_aux=True)(
            d_state.params
        )
        return d_state.apply_gradients(grads), metrics

    def g_step(g_state, d_params, batch, rng):
        real = batch["image"]
        rng_z = jax.random.fold_in(rng, g_state.step)

        def loss(params):
            fake = sample_fake(params, rng_z, real.shape[0])
            fake_logits = discriminator.apply({"params": d_params}, fake)
            g_loss = g_loss_fn(fake_logits)
            total = g_loss
            aux = {"g_loss": g_loss}
            if loss_type == "adversarial" and feature_matching_weight > 0:
                rf = discriminator.apply(
                    {"params": d_params}, real, return_features=True
                )
                ff = discriminator.apply(
                    {"params": d_params}, fake, return_features=True
                )
                fm = L.feature_matching_loss(rf, ff)
                total = total + feature_matching_weight * fm
                aux["feature_matching"] = fm
            aux["loss"] = total
            return total, aux

        (_, metrics), grads = jax.value_and_grad(loss, has_aux=True)(
            g_state.params
        )
        return g_state.apply_gradients(grads), metrics

    return jax.jit(d_step), jax.jit(g_step)


def make_diffusion_step(model, process, embedder=None):
    """
    DDPM ε-prediction step (parity: DiffusionUNetPL, diffusion/pl.py:21-233):
    random timestep per sample, MSE(ε̂, ε), optional conditioning with
    classifier-free dropout inside the Embedder.
    """

    def loss_and_metrics(params, batch, rng):
        x0 = batch["image"]
        r_t, r_n, r_c = jax.random.split(rng, 3)
        t = jax.random.randint(
            r_t, (x0.shape[0],), 0, process.n_timesteps
        )
        xt, eps = process.q_sample(r_n, x0, t)
        cond = None
        variables = {"params": params}
        model_kwargs = {}
        if embedder is not None and "cond_cat" in batch:
            cond = embedder.apply(
                {"params": params["embedder"]},
                batch.get("cond_cat"),
                batch.get("cond_num"),
                train=True,
                rngs={"uncondition": r_c},
            )
            variables = {"params": params["unet"]}
            model_kwargs["cond_embedding"] = cond
        eps_pred = model.apply(variables, xt, t, **model_kwargs)
        loss = jnp.mean((eps_pred - eps) ** 2)
        return loss, {"loss": loss}

    return loss_and_metrics
