"""
Diffusion process: beta schedules, forward noising, reverse sampling.

Parity targets: adell_mri/modules/diffusion/diffusion_process.py:23-382
(standalone Diffusion with 5 beta schedules) and DiffusionUNetPL's use of
MONAI's DDPMScheduler (diffusion/pl.py:21-233: ε-prediction MSE at a random
timestep per batch) plus DiffusionInfererSkipSteps (inferer.py:9, partial
denoise from an intermediate step).

TPU-first: the full reverse loop is one ``lax.scan`` inside jit — no
per-step host round trips.
"""

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_beta_schedule(
    schedule: str = "linear",
    n_timesteps: int = 1000,
    beta_start: float = 1e-4,
    beta_end: float = 2e-2,
) -> jnp.ndarray:
    """Five schedules (parity: diffusion_process.py:23)."""
    if schedule == "linear":
        betas = np.linspace(beta_start, beta_end, n_timesteps)
    elif schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, n_timesteps) ** 2
        )
    elif schedule == "cosine":
        s = 0.008
        t = np.linspace(0, n_timesteps, n_timesteps + 1) / n_timesteps
        alphas_bar = np.cos((t + s) / (1 + s) * np.pi / 2) ** 2
        alphas_bar = alphas_bar / alphas_bar[0]
        betas = 1 - alphas_bar[1:] / alphas_bar[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sigmoid":
        t = np.linspace(-6, 6, n_timesteps)
        betas = 1 / (1 + np.exp(-t)) * (beta_end - beta_start) + beta_start
    elif schedule == "sqrt":
        betas = np.linspace(beta_start**2, beta_end**2, n_timesteps) ** 0.5
    else:
        raise NotImplementedError(f"beta schedule {schedule!r}")
    return jnp.asarray(betas, jnp.float32)


class DiffusionProcess:
    """DDPM/DDIM math over a fixed beta schedule."""

    def __init__(
        self,
        n_timesteps: int = 1000,
        schedule: str = "linear",
        beta_start: float = 1e-4,
        beta_end: float = 2e-2,
    ):
        self.n_timesteps = n_timesteps
        self.betas = make_beta_schedule(
            schedule, n_timesteps, beta_start, beta_end
        )
        self.alphas = 1.0 - self.betas
        self.alphas_bar = jnp.cumprod(self.alphas)
        self.sqrt_ab = jnp.sqrt(self.alphas_bar)
        self.sqrt_1mab = jnp.sqrt(1.0 - self.alphas_bar)

    def q_sample(self, key, x0, t):
        """Forward noising x_t = sqrt(ab)x0 + sqrt(1-ab)ε; returns (x_t, ε)."""
        eps = jax.random.normal(key, x0.shape, x0.dtype)
        shape = (-1,) + (1,) * (x0.ndim - 1)
        xt = (
            self.sqrt_ab[t].reshape(shape) * x0
            + self.sqrt_1mab[t].reshape(shape) * eps
        )
        return xt, eps

    def ddpm_step(self, key, model_fn, xt, t):
        """One reverse step given ε-prediction model_fn(x, t); ``t`` is a
        scalar timestep, broadcast per-sample for the model."""
        eps = model_fn(xt, jnp.full((xt.shape[0],), t, jnp.int32))
        beta = self.betas[t]
        alpha = self.alphas[t]
        ab = self.alphas_bar[t]
        coef = beta / jnp.sqrt(1.0 - ab)
        mean = (xt - coef * eps) / jnp.sqrt(alpha)
        noise = jax.random.normal(key, xt.shape, xt.dtype)
        sigma = jnp.sqrt(beta)
        return mean + jnp.where(t > 0, sigma, 0.0) * noise

    def sample(
        self,
        key,
        model_fn: Callable,
        shape: Tuple[int, ...],
        skip_steps: int = 0,
        x_start: Optional[jax.Array] = None,
    ):
        """
        Full (or partial, parity: DiffusionInfererSkipSteps) reverse loop as
        one lax.scan. ``skip_steps`` starts the denoise at
        T - skip_steps from ``x_start`` noised to that level; it REQUIRES
        ``x_start`` (partial denoise of an input image) — for fast
        sampling from pure noise use ``ddim_sample``.
        """
        if skip_steps > 0 and x_start is None:
            raise ValueError(
                "skip_steps requires x_start (partial denoise of an input "
                "image); it used to be silently ignored. For fast "
                "from-noise sampling use ddim_sample(n_steps=...)."
            )
        t_start = self.n_timesteps - 1
        if x_start is not None and skip_steps > 0:
            t0 = self.n_timesteps - skip_steps
            key, sub = jax.random.split(key)
            xt, _ = self.q_sample(
                sub, x_start, jnp.full((shape[0],), t0, jnp.int32)
            )
            t_start = t0
        else:
            key, sub = jax.random.split(key)
            xt = jax.random.normal(sub, shape)

        ts = jnp.arange(t_start, -1, -1)

        def step(carry, t):
            xt, key = carry
            key, sub = jax.random.split(key)
            xt = self.ddpm_step(sub, model_fn, xt, t)
            return (xt, key), None

        (x0, _), _ = jax.lax.scan(step, (xt, key), ts)
        return x0

    def ddim_sample(
        self,
        key,
        model_fn: Callable,
        shape: Tuple[int, ...],
        n_steps: int = 50,
        eta: float = 0.0,
    ):
        """DDIM with a strided timestep ladder (one lax.scan)."""
        key, sub = jax.random.split(key)
        xt = jax.random.normal(sub, shape)
        ts = jnp.linspace(
            self.n_timesteps - 1, 0, n_steps
        ).astype(jnp.int32)

        def step(carry, i):
            xt, key = carry
            t = ts[i]
            t_next = jnp.where(i + 1 < n_steps, ts[jnp.minimum(i + 1, n_steps - 1)], 0)
            eps = model_fn(xt, jnp.full((xt.shape[0],), t, jnp.int32))
            ab_t = self.alphas_bar[t]
            ab_n = jnp.where(
                i + 1 < n_steps, self.alphas_bar[t_next], 1.0
            )
            x0 = (xt - jnp.sqrt(1 - ab_t) * eps) / jnp.sqrt(ab_t)
            key, sub = jax.random.split(key)
            sigma = eta * jnp.sqrt(
                (1 - ab_n) / (1 - ab_t) * (1 - ab_t / ab_n)
            )
            dir_xt = jnp.sqrt(jnp.maximum(1 - ab_n - sigma**2, 0.0)) * eps
            noise = jax.random.normal(sub, xt.shape)
            xt = jnp.sqrt(ab_n) * x0 + dir_xt + sigma * noise
            return (xt, key), None

        (x0, _), _ = jax.lax.scan(step, (xt, key), jnp.arange(n_steps))
        return x0
