"""
SNGP-style Gaussian-process output layer.

Parity target: adell_mri/modules/layers/gaussian_process.py:13
(GaussianProcessLayer — random-Fourier-feature GP head whose covariance is
fitted after training, classification/pl.py:381-392). Functional version:
``apply`` produces logits from fixed random features; ``fit_covariance``
computes the Laplace covariance over a dataset of features and
``predictive_logits`` applies the mean-field correction.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class GaussianProcessLayer(nn.Module):
    out_features: int
    n_random_features: int = 256
    length_scale: float = 2.0

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        # fixed (non-trainable) random Fourier features: deterministic
        # constants from a fixed seed, so no variable collection rides in
        # the checkpoint and any apply() reproduces them exactly
        w = (
            jax.random.normal(
                jax.random.PRNGKey(0), (in_f, self.n_random_features)
            )
            / self.length_scale
        )
        b = jax.random.uniform(
            jax.random.PRNGKey(1), (self.n_random_features,),
            maxval=2 * jnp.pi,
        )
        phi = jnp.sqrt(2.0 / self.n_random_features) * jnp.cos(x @ w + b)
        logits = nn.Dense(self.out_features, use_bias=False, name="beta")(phi)
        # expose features for covariance fitting
        # (apply with mutable=["intermediates"] to read them back)
        self.sow("intermediates", "phi", phi)
        return logits


def fit_covariance(phis: jnp.ndarray, ridge: float = 1.0) -> jnp.ndarray:
    """Laplace covariance (Phi^T Phi + ridge I)^-1 over all features."""
    d = phis.shape[-1]
    precision = phis.T @ phis + ridge * jnp.eye(d)
    return jnp.linalg.inv(precision)


def predictive_logits(
    logits: jnp.ndarray,
    phi: jnp.ndarray,
    covariance: jnp.ndarray,
    mean_field_factor: float = jnp.pi / 8,
):
    """Mean-field corrected logits: logits / sqrt(1 + λ σ²)."""
    var = jnp.sum((phi @ covariance) * phi, axis=-1, keepdims=True)
    return logits / jnp.sqrt(1.0 + mean_field_factor * var)
