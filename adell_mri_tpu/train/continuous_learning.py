"""
Continuous learning: elastic weight consolidation.

Parity target: adell_mri/modules/continuous_learning/ — EWC
(regularization.py:7) and the MultiPhaseTraining callback (callbacks.py:9).
Functional: Fisher information estimated from a loader of batches; the EWC
penalty is added to any loss closure.
"""

from typing import Callable

import jax
import jax.numpy as jnp


def estimate_fisher(loss_fn: Callable, params, batches, rng) -> dict:
    """Diagonal Fisher: mean squared gradient over batches."""
    fisher = jax.tree.map(jnp.zeros_like, params)
    n = 0
    for batch in batches:
        rng, key = jax.random.split(rng)
        grads = jax.grad(lambda p: loss_fn(p, batch, key)[0])(params)
        fisher = jax.tree.map(lambda f, g: f + g**2, fisher, grads)
        n += 1
    return jax.tree.map(lambda f: f / max(n, 1), fisher)


def ewc_penalty(params, anchor_params, fisher, weight: float = 1.0):
    """weight * sum_i F_i (θ_i - θ*_i)²."""
    sq = jax.tree.map(
        lambda p, a, f: jnp.sum(f * (p - a) ** 2),
        params,
        anchor_params,
        fisher,
    )
    return weight * sum(jax.tree.leaves(sq))


def wrap_loss_with_ewc(
    loss_fn: Callable, anchor_params, fisher, weight: float = 1.0
) -> Callable:
    def wrapped(params, batch, rng):
        loss, metrics = loss_fn(params, batch, rng)
        pen = ewc_penalty(params, anchor_params, fisher, weight)
        return loss + pen, {**metrics, "ewc_penalty": pen}

    return wrapped
