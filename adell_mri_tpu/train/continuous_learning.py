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


def multi_phase_fit(
    make_state: Callable,
    make_loop: Callable,
    train_loader,
    val_loader=None,
    learning_rates=(1e-3, 1e-4),
    n_epochs=(10, "adaptive"),
    monitor: str = "val_loss",
    patience: int = 10,
    params=None,
):
    """
    Multi-phase training (parity: MultiPhaseTraining,
    continuous_learning/callbacks.py:9): each phase runs with its own
    learning rate; integer ``n_epochs`` phases run that many epochs,
    ``"adaptive"`` phases run until ``monitor`` stops improving for
    ``patience`` epochs, and a learning rate of ``"stop"`` ends training.
    Parameters carry across phases; optimizer state restarts with each
    phase's fresh learning rate (the functional analogue of the callback's
    in-place param-group LR rewrite).

    Args:
        make_state: ``(params, learning_rate, n_epochs) -> TrainState``.
        make_loop: ``(max_epochs, early_stopping) -> TrainLoop``.
        params: initial parameter tree (phase 0).

    Returns (final_state, list of per-phase histories).
    """
    histories = []
    state = None
    for lr, ne in zip(learning_rates, n_epochs):
        if lr == "stop":
            break
        adaptive = ne == "adaptive"
        max_epochs = int(1e6) if adaptive else int(ne)
        loop = make_loop(
            max_epochs=max_epochs,
            early_stopping=patience if adaptive else None,
        )
        loop.monitor = monitor
        state = make_state(
            params if state is None else state.params, lr, max_epochs
        )
        state, history = loop.fit(state, train_loader, val_loader)
        histories.append(history)
    return state, histories
