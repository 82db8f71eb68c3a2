"""
Learning-rate schedules as pure step->lr functions (optax-compatible).

Parity targets: adell_mri/modules/learning_rate.py —
CosineAnnealingWithWarmupLR (:106) and PolynomialLRDecay (:52). Torch
schedulers mutate optimizer state per epoch; here schedules are closed-form
functions of the step, evaluated inside the jit-compiled update (no host
round-trip per step).
"""

import jax.numpy as jnp


def _resolve_fraction(value, t_max):
    """Values in (0, 1] are fractions of t_max (reference float_to_epochs)."""
    if value is None:
        return 0
    if isinstance(value, float) and 0 < value <= 1:
        return value * t_max
    return value


def cosine_annealing_with_warmup(
    base_lr: float,
    t_max: int,
    n_warmup_steps=0,
    eta_min: float = 0.0,
    start_decay=None,
):
    """
    Linear warmup from eta_min to base_lr over n_warmup_steps, hold until
    start_decay, cosine decay to eta_min at t_max
    (parity: learning_rate.py:106).
    """
    if start_decay is None:
        start_decay = n_warmup_steps
    n_warmup_steps = _resolve_fraction(n_warmup_steps, t_max)
    start_decay = _resolve_fraction(start_decay, t_max)

    # decay starts at max(warmup, start_decay) — the reference's closed
    # form (learning_rate.py:179: r = max(nws, ssd), cos over T_max - r)
    decay_from = max(n_warmup_steps, start_decay)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = eta_min + (base_lr - eta_min) * (step + 1) / jnp.maximum(
            1.0, n_warmup_steps
        )
        decay_span = jnp.maximum(1.0, t_max - decay_from)
        progress = jnp.clip((step - decay_from) / decay_span, 0.0, 1.0)
        cos = eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * progress)
        )
        lr = jnp.where(step < n_warmup_steps, jnp.minimum(warm, base_lr), cos)
        return lr

    return schedule


def polynomial_lr_decay(
    base_lr: float,
    max_decay_steps: int,
    end_learning_rate: float = 1e-4,
    power: float = 1.0,
):
    """(base-end) * (1 - step/max)^power + end (parity: learning_rate.py:52)."""
    if max_decay_steps <= 1:
        raise ValueError("max_decay_steps should be greater than 1.")

    def schedule(step):
        step = jnp.minimum(
            jnp.asarray(step, jnp.float32), float(max_decay_steps)
        )
        frac = 1.0 - step / max_decay_steps
        return (base_lr - end_learning_rate) * frac**power + end_learning_rate

    return schedule


def constant_lr(base_lr: float):
    def schedule(step):
        return jnp.full((), base_lr, jnp.float32)

    return schedule


def onecycle_lr(base_lr: float, t_max: int, pct_start: float = 0.3, div_factor: float = 25.0, final_div_factor: float = 1e4):
    """OneCycle (used by the reference GAN trainer, gan/pl/gan.py:1256)."""
    up = max(1.0, pct_start * t_max)
    init_lr = base_lr / div_factor
    final_lr = init_lr / final_div_factor

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        rise = init_lr + (base_lr - init_lr) * jnp.clip(step / up, 0, 1)
        fall_progress = jnp.clip((step - up) / jnp.maximum(1.0, t_max - up), 0, 1)
        fall = final_lr + (base_lr - final_lr) * 0.5 * (
            1 + jnp.cos(jnp.pi * fall_progress)
        )
        return jnp.where(step < up, rise, fall)

    return schedule


def multi_phase_schedule(
    learning_rates, phase_epochs, steps_per_epoch: int = 1
):
    """
    Piecewise-constant schedule over explicit phases (the static case of
    MultiPhaseTraining, continuous_learning/callbacks.py:9): phase i runs
    ``phase_epochs[i]`` epochs at ``learning_rates[i]``.
    """
    import optax

    boundaries = {}
    step = 0
    for lr_prev, epochs, lr_next in zip(
        learning_rates[:-1], phase_epochs[:-1], learning_rates[1:]
    ):
        step += int(epochs) * steps_per_epoch
        boundaries[step] = lr_next / lr_prev if lr_prev else 0.0
    return optax.piecewise_constant_schedule(
        float(learning_rates[0]), boundaries
    )
